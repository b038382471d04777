"""Per-query profiler: run one or more catalog queries with the Spark
AppStatusStore polled between runs, so the seconds in a bench number become
attributable to specific jobs (checkpoints, counts, the final noop write).

    python tools/profile_query.py <query> [<query> ...] [--sf DIR] [--runs N]

Per query, prints each run's total and — for the LAST (warmest) run — the
per-job wall times, task counts and call sites.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def job_infos(sc, after_id: int) -> list[tuple[int, int | None, int, str]]:
    store = sc._jsc.sc().statusStore()
    jl = store.jobsList(None)
    out = []
    for i in range(jl.size()):
        j = jl.apply(i)
        if j.jobId() < after_id:
            continue
        sub, comp = j.submissionTime(), j.completionTime()
        ms = None
        if sub.nonEmpty() and comp.nonEmpty():
            ms = comp.get().getTime() - sub.get().getTime()
        desc = j.description()
        out.append(
            (
                j.jobId(),
                ms,
                j.numTasks(),
                (desc.get() if desc.nonEmpty() else "")[:100],
            )
        )
    out.sort()
    return out


def max_job_id(sc) -> int:
    store = sc._jsc.sc().statusStore()
    jl = store.jobsList(None)
    mx = -1
    for i in range(jl.size()):
        mx = max(mx, jl.apply(i).jobId())
    return mx


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs = int(argv[i + 1])
            i += 2
        elif argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1

    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    from etl_pipeline_challenge_aladia_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(app_name="profile", cpus=cpus)
    sc = spark.sparkContext
    # same warmups as bench.py so run 1 is comparable
    CATALOG["tpch_q6_revenue_forecast"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        spec = CATALOG[name]
        times = []
        jobs = []
        for r in range(runs):
            j0 = max_job_id(sc) + 1
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            jobs = job_infos(sc, j0)
        print(
            f"\n=== {name}: runs={['%.3f' % t for t in times]} "
            f"min={min(times):.3f} jobs={len(jobs)}"
        )
        tot_ms = sum(j[1] or 0 for j in jobs)
        print(f"    sum job wall: {tot_ms/1000:.3f}s (gaps = driver/planning)")
        for jid, ms, ntasks, desc in jobs:
            print(f"  job {jid:5d}  {ms if ms is not None else -1:>7d} ms  tasks={ntasks:<5d} {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
