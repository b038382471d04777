"""Benchmark harness (driver contract).

Runs the ENTIRE query catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full execution, no
driver-side collect). Per-query times for the full catalog make regressions
attributable round over round. Each query runs $SPARK_GRAFT_BENCH_RUNS
times (default 2) and reports the per-query minimum — machine-load noise
otherwise swings single-pass totals by ~1.5x, drowning real plan changes.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    from etl_pipeline_challenge_aladia_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)

    # warm the JVM/codegen and Python-worker/Arrow paths once so per-query
    # numbers measure the plan, not first-run classloading / worker spawn
    CATALOG["tpch_q6_revenue_forecast"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    import pandas as pd  # noqa: F401

    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # JSON/variant parse codepaths JIT separately from the scan/agg paths
    # warmed above — without this, whichever json-heavy query runs first
    # absorbs the compilation cost (r3: emb_quantize_error 15x, r4:
    # events_json_props 15x; both re-measured sub-second warm)
    from pyspark.sql import functions as _F

    spark.range(1000).select(
        _F.get_json_object(
            _F.concat(_F.lit('{"k":'), _F.col("id").cast("string"), _F.lit("}")),
            "$.k",
        ),
        _F.parse_json(
            _F.concat(_F.lit('{"k":'), _F.col("id").cast("string"), _F.lit("}"))
        ),
        _F.from_json(
            _F.concat(_F.lit('{"k":'), _F.col("id").cast("string"), _F.lit("}")),
            "k long",
        ),
    ).write.format("noop").mode("overwrite").save()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in CATALOG.items():
        best = float("inf")
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {
            "metric": "catalog_queries_total_runtime",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        }
    )
    print(line)
    # sidecar copy of the SAME line: the driver's BENCH_r{N} artifact
    # truncates long tails, which made r2-vs-r3 comparable on only ~half
    # the catalog — a committed full-fidelity file keeps round-over-round
    # attribution complete ($SPARK_GRAFT_BENCH_SIDECAR overrides/disables).
    # Single runs land in BENCH_local_run.json; the COMMITTED minima
    # artifact BENCH_local_latest.json is curated separately (min across
    # >= 2 full runs) so a fresh noisy run never clobbers it.
    sidecar = os.environ.get("SPARK_GRAFT_BENCH_SIDECAR", "BENCH_local_run.json")
    if sidecar:
        try:
            with open(sidecar, "w") as fh:
                fh.write(line + "\n")
        except OSError:
            pass  # read-only CWD must never fail the bench contract
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
