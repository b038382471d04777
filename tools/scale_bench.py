"""Scale-ladder bench: time selected catalog queries at two scale factors
and report per-query scaling vs the data-size ratio (VERDICT r02 #2).

    python tools/scale_bench.py --queries a,b,c \
        --lo /root/testdata/sf0.1 --hi .scaledata/sf1.0 --ratio 10 \
        --out BENCH_scaling.json

A query is sub/linear when time(hi)/time(lo) <= ratio (with a noise
allowance); anything super-linear is flagged. Each (query, sf) runs twice
and keeps the min, like bench.py, to cut machine-load noise.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--lo", default="/root/testdata/sf0.1")
    ap.add_argument("--hi", default=".scaledata/sf1.0")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--slack", type=float, default=1.5,
                    help="noise allowance multiplier on the linear bound")
    ap.add_argument("--out", default="BENCH_scaling.json")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    from etl_pipeline_challenge_aladia_spark.session import get_spark

    spark = get_spark(app_name="scale-bench")
    # warm codegen + Python-worker paths (same warmup as bench.py)
    CATALOG["tpch_q6_revenue_forecast"].spark(spark, args.lo).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            CATALOG[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for name in names:
        lo_s = run(name, args.lo)
        hi_s = run(name, args.hi)
        scaling = hi_s / lo_s if lo_s > 0 else float("inf")
        results[name] = {
            "lo_sec": round(lo_s, 3),
            "hi_sec": round(hi_s, 3),
            "scaling_x": round(scaling, 2),
            "linear_bound_x": args.ratio * args.slack,
            "verdict": "OK" if scaling <= args.ratio * args.slack else "SUPER-LINEAR",
        }
        print(f"{name}: {lo_s:.2f}s -> {hi_s:.2f}s ({scaling:.1f}x, "
              f"{results[name]['verdict']})", flush=True)

    out = {
        "lo": args.lo, "hi": args.hi, "data_ratio": args.ratio,
        "slack": args.slack, "runs": args.runs, "queries": results,
        "super_linear": [n for n, r in results.items()
                         if r["verdict"] != "OK"],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
