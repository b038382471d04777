"""Benchmark harness (driver contract).

Runs the headline catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full execution, no
driver-side collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "cdc_warehouse",
    "cdc_dedup_latest",
    "cdc_avg_watched_ratio_per_video",
    "cdc_soft_delete_active",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "window_top3_parts_per_supplier",
    "events_daily_by_type",
    "events_sessionization",
    "events_asof_last_click_before_purchase",
    "doc_token_stats",
    "doc_fingerprint",
    "minhash_near_dup",
    "doc_simhash_near_dup",
    "emb_cosine_topk",
    "emb_ivf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    from etl_pipeline_challenge_aladia_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)

    # warm the JVM/codegen paths once so per-query numbers measure the plan,
    # not first-run classloading
    CATALOG["tpch_q6_revenue_forecast"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        spec = CATALOG.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
