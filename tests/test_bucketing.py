"""Bucketed co-located joins: same keys + same bucket count -> join with no
Exchange in the physical plan (the write-once/join-many layout for 100 TB
fact tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.sinks import save_bucketed
from etl_pipeline_challenge_aladia_spark.sources.files import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    save_bucketed(li, "li_b", ["l_orderkey"], buckets=8, path=str(tmp_path / "li"))
    save_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_b",
        ["l_orderkey"],
        buckets=8,
        path=str(tmp_path / "ord"),
    )
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        got = joined.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        want = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
        assert got == want > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
