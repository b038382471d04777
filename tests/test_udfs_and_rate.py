"""UDF extensibility surface (Pandas UDFs vs native Columns) and the
rate-source streaming workload generator."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_watched_ratio_pudf_matches_native(spark, sf_dir):
    from etl_pipeline_challenge_aladia_spark.functions.udfs import watched_ratio_pudf
    from etl_pipeline_challenge_aladia_spark.sources.cdc import (
        cdc_envelopes_from_events,
    )
    from etl_pipeline_challenge_aladia_spark.pipeline import envelopes_to_warehouse

    env = cdc_envelopes_from_events(spark, sf_dir)
    wh = envelopes_to_warehouse(env, with_ingestion_time=False)
    both = wh.select(
        "watched_ratio",
        watched_ratio_pudf("watched_seconds", "video_duration_seconds").alias("pudf"),
    )
    assert both.filter(F.col("watched_ratio") != F.col("pudf")).count() == 0
    assert both.count() > 0


def test_token_count_pudf_matches_native(spark, sf_dir):
    from etl_pipeline_challenge_aladia_spark.functions.udfs import token_count_pudf
    from etl_pipeline_challenge_aladia_spark.operators.text import token_count_col
    from etl_pipeline_challenge_aladia_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        token_count_col("text").alias("native"), token_count_pudf("text").alias("pudf")
    )
    assert both.filter(F.col("native") != F.col("pudf")).count() == 0


def test_grouped_mean_pudf_matches_native_avg(spark, sf_dir):
    from etl_pipeline_challenge_aladia_spark.functions.udfs import grouped_mean_ratio_pudf
    from etl_pipeline_challenge_aladia_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events")
    got = (
        ev.groupBy("event_type")
        .agg(F.round(grouped_mean_ratio_pudf("value"), 6).alias("m"))
        .collect()
    )
    want = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("m"))
        .collect()
    }
    assert {r["event_type"]: r["m"] for r in got} == want


def test_rate_source_envelope_schema_and_mix(spark, tmp_path):
    from etl_pipeline_challenge_aladia_spark.sources.cdc import (
        streaming_envelopes_rate,
    )

    env = streaming_envelopes_rate(spark, rows_per_second=500)
    assert env.isStreaming
    rows: list = []
    q = (
        env.writeStream.foreachBatch(lambda b, _id: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 20
    while time.time() < deadline and len(rows) < 50:
        time.sleep(0.5)
    q.stop()
    assert len(rows) >= 50
    ops = {r["operation"] for r in rows}
    assert ops <= {"insert", "update", "delete"}
    for r in rows:
        if r["operation"] == "delete":
            assert r["data"] is None
        else:
            assert r["data"]["video_id"].startswith("video_")
