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


def test_chunk_udtf_matches_chunk_plan_counts(spark):
    """U2 row-generating UDTF: chunk_text yields the same chunk boundaries
    as the native chunk_plan column math, and works from SQL via LATERAL."""
    from pyspark.sql import functions as F

    from etl_pipeline_challenge_aladia_spark.functions.udfs import (
        register_sql_table_functions,
    )
    from etl_pipeline_challenge_aladia_spark.operators.text import chunk_plan

    register_sql_table_functions(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_text('a b c d e f g h i j', 4, 1)"
    ).collect()
    # stride 3 over 10 tokens; stops once the tail is fully covered
    assert [(r["chunk_idx"], r["start_tok"], r["n_tokens"]) for r in rows] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4),
    ]
    assert rows[1]["chunk"] == "d e f g"
    # full coverage: every token index falls inside some chunk
    covered = set()
    for r in rows:
        covered |= set(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(10))

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y z"), (3, "")],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("udtf_docs")
    lateral = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_tokens "
        "FROM udtf_docs d, LATERAL chunk_text(d.text, 4, 1) c"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): r["n_tokens"] for r in lateral.collect()
    }
    assert got[(1, 2)] == 4 and got[(2, 0)] == 3
    assert got[(3, 0)] == 0  # empty docs still yield one row, like chunk_plan
    # non-overlapping parity with the declarative planner (chunk_plan has
    # no overlap knob; at overlap=0 both produce identical spans)
    plan = chunk_plan(docs, chunk_tokens=4)
    starts_native = sorted(
        r["start_token"] for r in plan.filter(F.col("doc_id") == 1).collect()
    )
    udtf_rows = spark.sql(
        "SELECT c.start_tok FROM udtf_docs d, LATERAL chunk_text(d.text, 4, 0) c "
        "WHERE d.doc_id = 1"
    ).collect()
    assert starts_native == sorted(r["start_tok"] for r in udtf_rows)
