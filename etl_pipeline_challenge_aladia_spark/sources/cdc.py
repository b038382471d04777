"""Deterministic CDC-envelope source derived from the ``events`` testdata.

The reference's workload generator (reference producer/db/data_simulation.py:80-94)
emits a weighted random insert/update/delete stream of video-watch documents.
The driver testdata has no CDC table, so this module derives an equivalent —
and fully deterministic — envelope stream from ``events.parquet`` using pure
integer arithmetic on (event_id, user_id). Because the derivation is exact
integer math, the DuckDB oracle can rebuild the identical stream
(``CDC_ORACLE_CTE``), which makes the entire CDC pipeline hash-checkable.

Faithfulness to the reference's distributions:
- operation mix 50/30/20 insert/update/delete (data_simulation.py:82)
  -> event_id % 10 buckets 0-4 / 5-7 / 8-9.
- delete envelopes carry data = NULL (producer.py:61).
- watched_seconds in [0, 3600) (data_simulation.py:32); NULL 1-in-97 to
  exercise the missing-field default (calculate_watched_ratio.py:9).
- video_duration_seconds odd in [61, 3599] (odd => no exact rounding ties,
  SURVEY.md §7.5.3); NULL 1-in-89 (-> divisor default 1); zero 1-in-83
  (-> ratio 0, calculate_watched_ratio.py:12).
- the dedup key (doc/video/session) is a function of user_id, so keys repeat
  across events and last-write-wins dedup has real work to do.
- ``version`` = event_id: the explicit monotonic stand-in for the reference's
  wall-clock ingestion_time ordering (SURVEY.md §7.5.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.schemas import DEVICE_TYPES, QUALITIES
from etl_pipeline_challenge_aladia_spark.sources.files import fan_out, load_table


def _pick(values: list[str], idx: Column) -> Column:
    """values[idx] for a 0-based int column (element_at is 1-based)."""
    return F.element_at(F.array(*[F.lit(v) for v in values]), (idx + 1).cast("int"))


def cdc_envelopes_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> DataFrame[ENVELOPE_SCHEMA-shaped rows].

    The scalar fields are computed BEFORE the ``fan_out`` exchange and the
    envelope struct is assembled after it. Columns crossing an exchange are
    materialized, so every downstream ``data.x`` extraction resolves to a
    shuffled attribute instead of Catalyst re-inlining (and re-evaluating)
    the whole synthesis expression per field — without the barrier the
    flatten step rebuilt the concat/date_format chain ~10x per row.
    """
    ev = load_table(spark, sf_dir, "events")
    e = F.col("event_id")
    u = F.col("user_id")

    op = (
        F.when(e % 10 < 5, F.lit("insert"))
        .when(e % 10 < 8, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    watched = F.when(e % 97 == 0, F.lit(None).cast("long")).otherwise((e * 7919) % 3600)
    duration = (
        F.when(e % 89 == 3, F.lit(None).cast("long"))
        .when(e % 83 == 7, F.lit(0).cast("long"))
        .otherwise(F.lit(61) + F.lit(2) * ((e * 104729) % 1770))
    )
    flat = fan_out(
        ev.select(
            op.alias("operation"),
            F.concat(F.lit("doc_"), u.cast("string")).alias("document_id"),
            F.col("ts").cast("string").alias("timestamp"),  # clusterTime analog (dead)
            F.concat(F.lit("video_"), (F.lit(10000) + (u * 37) % 90000).cast("string")).alias(
                "d_video_id"
            ),
            F.concat(
                F.lit("session_"), (F.lit(100000) + (u * 101) % 900000).cast("string")
            ).alias("d_session_id"),
            watched.cast("long").alias("d_watched_seconds"),
            duration.cast("long").alias("d_video_duration_seconds"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("d_timestamp"),
            _pick(DEVICE_TYPES, u % 4).alias("d_device_type"),
            _pick(QUALITIES, e % 5).alias("d_quality"),
            e.cast("long").alias("version"),
        )
    )
    data = F.struct(
        F.col("d_video_id").alias("video_id"),
        F.col("d_session_id").alias("session_id"),
        F.col("d_watched_seconds").alias("watched_seconds"),
        F.col("d_video_duration_seconds").alias("video_duration_seconds"),
        F.col("d_timestamp").alias("timestamp"),
        F.col("d_device_type").alias("device_type"),
        F.col("d_quality").alias("quality"),
    )
    return flat.select(
        "operation",
        "document_id",
        "timestamp",
        F.when(F.col("operation") != "delete", data).alias("data"),
        "version",
    )


#: DuckDB CTE rebuilding the identical (flattened) envelope stream. Delete
#: envelopes appear with data fields NULLed, mirroring data = NULL.
CDC_ORACLE_CTE = """
cdc AS (
  SELECT
    CASE WHEN event_id % 10 < 5 THEN 'insert'
         WHEN event_id % 10 < 8 THEN 'update'
         ELSE 'delete' END AS operation,
    'doc_' || CAST(user_id AS VARCHAR) AS document_id,
    CAST(event_id AS BIGINT) AS version,
    (event_id % 10 >= 8) AS is_delete,
    'video_' || CAST(10000 + (user_id * 37) % 90000 AS VARCHAR) AS video_id,
    'session_' || CAST(100000 + (user_id * 101) % 900000 AS VARCHAR) AS session_id,
    CAST(CASE WHEN event_id % 97 = 0 THEN NULL
              ELSE (event_id * 7919) % 3600 END AS BIGINT) AS watched_seconds,
    CAST(CASE WHEN event_id % 89 = 3 THEN NULL
              WHEN event_id % 83 = 7 THEN 0
              ELSE 61 + 2 * ((event_id * 104729) % 1770) END AS BIGINT)
        AS video_duration_seconds,
    strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS data_timestamp,
    ['mobile','desktop','tablet','smart_tv'][CAST(user_id % 4 AS INT) + 1] AS device_type,
    ['360p','480p','720p','1080p','4k'][CAST(event_id % 5 AS INT) + 1] AS quality
  FROM events
)
"""


def streaming_envelopes_rate(
    spark: SparkSession, rows_per_second: int = 2
) -> DataFrame:
    """Continuous synthetic CDC envelope stream (reference S6's runtime twin).

    The reference's workload generator loops forever issuing weighted random
    ops at ~1.8 ops/s (data_simulation.py:80-94). Spark-first, that is a
    ``rate`` source plus the SAME deterministic column derivations used for
    the batch fixture (op mix 50/30/20, data=NULL deletes, repeating dedup
    keys), keyed off the rate source's monotonically increasing ``value``.
    Default rows_per_second≈2 matches the reference's expected rate; turn it
    up for load tests — the derivation is pure column math and scales with
    executors.
    """
    ev = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    e = F.col("value")
    u = (e * 31) % 1000  # synthetic user id with repeating keys
    op = (
        F.when(e % 10 < 5, F.lit("insert"))
        .when(e % 10 < 8, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    watched = F.when(e % 97 == 0, F.lit(None).cast("long")).otherwise((e * 7919) % 3600)
    duration = (
        F.when(e % 89 == 3, F.lit(None).cast("long"))
        .when(e % 83 == 7, F.lit(0).cast("long"))
        .otherwise(F.lit(61) + F.lit(2) * ((e * 104729) % 1770))
    )
    data = F.struct(
        F.concat(F.lit("video_"), (F.lit(10000) + (u * 37) % 90000).cast("string")).alias(
            "video_id"
        ),
        F.concat(
            F.lit("session_"), (F.lit(100000) + (u * 101) % 900000).cast("string")
        ).alias("session_id"),
        watched.cast("long").alias("watched_seconds"),
        duration.cast("long").alias("video_duration_seconds"),
        F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        _pick(DEVICE_TYPES, u % 4).alias("device_type"),
        _pick(QUALITIES, e % 5).alias("quality"),
    )
    return ev.select(
        op.alias("operation"),
        F.concat(F.lit("doc_"), u.cast("string")).alias("document_id"),
        F.col("timestamp").cast("string").alias("timestamp"),
        F.when(op != "delete", data).alias("data"),
        e.cast("long").alias("version"),
    )
