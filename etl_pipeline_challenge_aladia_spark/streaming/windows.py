"""Event-time windowed streaming analytics (watermarks, tumbling/session
windows, stream dedup).

The reference has NO event-time logic — per-message processing, late data
indistinguishable from on-time (SURVEY.md §2.8-X3). These operators are the
engine's extension of the warehouse analytics (§2.4-A1) to continuous
event-time: the same aggregations, incrementally maintained, with watermarks
bounding state so a 100 TB/day stream doesn't accumulate unbounded keys.

All functions take a *streaming* DataFrame and return a streaming DataFrame;
the same code paths also accept batch DataFrames (Spark's unified API),
which is how the unit tests cross-check windowed results against a batch
groupBy of identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enveloped_event_time(envelopes: DataFrame) -> DataFrame:
    """Envelope rows -> rows with a typed ``event_time`` column parsed from
    the payload's ISO-8601 string (the reference's ``data.timestamp``)."""
    return envelopes.withColumn(
        "event_time", F.to_timestamp(F.col("data.timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    )


def windowed_device_stats(
    envelopes: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window watch stats per device_type with a watermark.

    The watermark bounds state: windows older than (max event_time - delay)
    are finalized and dropped from the state store, so state size is
    O(active windows x device types), independent of stream length. Late
    rows inside the delay still merge into their window; later ones drop —
    the explicit policy the reference lacks (its last-write-wins is by
    arrival wall-clock).
    """
    with_time = enveloped_event_time(envelopes).filter(
        F.col("operation").isin("insert", "update")
    )
    return (
        with_time.withWatermark("event_time", watermark_delay)
        .groupBy(F.window("event_time", window_duration), F.col("data.device_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(
                F.col("data.watched_seconds")
                / F.nullif(F.col("data.video_duration_seconds"), F.lit(0))
            ).alias("avg_ratio"),
            F.max("data.watched_seconds").alias("max_watched"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("device_type"),
            "n_events",
            "avg_ratio",
            "max_watched",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session windows per key (built-in ``session_window``).

    The streaming twin of the batch sessionization query
    (plans/queries.py:q_sessionization): same 30-minute inactivity gap,
    maintained incrementally. Watermark finalizes a session once no event
    can extend it, bounding state to open sessions only.
    """
    return (
        events.withWatermark(time_col, watermark_delay)
        .groupBy(F.session_window(F.col(time_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col(key_col),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    envelopes: DataFrame,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact-once filter: drop redelivered (document_id, version)
    pairs within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+), not plain
    ``dropDuplicates``: with the event-time column absent from the dedup
    key, plain dropDuplicates keeps every key's state FOREVER — an
    unbounded state store at 100 TB. The WithinWatermark variant expires
    each key once the watermark passes its event time, bounding state to
    the delay window. This is the stream-side half of the at-least-once
    contract (SURVEY.md §2.8-X1); the keyed upsert sink remains the
    backstop for duplicates farther apart than the watermark."""
    return (
        enveloped_event_time(envelopes)
        .withWatermark("event_time", watermark_delay)
        .dropDuplicatesWithinWatermark(["document_id", "version"])
    )


def stream_stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "10 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: purchases matched to same-user clicks at
    most ``max_gap`` before them.

    Both sides carry watermarks and the join condition bounds event time on
    BOTH sides, so Spark can expire buffered rows — state is
    O(rows inside the gap window), not stream length. The streaming twin of
    the batch events_clicks_near_purchase catalog query.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark_delay)
    p = purchases.select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    ).withWatermark("purchase_ts", watermark_delay)
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")),
    ).select("user_id", "purchase_id", "click_id", "purchase_ts", "click_ts")
