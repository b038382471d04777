"""Batch end-to-end CDC pipeline (SURVEY.md §3.3's lifecycle as ONE plan).

The reference runs: RabbitMQ consume -> per-message Beam pipeline of three
DoFns -> ClickHouse insert. Here the identical semantics are one declarative
DataFrame chain, so Catalyst sees the whole thing and the per-message
interpreter overhead (reference consumer/consumer.py:31-38, flagged in its
own README) disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.dedup import latest_per_key
from etl_pipeline_challenge_aladia_spark.operators.enrich import watched_ratio_col
from etl_pipeline_challenge_aladia_spark.operators.structure import (
    modify_structure,
    route_ops,
    to_tombstone_row,
    to_warehouse_row,
)


def envelopes_to_warehouse(
    envelopes: DataFrame,
    with_ingestion_time: bool = True,
    soft_delete: bool = False,
) -> DataFrame:
    """envelope rows -> warehouse rows (append-shape, pre-dedup).

    F1 enrich -> T2 flatten -> T3 route -> S5/T4/T5/T6 shape. With
    ``soft_delete=True`` the delete events the reference drops
    (load_data.py:24-25) instead become is_deleted=True tombstone rows —
    the M5 path its stub describes (load_data.py:68-101); read through
    ``operators.dedup.active_after_soft_delete``.
    """
    # Fused F1+T2: flatten FIRST, then compute the ratio on the flat
    # columns. Semantically identical to with_watched_ratio -> flatten
    # (the ratio depends only on watched/duration, and deletes are dropped
    # either way), but avoids rebuilding the nested struct: each of the
    # flatten's nine data.x extractions would otherwise re-evaluate the
    # whole when(...).withField(...) expression (~9x the work per row).
    flat = modify_structure(envelopes).withColumn(
        "watched_ratio",
        watched_ratio_col(
            F.col("watched_seconds"), F.col("video_duration_seconds")
        ),
    )
    routed = route_ops(flat)
    rows = to_warehouse_row(routed, with_ingestion_time=with_ingestion_time)
    if soft_delete:
        rows = rows.unionByName(
            to_tombstone_row(envelopes, with_ingestion_time=with_ingestion_time)
        )
    return rows


def warehouse_dedup_view(warehouse: DataFrame) -> DataFrame:
    """ReplacingMergeTree-equivalent read view: latest row per
    (original_id, video_id, session_id) — reference clickhouse/init.sql:22-24."""
    return latest_per_key(warehouse)
