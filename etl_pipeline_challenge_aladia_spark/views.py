"""Incremental materialized-view maintenance over the snapshot warehouse.

The reference's flagship analytic — average watched ratio per video
(README.md:221-223 of the reference; catalog twin
``cdc_avg_watched_ratio_per_video``) — re-scans the whole table per ask.
A materialized view plus the change data feed turns that into
dirty-group maintenance: each refresh reads ``table_changes`` since the
view's recorded source version, recomputes ONLY the groups those changes
touch from the current snapshot, and splices them into the stored view.
I/O per refresh is (changed rows) + (dirty groups' rows) + (view-sized
rewrite), never a full fact-table scan — the IVM-lite shape Delta users
build by hand on CDF, and structurally what Materialize/Feldera do with
full dataflow machinery.

Correctness does not depend on the feed being fine-grained: a dirty
group is recomputed FROM THE CURRENT SNAPSHOT, so the result is always
exactly the full rebuild (proven by test). If the view's source version
has been vacuumed out of history, refresh falls back to a full rebuild
instead of failing.

The view directory is promoted atomically (same crash-recoverable swap
the sinks use) with its source version in a sidecar manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up
from etl_pipeline_challenge_aladia_spark.sinks import (
    _promote_dir,
    _read_manifest,
    _recover_dir,
    read_warehouse,
    table_changes,
)

_VIEW_META = "_view.json"


def video_stats(rows: DataFrame) -> DataFrame:
    """The maintained aggregate: per-video session count, average watched
    ratio (shared half-up rounding), and max watched seconds over ACTIVE
    (non-tombstone) rows."""
    active = rows
    if "is_deleted" in rows.columns:
        active = rows.filter(~F.coalesce(F.col("is_deleted"), F.lit(False)))
    return active.groupBy("video_id").agg(
        round_half_up(F.avg("watched_ratio"), 4).alias("avg_watched_ratio"),
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("watched_seconds").alias("max_watched_seconds"),
    )


def _write_view(df: DataFrame, view_path: str, source_version: int) -> None:
    staged = view_path + "._tmp"
    df.write.mode("overwrite").parquet(staged)
    os.makedirs(os.path.dirname(view_path) or ".", exist_ok=True)
    _recover_dir(view_path, view_path + "._old")
    _promote_dir(staged, view_path, view_path + "._old")
    meta = {"source_version": int(source_version)}
    tmp = view_path + "._meta_tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(view_path, _VIEW_META))


def _view_meta(view_path: str) -> dict | None:
    f = os.path.join(view_path, _VIEW_META)
    if not os.path.exists(f):
        return None
    with open(f) as fh:
        return json.load(fh)


def read_view(spark: SparkSession, view_path: str) -> DataFrame:
    return spark.read.parquet(view_path)


def build_video_stats_view(
    spark: SparkSession, table_path: str, view_path: str
) -> None:
    """Full build: aggregate the table's CURRENT snapshot and stamp its
    version so later refreshes know their change-feed start point."""
    manifest = _read_manifest(table_path)
    version = int(manifest["version"]) if manifest else 0
    _write_view(video_stats(read_warehouse(spark, table_path)), view_path, version)


def refresh_video_stats_view(
    spark: SparkSession, table_path: str, view_path: str
) -> int:
    """Incremental refresh: recompute only the groups touched since the
    view's source version. Returns the number of dirty groups recomputed
    (-1 for a full rebuild fallback, 0 for an up-to-date no-op)."""
    meta = _view_meta(view_path)
    manifest = _read_manifest(table_path)
    current_version = int(manifest["version"]) if manifest else 0
    if meta is None:
        build_video_stats_view(spark, table_path, view_path)
        return -1
    if int(meta["source_version"]) == current_version:
        return 0
    try:
        changes = table_changes(
            spark, table_path, from_version=int(meta["source_version"])
        )
        # materialized once (checkpoint), consumed by both joins below;
        # the driver only ever sees its COUNT, never the ids — dirty-group
        # cardinality can be arbitrarily large
        dirty = (
            changes.select("video_id").distinct().localCheckpoint(eager=True)
        )
        n_dirty = dirty.count()
    except (KeyError, AnalysisException):
        # source version vacuumed out of retained history, or the diff
        # failed to analyze (e.g. incompatible schema drift between the
        # snapshots): full rebuild instead of crashing the maintenance loop
        build_video_stats_view(spark, table_path, view_path)
        return -1
    if n_dirty == 0:
        _write_view(read_view(spark, view_path), view_path, current_version)
        return 0
    current = read_warehouse(spark, table_path)
    fresh = video_stats(current.join(dirty, "video_id", "left_semi"))
    kept = read_view(spark, view_path).join(dirty, "video_id", "left_anti")
    _write_view(kept.unionByName(fresh), view_path, current_version)
    return n_dirty
