"""Warehouse sinks.

The reference's sink is a per-row ClickHouse insert with engine-side merge
dedup (SURVEY.md §2.1-S5, §1.4). Spark-first equivalents:

- ``append_warehouse``: partitioned Parquet append. Partitioning by the
  date of ``original_timestamp`` gives partition pruning for time-ranged
  analytics (the layout the reference README wished for but didn't build).
- ``upsert_warehouse_batch``: dedup-on-write for ``foreachBatch`` — merges
  a micro-batch into the stored table keeping the latest version per key.
  Paired with Structured Streaming checkpointing this gives effectively
  exactly-once (at-least-once redelivery collapses on the dedup key), the
  engine's answer to the reference's ack/requeue + ReplacingMergeTree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.dedup import latest_per_key


def append_warehouse(df: DataFrame, path: str, partition_by_day: bool = True) -> None:
    out = df.withColumn("_day", F.to_date("original_timestamp"))
    writer = out.write.mode("append")
    if partition_by_day:
        writer = writer.partitionBy("_day")
    writer.parquet(path)


def read_warehouse(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("_day")


def upsert_warehouse_batch(spark: SparkSession, batch: DataFrame, path: str) -> None:
    """Idempotent micro-batch upsert: union stored + batch, keep latest per
    key, rewrite. Local-friendly full rewrite; on a real deployment this is
    a Delta/Iceberg MERGE INTO keyed on the dedup key — same semantics,
    partition-local IO."""
    try:
        current = spark.read.parquet(path).drop("_day")
        merged = current.unionByName(batch, allowMissingColumns=True)
    except Exception:
        merged = batch
    deduped = latest_per_key(merged)
    out = deduped.withColumn("_day", F.to_date("original_timestamp"))
    out.write.mode("overwrite").partitionBy("_day").parquet(path + "._tmp")
    # atomic-ish swap via a staging dir; Delta/Iceberg makes this a real txn
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    shutil.move(path + "._tmp", path)


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted managed table for co-located joins.

    Two tables bucketed on the same keys with the same bucket count join
    WITHOUT an exchange: each task zips matching buckets (sort-merge over
    pre-sorted buckets, no shuffle, no sort). At 100 TB this is the
    difference between re-shuffling the fact table on every join and
    paying the layout cost once at write time. Bucket pruning also applies
    to point lookups on the bucket key.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def compact_warehouse(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Rewrite each day partition into ~target-sized files (the small-files
    compaction every streaming-append warehouse needs operationally).

    Micro-batch appends leave one small file per batch per partition; scans
    then pay per-file open cost and lose row-group pruning. Compaction
    rewrites day-by-day — each rewrite is partition-local, so at 100 TB it
    runs incrementally on recent days, not the whole table. Returns the
    number of partitions rewritten. On Delta/Iceberg this is OPTIMIZE /
    rewrite_data_files; plain parquet needs the staging-dir swap used here.
    """
    import shutil

    current = spark.read.parquet(path)
    days = [str(r["_day"]) for r in current.select("_day").distinct().collect()]
    for day in days:
        part = spark.read.parquet(path).filter(F.col("_day") == day).drop("_day")
        n = part.count()
        files = max(1, -(-n // target_rows_per_file))
        staged = f"{path}/_compact_tmp_{day}"
        part.repartition(files).write.mode("overwrite").parquet(staged)
        shutil.rmtree(f"{path}/_day={day}")
        shutil.move(staged, f"{path}/_day={day}")
    return len(days)
