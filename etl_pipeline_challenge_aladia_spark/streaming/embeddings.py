"""Streaming embedding ingest onto a FROZEN coarse quantizer.

The online half of the IVF/SemDeDup serving story: an index is trained
once (``kmeans_with_centroids``), then a continuous stream of new
vectors is ROUTED — not re-trained — one broadcast argmin per
micro-batch (``assign_to_centroids``), appended into a cell-partitioned
layout (scans for "probe cells c3, c7" prune to those directories), and
monitored: per-batch per-cell occupancy + quantization error land in a
stats log whose divergence from the training baseline
(``operators/similarity.py:cell_drift`` semantics) is the re-train
trigger. This is how production ANN deployments amortize training at
100 TB: assignment is map-only against a k x dim broadcast table, so
ingest cost per batch is linear in the batch, independent of the index
or corpus size.

Composition, not new machinery: ``foreachBatch`` runs the exact batch
operator; idempotence comes from batch-keyed overwrite (a checkpoint-
replayed batch rewrites its own output), the same contract as
``streaming/docs.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.similarity import (
    assign_to_centroids,
)

EMB_STREAM_SCHEMA = "vec_id long, embedding array<double>"


def make_embedding_ingest_processor(
    centroids: DataFrame,
    index_path: str,
    stats_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The ``foreachBatch`` body: route the batch onto the frozen
    centroids, append vectors into ``cell=<id>`` partitions, and record
    per-cell batch stats (count + exact fixed-point error sum).

    ``centroids`` is the small frozen table (cluster, c) — broadcast
    into every batch's argmin. Both writes are ``batch=<id>``-keyed
    overwrites, so checkpoint replays are idempotent."""
    cents = centroids.localCheckpoint(eager=True)  # freeze once, reuse per batch

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        routed = (
            assign_to_centroids(batch, cents, id_col=id_col, vec_col=vec_col)
            .join(batch.select(F.col(id_col).alias("id"), vec_col), "id")
            .select(
                F.col("id").alias(id_col),
                F.col(vec_col),
                F.col("cluster").alias("cell"),
                "dist_fx",
            )
            .localCheckpoint(eager=True)  # one computation for both writes
        )
        routed.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(index_path, f"batch={batch_id}")
        )
        (
            routed.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n_vecs"),
                F.sum("dist_fx").alias("sum_dist_fx"),
            )
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .parquet(os.path.join(stats_path, f"batch={batch_id}"))
        )

    return process_batch


def run_embedding_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    centroids: DataFrame,
    index_path: str,
    stats_path: str,
    checkpoint_dir: str,
) -> None:
    """Drain currently-available embedding files through the frozen-index
    ingest (Trigger.AvailableNow) — the test/backfill execution mode; a
    production deployment drops the trigger and runs continuously."""
    stream = spark.readStream.schema(EMB_STREAM_SCHEMA).parquet(input_dir)
    (
        stream.writeStream.foreachBatch(
            make_embedding_ingest_processor(
                centroids, index_path, stats_path
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


#: schema of the cell-partitioned index (what read_index returns even
#: before any batch has been ingested)
INDEX_SCHEMA = (
    "vec_id long, embedding array<double>, dist_fx long, cell int"
)

#: schema of the per-batch ingest stats log
INGEST_STATS_SCHEMA = (
    "cell int, n_vecs long, sum_dist_fx long, batch_id long"
)


def _has_batches(path: str) -> bool:
    try:
        return any(e.startswith("batch=") for e in os.listdir(path))
    except OSError:
        return False


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The accumulated cell-partitioned index across all ingested
    batches; a probe for cells [c1, c2] prunes the scan to those
    ``cell=`` directories (partition pruning on the read path).
    Before any batch has been ingested, returns an empty frame with the
    index schema instead of a path-not-found AnalysisException."""
    if not _has_batches(index_path):
        return spark.createDataFrame([], INDEX_SCHEMA)
    return spark.read.option("basePath", index_path).parquet(
        os.path.join(index_path, "batch=*")
    )


def read_ingest_stats(spark: SparkSession, stats_path: str) -> DataFrame:
    if not _has_batches(stats_path):
        return spark.createDataFrame([], INGEST_STATS_SCHEMA)
    return spark.read.parquet(os.path.join(stats_path, "batch=*"))
