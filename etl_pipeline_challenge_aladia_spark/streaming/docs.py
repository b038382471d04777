"""Streaming document ingest with incremental near-dup screening.

The streaming twin of ``operators/similarity.py:minhash_incremental_pairs``:
a continuous ingest of new documents where every micro-batch is screened
against the ACCUMULATED corpus before joining it — the online form of the
daily-ingest dedup shape. Composition, not new machinery: ``foreachBatch``
runs the exact batch operator, and the corpus grows by one idempotent
batch-keyed append per micro-batch.

At 100 TB the corpus side stores precomputed MinHash signatures (and
shingle sets for verification) rather than raw text, so per-batch cost is
the delta's shingles plus LSH bucket matches; the raw-text recompute here
keeps the fixture self-contained while exercising the identical flow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_challenge_aladia_spark.operators.similarity import (
    minhash_incremental_pairs,
)

DOC_STREAM_SCHEMA = "doc_id long, text string"


def make_incremental_dedup_processor(
    corpus_path: str, report_path: str, threshold: float = 0.8
):
    """The ``foreachBatch`` body: screen the delta against the stored
    corpus, then append the delta to the corpus.

    Idempotent under replay: both the near-dup report and the corpus
    append land in ``batch=<id>`` subdirectories written with overwrite,
    so a checkpoint-replayed batch rewrites its own output instead of
    duplicating it (the same batch-keyed idempotence contract the CDC
    sinks get from keyed upserts).
    """

    def process_batch(delta: DataFrame, batch_id: int) -> None:
        spark = delta.sparkSession
        delta = delta.localCheckpoint(eager=True)  # one computation per use
        if os.path.exists(corpus_path):
            corpus = spark.read.parquet(corpus_path)
            pairs = minhash_incremental_pairs(
                corpus, delta, threshold=threshold
            )
        else:
            pairs = (
                delta.limit(0)
                .selectExpr(
                    "doc_id AS delta_id",
                    "doc_id AS corpus_id",
                    "CAST(0.0 AS DOUBLE) AS jaccard",
                )
            )
        pairs.write.mode("overwrite").parquet(
            os.path.join(report_path, f"batch={batch_id}")
        )
        delta.write.mode("overwrite").parquet(
            os.path.join(corpus_path, f"batch={batch_id}")
        )

    return process_batch


def run_incremental_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    corpus_path: str,
    report_path: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
) -> None:
    """Run the incremental-dedup ingest over all currently-available files
    and stop (Trigger.AvailableNow) — continuous deployment just drops the
    trigger. Each micro-batch is screened against every PREVIOUS batch's
    documents (the corpus accumulates batch by batch)."""
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(input_dir)
    (
        stream.writeStream.foreachBatch(
            make_incremental_dedup_processor(corpus_path, report_path, threshold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
