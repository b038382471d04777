"""Streaming media-fingerprint store ingest — dedup-at-ingest for the
multimodal column family, completing the store trio (text signatures:
streaming/docs.py sigstore; embeddings: streaming/embeddings.py index;
media: this module).

Shape: a ``batch=<id>``-keyed store accumulates each micro-batch's image
aHash fingerprints (operators/multimodal.py:image_ahash — REAL NetPBM
decode inside Arrow-batched mapInPandas), and every arriving batch is
screened against the STORED fingerprints with the banded-Hamming
cross-frame join (``hamming_band_pairs_across`` — pigeonhole-exact
recall at the <= 3 threshold). Per-batch cost is the delta's own decode
plus one band-keyed equi-join against the store; stored payload bytes
are never re-read — only their 64-bit hashes.

Replay-idempotent by the streaming layer's standing contract: report
and store append are ``batch=<id>`` overwrite directories, the screen
reads the store EXCLUDING the replayed batch's own directory, and a
compacted history under the reserved ``compacted/`` directory is read
unconditionally (the fresh-checkpoint batch-0 collision safety of
streaming/docs.py:COMPACTED_DIR).

The file-stream harness carries payloads base64-encoded (JSON has no
binary type); the processor decodes with ``unbase64`` before hashing.

Reference analog: none (the reference pipeline has no media columns);
north-star multimodal scope.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.streaming.docs import (
    COMPACTED_DIR,
    _read_store,
)

#: per-batch image fingerprints
MEDIA_SIG_STORE_SCHEMA = "media_id long, ahash long"

#: per-batch near-dup report (delta image vs stored image)
MEDIA_NEAR_DUP_REPORT_SCHEMA = (
    "delta_id long, corpus_id long, hamming long, batch_id long"
)

#: minimal media-stream schema for the file-source harness
MEDIA_STREAM_SCHEMA = "media_id long, modality string, content_b64 string"


def _delta_media_frame(delta: DataFrame) -> DataFrame:
    """File-harness rows -> the (media_id, modality, content) shape the
    fingerprint kernel consumes (base64 -> binary)."""
    return delta.select(
        "media_id",
        "modality",
        F.unbase64(F.col("content_b64")).alias("content"),
    )


def make_media_fingerprint_ingest_processor(
    store_path: str,
    report_path: str,
    max_hamming: int = 3,
    bands: int = 4,
):
    """foreachBatch processor: hash this batch's images, screen them
    against the accumulated fingerprint store (strictly cross-batch —
    within-batch twins surface on the next batch, the standing
    batch-ordering semantics), then append this batch's fingerprints."""

    def process_batch(delta: DataFrame, batch_id: int) -> None:
        from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
            hamming_band_pairs_across,
            image_ahash,
        )

        spark = delta.sparkSession
        delta = delta.localCheckpoint(eager=True)
        sigs = image_ahash(_delta_media_frame(delta)).localCheckpoint(
            eager=True
        )
        store = _read_store(
            spark, store_path, MEDIA_SIG_STORE_SCHEMA, exclude_batch=batch_id
        )
        report = hamming_band_pairs_across(
            sigs, store, max_hamming=max_hamming, bands=bands
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        report.write.mode("overwrite").parquet(
            os.path.join(report_path, f"batch={batch_id}")
        )
        sigs.write.mode("overwrite").parquet(
            os.path.join(store_path, f"batch={batch_id}")
        )

    return process_batch


def read_media_near_dup_report(spark: SparkSession, report_path: str) -> DataFrame:
    return _read_store(spark, report_path, MEDIA_NEAR_DUP_REPORT_SCHEMA)


def read_media_sig_store(spark: SparkSession, store_path: str) -> DataFrame:
    return _read_store(spark, store_path, MEDIA_SIG_STORE_SCHEMA)


def run_media_fingerprint_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    store_path: str,
    report_path: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> None:
    """Drain currently-available media files through the fingerprint
    ingest (Trigger.AvailableNow; 1 file = 1 micro-batch, so every
    file's images are screened against all previously-ingested
    fingerprints)."""
    stream = (
        spark.readStream.schema(MEDIA_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(input_dir)
    )
    (
        stream.writeStream.foreachBatch(
            make_media_fingerprint_ingest_processor(
                store_path, report_path, max_hamming, bands
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def compact_media_sig_store(
    spark: SparkSession, store_path: str, out_path: str
) -> int:
    """Consolidate a fingerprint store's per-batch directories into ONE
    reserved ``compacted/`` layout at a fresh path — same
    publish-then-point pattern and fresh-checkpoint batch-0 safety as
    the other compactors, with a global DISTINCT shrink (the same image
    ingested by many batches stores one row). Returns the number of
    stored distinct fingerprints."""
    sigs = _read_store(spark, store_path, MEDIA_SIG_STORE_SCHEMA)
    sigs.distinct().write.mode("overwrite").parquet(
        os.path.join(out_path, COMPACTED_DIR)
    )
    return spark.read.parquet(os.path.join(out_path, COMPACTED_DIR)).count()
