"""Tuning-decision provenance store (VERDICT r9 #7).

``tune_nprobe``/``tune_bands`` return tuples that evaporate; a
deployment wants every measured decision ON RECORD — which knob was
chosen, what recall it achieved against what target, the evaluated
curve points, and a fingerprint of the corpus the decision was measured
on — so the drift loop can close the same way drift->retrain already
does for centroids: when the serving corpus's fingerprint no longer
matches the last report's, re-tune; when a re-tune lands on a different
knob, redeploy. Reports live under the shared batch-keyed store
contract (streaming/store.py), so a checkpoint-replayed tuning run
overwrites its own report instead of duplicating it.

Reference analog: none (the reference keeps no cross-message state,
SURVEY.md §2.12); this closes the loop on the measured-decision pattern
(tune_nprobe / tune_bands / auto_salted_join / auto_semantic_k).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.hashing import (
    md5_fold32_col,
)
from etl_pipeline_challenge_aladia_spark.streaming.store import (
    append_batch,
    read_store,
)

TUNING_REPORT_SCHEMA = (
    "knob string, chosen long, achieved_recall_permille long,"
    " target_permille long, corpus_fingerprint long, n_inputs long,"
    " curve string, batch_id long"
)


def corpus_fingerprint(df: DataFrame, id_col: str) -> tuple[int, int]:
    """Deterministic, order-independent fingerprint of a tuning input:
    (sum of md5-folded ids mod 2^62, row count). Same engine-exact
    md5 fold as the samplers, so the same corpus always fingerprints
    identically across sessions and partitionings; any membership
    change moves the sum. One 1-row aggregate — bounded driver state."""
    row = df.select(
        (
            F.sum(md5_fold32_col(F.col(id_col).cast("string")))
            % F.lit(1 << 62)
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return int(row.s or 0), int(row.n)


def append_tuning_report(
    spark: SparkSession,
    path: str,
    batch_id: int,
    knob: str,
    chosen: int,
    achieved_recall_permille: int,
    target_permille: int,
    fingerprint: int,
    n_inputs: int,
    trace: list | None = None,
) -> None:
    """Persist one tuning decision under the store contract — batch-
    keyed overwrite, so a replayed tune is idempotent. ``trace`` is the
    walk's evaluated (candidate, recall) points, stored as JSON: the
    curve snapshot an audit reads next to the decision."""
    row = (
        knob,
        int(chosen),
        int(achieved_recall_permille),
        int(target_permille),
        int(fingerprint),
        int(n_inputs),
        json.dumps(trace or [], separators=(",", ":")),
        int(batch_id),
    )
    append_batch(
        spark.createDataFrame([row], TUNING_REPORT_SCHEMA), path, batch_id
    )


def read_tuning_reports(spark: SparkSession, path: str) -> DataFrame:
    return read_store(spark, path, TUNING_REPORT_SCHEMA)


def tune_bands_and_report(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    batch_id: int,
    target_recall_permille: int = 900,
    **kwargs,
) -> tuple[int, int]:
    """Run the banding autotune and record the decision: chosen
    banding, achieved recall, the evaluated curve, and the tuning
    corpus's fingerprint. Returns (bands, recall) exactly like
    tune_bands."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        tune_bands,
    )

    id_col = kwargs.get("id_col", "doc_id")
    fp, n = corpus_fingerprint(docs, id_col)
    trace: list = []
    bands, recall = tune_bands(
        docs,
        target_recall_permille=target_recall_permille,
        trace=trace,
        **kwargs,
    )
    append_tuning_report(
        spark, path, batch_id, "lsh_bands", bands, recall,
        target_recall_permille, fp, n, trace,
    )
    return bands, recall


def tune_nprobe_and_report(
    spark: SparkSession,
    embeddings: DataFrame,
    queries: DataFrame,
    path: str,
    batch_id: int,
    dim: int,
    target_recall_permille: int = 900,
    **kwargs,
) -> tuple[int, int]:
    """Run the nprobe autotune and record the decision — the ANN twin
    of tune_bands_and_report; the fingerprint covers the INDEX side
    (the corpus whose drift invalidates the knob)."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        tune_nprobe,
    )

    id_col = kwargs.get("id_col", "vec_id")
    fp, n = corpus_fingerprint(embeddings, id_col)
    trace: list = []
    nprobe, recall = tune_nprobe(
        embeddings, queries, dim=dim,
        target_recall_permille=target_recall_permille,
        trace=trace, **kwargs,
    )
    append_tuning_report(
        spark, path, batch_id, "ivf_nprobe", nprobe, recall,
        target_recall_permille, fp, n, trace,
    )
    return nprobe, recall


def band_autotune_maintenance(
    spark: SparkSession,
    sf_dir: str,
    report_path: str,
    batch_id: int = 0,
    target_recall_permille: int = 900,
) -> tuple[int, int]:
    """The deployment form of the cataloged doc_lsh_band_autotune
    (VERDICT r10 missing #3): SAME fixed-size hash-priority sample,
    SAME recall walk — but the decision leaves a report behind
    (chosen banding, achieved recall, curve trace, corpus
    fingerprint). The catalog entry stays report-free so its oracle
    hash never touches the filesystem; a deployment runs THIS."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import (
        band_autotune_sample,
    )

    return tune_bands_and_report(
        spark,
        band_autotune_sample(spark, sf_dir),
        report_path,
        batch_id,
        target_recall_permille=target_recall_permille,
    )


def nprobe_autotune_maintenance(
    spark: SparkSession,
    sf_dir: str,
    report_path: str,
    batch_id: int = 0,
    target_recall_permille: int = 900,
) -> tuple[int, int]:
    """The deployment form of the cataloged emb_ivf_nprobe_autotune:
    same index corpus and query sample, decision recorded. The
    fingerprint covers the INDEX side — the corpus whose drift
    invalidates the knob."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import (
        nprobe_autotune_inputs,
    )

    cands, queries = nprobe_autotune_inputs(spark, sf_dir)
    return tune_nprobe_and_report(
        spark,
        cands,
        queries,
        report_path,
        batch_id,
        dim=64,
        k=5,
        target_recall_permille=target_recall_permille,
    )
