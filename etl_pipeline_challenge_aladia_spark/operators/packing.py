"""Sequence packing: plan how a token stream fills fixed-length training
sequences (GPT-style concatenate-then-split packing).

Documents are concatenated in ``doc_id`` order within each ``group_col``
stream and the stream is cut every ``budget`` tokens; a document belongs
to the sequence its FIRST token lands in. The output is the packing plan
(per-sequence doc/token counts) that a training-data writer materializes.

Scale shape: one token-count projection (pure column arithmetic, no
explode) + one running-sum window PARTITIONED BY THE GROUP COLUMN — the
window never runs over a single global partition, so parallelism is the
number of source streams. For a pathologically large single stream,
pre-split it (e.g. group by (source, doc_id range bucket)) — the
two-pass partition-offset trick — before calling this planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.text import token_count_col


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (group, sequence) packing plan: how many documents start in each
    ``budget``-token window of the concatenated stream, their token mass,
    and the doc-id span — everything a sharded sequence writer needs to
    emit training examples without re-scanning text.
    """
    n = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        token_count_col(text_col).alias("n_tok"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = n.withColumn("_start", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        placed.groupBy(
            "grp",
            F.floor(F.col("_start") / F.lit(float(budget))).cast("long").alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .withColumnRenamed("grp", group_col)
    )
