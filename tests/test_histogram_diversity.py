"""Unit tests for fixed-width histograms and Simpson token diversity."""

from __future__ import annotations

from pyspark.sql import Row

from etl_pipeline_challenge_aladia_spark.operators.quality_checks import (
    fixed_width_histogram,
)
from etl_pipeline_challenge_aladia_spark.operators.terms import token_diversity


def test_histogram_bins_and_edges(spark):
    df = spark.createDataFrame([Row(value=float(x)) for x in range(0, 100)])
    rows = {r["bin"]: r for r in fixed_width_histogram(df, "value", n_bins=10).collect()}
    assert len(rows) == 10
    assert rows[0]["lo"] == 0.0 and rows[0]["n_rows"] == 10
    # max value (99) clamps into the last bin
    assert rows[9]["hi"] == 99.0 and rows[9]["n_rows"] == 10


def test_histogram_constant_column_single_bin(spark):
    df = spark.createDataFrame([Row(value=5.0)] * 4 + [Row(value=None)])
    rows = fixed_width_histogram(df, "value", n_bins=10).collect()
    assert len(rows) == 1
    assert rows[0]["bin"] == 0 and rows[0]["n_rows"] == 4  # NULL excluded


def test_token_diversity_extremes(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, lang="rep", text="a a a a"),  # all same -> 0
            Row(doc_id=1, lang="var", text="a b c d"),  # all distinct -> 1 - 4/16
        ]
    )
    rows = {r["lang"]: r for r in token_diversity(docs).collect()}
    assert rows["rep"]["avg_diversity"] == 0.0
    assert rows["var"]["avg_diversity"] == 0.75
    assert rows["var"]["n_docs"] == 1
