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


def test_zorder_interleave_model(spark):
    """zorder_key_col matches the Python bit-interleave model, and buckets
    bound both dimensions."""
    from pyspark.sql import Row

    from etl_pipeline_challenge_aladia_spark.operators.layout import zorder_key_col

    import pyspark.sql.functions as F

    cases = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 12)]
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in cases])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key_col(F.col("a"), F.col("b"), 8).alias("z")
        ).collect()
    }

    def model(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): model(a, b) for a, b in cases}


def test_quantize_col_range_and_monotone(spark):
    from pyspark.sql import Row

    import pyspark.sql.functions as F

    from etl_pipeline_challenge_aladia_spark.operators.layout import quantize_col

    df = spark.createDataFrame([Row(v=v) for v in range(100, 200)])
    out = df.select(
        "v",
        quantize_col(F.col("v"), F.lit(100), F.lit(199), 4).alias("q"),
    ).collect()
    qs = [r["q"] for r in sorted(out, key=lambda r: r["v"])]
    assert min(qs) == 0 and max(qs) == 15
    assert qs == sorted(qs)  # monotone in v
