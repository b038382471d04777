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


def test_zorder_layout_enables_file_skipping(spark, sf_dir, tmp_path):
    """The point of the z-order key: files written range-partitioned by the
    Morton key cover bounded rectangles of (custkey, orderdate) space, so a
    narrow filter on EITHER dimension overlaps few files' min/max stats,
    while a random layout leaves every file covering ~the full range (no
    skipping). Asserted from the actual parquet footer statistics — the
    same stats a scan's row-group pruning consults."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_pipeline_challenge_aladia_spark.operators.layout import (
        quantize_col,
        zorder_key_col,
    )
    from etl_pipeline_challenge_aladia_spark.sources.files import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "o_day"
        ),
    )
    lo = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_day"), F.max("o_day")
    ).collect()[0]
    ck_mn, ck_mx, d_mn, d_mx = (int(v) for v in lo)
    z = zorder_key_col(
        quantize_col(F.col("o_custkey"), F.lit(ck_mn), F.lit(ck_mx), 8),
        quantize_col(F.col("o_day"), F.lit(d_mn), F.lit(d_mx), 8),
        8,
    )
    n_files = 16
    zdir, rdir = str(tmp_path / "zorder"), str(tmp_path / "random")
    orders.withColumn("_z", z).repartitionByRange(n_files, "_z").drop(
        "_z"
    ).write.parquet(zdir)
    orders.repartition(n_files).write.parquet(rdir)

    def overlap_fraction(d: str, col: str, lo_v: int, hi_v: int) -> float:
        files = glob.glob(os.path.join(d, "part-*.parquet"))
        assert len(files) >= n_files // 2
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) <= hi_v and max(maxs) >= lo_v:
                hit += 1
        return hit / len(files)

    ck_span = (ck_mx - ck_mn) // 10
    day_span = max(1, (d_mx - d_mn) // 10)
    for col, lo_v, hi_v in [
        ("o_custkey", ck_mn, ck_mn + ck_span),
        ("o_day", d_mn, d_mn + day_span),
    ]:
        z_frac = overlap_fraction(zdir, col, lo_v, hi_v)
        r_frac = overlap_fraction(rdir, col, lo_v, hi_v)
        # random layout: every file spans ~everything; z-order: a ~10% slice
        # of either dimension touches a minority of files
        assert r_frac > 0.9, f"{col}: random layout unexpectedly prunable"
        assert z_frac <= 0.5, f"{col}: zorder layout not prunable ({z_frac})"
        assert z_frac < r_frac
