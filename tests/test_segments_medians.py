"""Unit tests for the group-median quality cut (and the determinism edge
cases that make it engine-portable)."""

from __future__ import annotations

from pyspark.sql import Row

from etl_pipeline_challenge_aladia_spark.operators.sampling import (
    keep_above_group_median,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(rid=i, grp=g, sc=float(s)) for i, (g, s) in enumerate(rows)]
    )


def test_odd_group_true_median(spark):
    df = _df(spark, [("a", 1), ("a", 2), ("a", 3)])
    r = keep_above_group_median(df, "sc", "grp", "rid").collect()[0]
    assert r["median_score"] == 2.0
    assert r["n_rows"] == 3 and r["n_kept"] == 1  # only the 3


def test_even_group_lower_median(spark):
    # n=4 -> lower median = element at floor((4+1)/2) = position 2 -> 2.0
    df = _df(spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4)])
    r = keep_above_group_median(df, "sc", "grp", "rid").collect()[0]
    assert r["median_score"] == 2.0
    assert r["n_kept"] == 2  # 3 and 4 strictly above


def test_ties_do_not_overcount(spark):
    # all-equal scores: nothing is strictly above the median
    df = _df(spark, [("a", 5), ("a", 5), ("a", 5)])
    r = keep_above_group_median(df, "sc", "grp", "rid").collect()[0]
    assert r["median_score"] == 5.0 and r["n_kept"] == 0


def test_groups_independent(spark):
    df = _df(spark, [("a", 1), ("a", 10), ("b", 7)])
    rows = {r["grp"]: r for r in keep_above_group_median(df, "sc", "grp", "rid").collect()}
    assert rows["a"]["median_score"] == 1.0 and rows["a"]["n_kept"] == 1
    assert rows["b"]["median_score"] == 7.0 and rows["b"]["n_kept"] == 0
