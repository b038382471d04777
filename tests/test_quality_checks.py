"""Unit tests for declarative data-quality checks and profiling."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.quality_checks import (
    check_rules,
    fk_orphans,
    profile_table,
)


def test_check_rules_counts_and_null_violates(spark):
    df = spark.createDataFrame(
        [Row(x=1, s="ok"), Row(x=-1, s="ok"), Row(x=None, s="bad")]
    )
    out = {
        r["check_name"]: r
        for r in check_rules(
            df,
            {
                "x_nonpositive": F.col("x") <= 0,  # NULL x -> violation
                "s_invalid": F.col("s") != "ok",
            },
        ).collect()
    }
    assert out["x_nonpositive"]["n_violations"] == 2  # -1 and NULL
    assert out["s_invalid"]["n_violations"] == 1
    assert out["s_invalid"]["n_rows"] == 3
    assert abs(out["s_invalid"]["violation_rate"] - 0.3333) < 1e-9


def test_fk_orphans_counts_multiplicity_and_null_keys(spark):
    child = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=2), Row(k=None)]
    )
    parent = spark.createDataFrame([Row(pk=1)])
    row = fk_orphans(child, parent, "k", "pk", "child->parent").collect()[0]
    assert row["relationship"] == "child->parent"
    assert row["n_children"] == 4
    assert row["n_orphans"] == 2  # k=2 and the NULL key


def test_profile_table_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=3, b=None), Row(a=3, b="y")]
    )
    out = {r["column_name"]: r for r in profile_table(df).collect()}
    assert out["a"]["n_null"] == 0
    assert out["a"]["n_distinct"] == 2
    assert out["a"]["min_value"] == "1" and out["a"]["max_value"] == "3"
    assert out["b"]["n_null"] == 1
    assert out["b"]["min_value"] == "x" and out["b"]["max_value"] == "y"


def test_profile_table_rounds_doubles(spark):
    df = spark.createDataFrame([Row(d=1.23456789), Row(d=2.0)])
    out = {r["column_name"]: r for r in profile_table(df).collect()}
    assert out["d"]["min_value"] == "1.2346"
    assert out["d"]["max_value"] == "2.0"
