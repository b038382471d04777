"""Unit tests for deterministic splitting/sampling, boilerplate shingle
frequency, dedup survivor selection, and int8 embedding quantization
(round-2 north-star operators)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.vectors import (
    int8_quant_error_col,
    int8_quantize_col,
    l2_normalize_col,
    to_double_array,
)
from etl_pipeline_challenge_aladia_spark.operators.dedup import canonical_per_cluster
from etl_pipeline_challenge_aladia_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket_col,
    hash_split_col,
)
from etl_pipeline_challenge_aladia_spark.operators.text import shingle_doc_freq


def test_hash_split_is_deterministic_and_partitions(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = df.select("doc_id", hash_split_col("doc_id").alias("s")).collect()
    b = (
        df.repartition(7)
        .select("doc_id", hash_split_col("doc_id").alias("s"))
        .collect()
    )
    assert {r["doc_id"]: r["s"] for r in a} == {r["doc_id"]: r["s"] for r in b}
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(hash_split_col("doc_id").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    # 80/10/10 in expectation; allow generous slack for 1000 draws
    assert 700 < counts["train"] < 900


def test_deterministic_sample_is_nested_across_rates(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.01).collect()}
    s10 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.10).collect()}
    s100 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 1.0).collect()}
    assert s1 <= s10 <= s100
    assert len(s100) == 2000
    assert 100 < len(s10) < 320  # ~200 expected


def test_hash_bucket_range(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    mm = df.select(
        F.min(hash_bucket_col("doc_id", 100)).alias("lo"),
        F.max(hash_bucket_col("doc_id", 100)).alias("hi"),
    ).first()
    assert 0 <= mm["lo"] and mm["hi"] <= 99


def test_shingle_doc_freq_counts_documents_not_occurrences(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c a b c a b c"),  # shingle "a b c" thrice
            Row(doc_id=2, text="a b c x y z"),
            Row(doc_id=3, text="x y z only here"),
        ]
    )
    freq = {
        r["shingle"]: r["doc_freq"] for r in shingle_doc_freq(docs, n=3).collect()
    }
    assert freq["a b c"] == 2  # distinct-per-doc: doc 1 counts once
    assert freq["x y z"] == 2
    assert freq["b c a"] == 1


def test_canonical_per_cluster_picks_best_quality_then_smallest_id(spark):
    labels = spark.createDataFrame(
        [Row(id=1, cluster_id=1), Row(id=2, cluster_id=1), Row(id=3, cluster_id=1),
         Row(id=7, cluster_id=7), Row(id=9, cluster_id=7)]
    )
    scored = spark.createDataFrame(
        [Row(doc_id=1, q=0.5), Row(doc_id=2, q=0.9), Row(doc_id=3, q=0.9),
         Row(doc_id=7, q=0.4), Row(doc_id=9, q=0.4)]
    )
    out = {
        r["cluster_id"]: r
        for r in canonical_per_cluster(labels, scored, score_col="q").collect()
    }
    assert out[1]["canonical_id"] == 2  # 0.9 tie -> smaller id
    assert out[1]["n_members"] == 3
    assert out[7]["canonical_id"] == 7
    assert out[7]["canonical_score"] == pytest.approx(0.4)


def test_int8_quantize_roundtrip_and_error(spark):
    df = spark.createDataFrame(
        [Row(vid=1, v=[1.0, -0.5, 0.25, 0.0]), Row(vid=2, v=[0.0, 0.0, 0.0, 0.0])]
    )
    arr = to_double_array("v")
    rows = {
        r["vid"]: r
        for r in df.select(
            "vid",
            int8_quantize_col(arr).alias("q"),
            int8_quant_error_col(arr).alias("err"),
        ).collect()
    }
    # scale = 1/127: 1.0 -> 127, -0.5 -> floor(-63.5+0.5) = -63, 0.25 -> 32
    assert rows[1]["q"] == [127, -63, 32, 0]
    recon = [q / 127.0 for q in rows[1]["q"]]
    expected_err = sum(
        abs(x - r) for x, r in zip([1.0, -0.5, 0.25, 0.0], recon)
    ) / 4
    assert rows[1]["err"] == pytest.approx(expected_err, abs=1e-12)
    # all-zero vector: quantizes to zeros, zero error (no division blowup)
    assert rows[2]["q"] == [0, 0, 0, 0]
    assert rows[2]["err"] == 0.0


def test_l2_normalize(spark):
    df = spark.createDataFrame([Row(v=[3.0, 4.0]), Row(v=[0.0, 0.0])])
    got = df.select(l2_normalize_col(to_double_array("v")).alias("n")).collect()
    assert got[0]["n"][0] == pytest.approx(0.6)
    assert got[0]["n"][1] == pytest.approx(0.8)
    assert math.isclose(
        sum(x * x for x in got[0]["n"]), 1.0, rel_tol=1e-12
    )
    assert got[1]["n"] == [0.0, 0.0]  # zero vector passes through


def test_stratified_sample_nested_and_deterministic(spark, sf_dir):
    """Per-stratum rate sampling: lower per-group rates select SUBSETS of
    higher ones (nested samples), unlisted groups keep default_rate, and
    membership is stable across repartitionings."""
    from etl_pipeline_challenge_aladia_spark.operators.sampling import (
        stratified_sample,
    )
    from etl_pipeline_challenge_aladia_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    lo = stratified_sample(docs, "lang", {"en": 0.1, "fr": 0.3}, "doc_id")
    hi = stratified_sample(docs, "lang", {"en": 0.4, "fr": 0.9}, "doc_id")
    lo_ids = {r["doc_id"] for r in lo.select("doc_id").collect()}
    hi_ids = {r["doc_id"] for r in hi.select("doc_id").collect()}
    assert lo_ids <= hi_ids
    # unlisted langs ride through whole at default_rate=1.0
    n_de = docs.filter("lang = 'de'").count()
    assert lo.filter("lang = 'de'").count() == n_de
    # stable under repartitioning
    re_ids = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(13), "lang", {"en": 0.1, "fr": 0.3}, "doc_id"
        ).select("doc_id").collect()
    }
    assert re_ids == lo_ids


def test_leakage_safe_split_respects_clusters(spark):
    """Near-dup pair members ALWAYS share a split (decided by the min-id
    representative); documents in no pair keep exactly their plain
    hash_split assignment; every doc appears exactly once."""
    from pyspark.sql import functions as F

    from etl_pipeline_challenge_aladia_spark.operators.sampling import (
        hash_split_col,
        leakage_safe_split,
    )

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    # pairs: (0,1), (1,2) chain -> one cluster {0,1,2}; (50,51) another
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (50, 51)], ["doc_id_a", "doc_id_b"]
    )
    out = leakage_safe_split(docs, pairs).collect()
    assert len(out) == 200
    rows = {r["doc_id"]: r for r in out}
    assert rows[0]["rep_id"] == rows[1]["rep_id"] == rows[2]["rep_id"] == 0
    assert rows[0]["split"] == rows[1]["split"] == rows[2]["split"]
    assert rows[50]["split"] == rows[51]["split"]
    assert rows[50]["rep_id"] == 50

    plain = {
        r["doc_id"]: r["split"]
        for r in docs.select(
            "doc_id", hash_split_col(F.col("doc_id")).alias("split")
        ).collect()
    }
    clustered = {0, 1, 2, 50, 51}
    for d, r in rows.items():
        if d not in clustered:
            assert r["rep_id"] == d
            assert r["split"] == plain[d]  # bitwise fallback to plain split
    # the split of a cluster equals the plain split of its representative
    assert rows[1]["split"] == plain[0]
    assert rows[51]["split"] == plain[50]


def test_token_budget_sample_boundary_and_nesting(spark):
    from etl_pipeline_challenge_aladia_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * 10)) for i in range(20)],
        "doc_id long, source string, text string",
    )
    # every doc is 10 tokens; a 35-token budget admits exactly 3 docs
    picked = token_budget_sample(docs, "source", 35, "doc_id")
    rows = picked.orderBy("cum_tokens").collect()
    assert [r["cum_tokens"] for r in rows] == [10, 20, 30]
    # nesting: a smaller budget selects a prefix of a larger budget's picks
    small = {r["doc_id"] for r in token_budget_sample(docs, "source", 25, "doc_id").collect()}
    large = {r["doc_id"] for r in token_budget_sample(docs, "source", 95, "doc_id").collect()}
    assert small < large
    # budget below the first candidate's cost selects nothing
    assert token_budget_sample(docs, "source", 5, "doc_id").count() == 0


def test_token_budget_sample_is_partitioning_invariant(spark):
    from etl_pipeline_challenge_aladia_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", " ".join(["tok"] * (3 + i % 7))) for i in range(60)],
        "doc_id long, source string, text string",
    )
    a = {r["doc_id"] for r in token_budget_sample(docs, "source", 40, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in token_budget_sample(docs.repartition(13), "source", 40, "doc_id").collect()
    }
    assert a == b and a


def test_token_budget_sample_nesting_chain_and_group_isolation(spark):
    """Prefix-admission invariants across a whole budget chain: every
    smaller budget's selection is a subset of every larger one's, per
    group independently (one group's long docs never affect another's
    admission), and the admitted token sum never exceeds the budget."""
    from etl_pipeline_challenge_aladia_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [
            (i, f"g{i % 3}", " ".join(["w"] * (4 + (i * 7) % 11)))
            for i in range(45)
        ],
        "doc_id long, source string, text string",
    )
    budgets = [0, 9, 25, 60, 10_000]
    picks = {}
    for b in budgets:
        rows = token_budget_sample(docs, "source", b, "doc_id").collect()
        picks[b] = {(r["source"], r["doc_id"]) for r in rows}
        per_group: dict[str, int] = {}
        for r in rows:
            per_group[r["source"]] = per_group.get(r["source"], 0) + r["n_tokens"]
        assert all(v <= b for v in per_group.values()), (b, per_group)
    for lo, hi in zip(budgets, budgets[1:]):
        assert picks[lo] <= picks[hi], (lo, hi)
    assert picks[0] == set()
    assert len(picks[10_000]) == 45  # unconstrained budget admits everything
