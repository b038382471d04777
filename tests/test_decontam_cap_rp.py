"""Unit tests for decontamination, domain capping, repetition ratio, and
random-hyperplane LSH (round-2 north-star operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.sampling import cap_per_group
from etl_pipeline_challenge_aladia_spark.operators.similarity import (
    rp_lsh_near_dup_pairs,
    rp_planes,
)
from etl_pipeline_challenge_aladia_spark.operators.text import (
    contamination_overlap,
    repetition_ratio_col,
    tokens_col,
)


def test_contamination_overlap_flags_shared_ngrams(spark):
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely different words here entirely now"),
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="watch the quick brown fox jumps today")]
    )
    out = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in contamination_overlap(train, bench, n=5).collect()
    }
    # doc 1 shares "the quick brown fox jumps" / "quick brown fox jumps over"?
    # only the first 5-gram appears in bench; doc 2 shares nothing
    assert out == {1: 1}


def test_contamination_overlap_broadcast_same_result(spark):
    train = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta epsilon zeta{i}") for i in range(6)]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=99, text="alpha beta gamma delta epsilon omega")]
    )
    plain = sorted(
        (r["doc_id"], r["n_shared_shingles"])
        for r in contamination_overlap(train, bench, n=5).collect()
    )
    bcast = sorted(
        (r["doc_id"], r["n_shared_shingles"])
        for r in contamination_overlap(train, bench, n=5, broadcast_bench=True).collect()
    )
    assert plain == bcast
    assert len(plain) == 6  # every train doc shares "alpha beta gamma delta epsilon"


def test_cap_per_group_keeps_cap_and_is_partition_invariant(spark):
    rows = [Row(g="a", doc_id=i) for i in range(10)] + [
        Row(g="b", doc_id=100 + i) for i in range(2)
    ]
    df = spark.createDataFrame(rows)
    kept = cap_per_group(df, "g", 3, "doc_id")
    got = sorted((r["g"], r["doc_id"]) for r in kept.collect())
    assert sum(1 for g, _ in got if g == "a") == 3
    assert sum(1 for g, _ in got if g == "b") == 2  # group smaller than cap: all kept
    got_repart = sorted(
        (r["g"], r["doc_id"])
        for r in cap_per_group(df.repartition(5), "g", 3, "doc_id").collect()
    )
    assert got == got_repart


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b"),  # 2-grams: ab ba ab ba ab -> 2/5 distinct
            Row(doc_id=2, text="v w x y z"),  # all unique
            Row(doc_id=3, text="solo"),  # shorter than n
        ]
    )
    words = tokens_col("text")
    got = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", repetition_ratio_col(words, 2).alias("rep")
        ).collect()
    }
    assert got[1] == pytest.approx(1.0 - 2.0 / 5.0)
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_rp_planes_deterministic_and_bounded():
    a = rp_planes(8, 16, seed=7)
    b = rp_planes(8, 16, seed=7)
    assert a == b
    assert all(-1.0 <= c < 1.0 for row in a for c in row)
    assert rp_planes(8, 16, seed=8) != a


def test_rp_lsh_finds_identical_and_skips_unrelated(spark):
    base = [1.0, 0.2, -0.3, 0.7, 0.05, -0.9, 0.4, 0.1]
    near = [x * 1.01 for x in base]  # cosine ~1.0, identical sign bits
    opposite = [-x for x in base]  # cosine -1.0
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=base),
            Row(vec_id=2, embedding=near),
            Row(vec_id=3, embedding=opposite),
        ]
    )
    pairs = {
        (r["vec_id_a"], r["vec_id_b"]): r["cos_sim"]
        for r in rp_lsh_near_dup_pairs(df, dim=8, threshold=0.9).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == pytest.approx(1.0, abs=1e-3)
