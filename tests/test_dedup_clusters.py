"""Unit tests for connected-component cluster formation (pointer-doubling
min-label propagation)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from etl_pipeline_challenge_aladia_spark.operators.dedup import dedup_clusters


def test_two_components(spark):
    pairs = spark.createDataFrame(
        [
            Row(doc_id_a=1, doc_id_b=2),
            Row(doc_id_a=2, doc_id_b=3),
            Row(doc_id_a=10, doc_id_b=11),
        ]
    )
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_in_log_rounds(spark):
    # a 100-node path has diameter 99: plain min-propagation needs ~99
    # rounds; pointer doubling must finish well within 12
    pairs = spark.createDataFrame(
        [Row(doc_id_a=i, doc_id_b=i + 1) for i in range(100)]
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, max_iters=12, small_graph_edges=0).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 101


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [Row(doc_id_a=i, doc_id_b=i + 1) for i in range(40)]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iters=1, small_graph_edges=0)


def test_small_graph_path_matches_distributed(spark):
    # deterministic pseudo-random graph: both physical strategies must
    # emit identical (id, cluster_id) labels
    import random

    rng = random.Random(7)
    pairs = spark.createDataFrame(
        [Row(doc_id_a=rng.randrange(120), doc_id_b=rng.randrange(120))
         for _ in range(150)]
    ).filter("doc_id_a != doc_id_b")
    local = {
        (r["id"], r["cluster_id"])
        for r in dedup_clusters(pairs).collect()  # small path (150 edges)
    }
    dist = {
        (r["id"], r["cluster_id"])
        for r in dedup_clusters(pairs, small_graph_edges=0).collect()
    }
    assert local == dist and local
