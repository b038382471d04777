"""Unit tests for BM25 retrieval, centroid outliers, length buckets, and
event debounce — tiny hand-checkable inputs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from etl_pipeline_challenge_aladia_spark.operators.funnel import debounce_stats
from etl_pipeline_challenge_aladia_spark.operators.sampling import length_buckets
from etl_pipeline_challenge_aladia_spark.operators.similarity import centroid_outliers
from etl_pipeline_challenge_aladia_spark.operators.terms import bm25_topk


def test_bm25_ranks_term_dense_docs_first(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark spark filler filler"),
            Row(doc_id=1, text="spark filler filler filler filler"),
            Row(doc_id=2, text="filler filler filler filler filler"),
        ]
    )
    rows = bm25_topk(docs, ["spark"], k=10).collect()
    # doc 2 has no query term -> absent; doc 0 (tf=3) outranks doc 1 (tf=1)
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0
    assert rows[0]["n_terms_hit"] == 1


def test_bm25_shorter_doc_wins_at_equal_tf(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="q a"),
            Row(doc_id=1, text="q a a a a a a a"),
        ]
    )
    rows = bm25_topk(docs, ["q"], k=2).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]  # length normalization


def test_centroid_outliers_flags_farthest(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, label=1, embedding=[0.0, 0.0]),
            Row(vec_id=1, label=1, embedding=[0.1, 0.0]),
            Row(vec_id=2, label=1, embedding=[5.0, 5.0]),  # the outlier
        ]
    )
    rows = centroid_outliers(emb, k=1).collect()
    assert len(rows) == 1
    assert rows[0]["vec_id"] == 2 and rows[0]["rnk"] == 1
    assert rows[0]["d2"] > 10


def test_length_buckets_equal_mass_and_monotone(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=" ".join(["w"] * (i + 1))) for i in range(10)]
    )
    rows = sorted(
        length_buckets(docs, n_buckets=5).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(r["n_docs"] == 2 for r in rows)
    # buckets ordered by length: each bucket's max <= next bucket's min
    for a, b in zip(rows, rows[1:]):
        assert a["max_tokens"] <= b["min_tokens"]


def test_debounce_collapses_bursts(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, user, typ, offset_s):
        return Row(
            event_id=i,
            user_id=user,
            event_type=typ,
            ts=t0 + dt.timedelta(seconds=offset_s),
        )

    events = spark.createDataFrame(
        [
            ev(1, 1, "click", 0),
            ev(2, 1, "click", 5),  # burst -> dropped
            ev(3, 1, "click", 90),  # kept (>=60s after #2)
            ev(4, 1, "view", 0),  # separate type stream -> kept
            ev(5, 2, "click", 3),  # separate user -> kept
        ]
    )
    rows = {r["event_type"]: r for r in debounce_stats(events, 60).collect()}
    assert rows["click"]["n_total"] == 4 and rows["click"]["n_kept"] == 3
    assert rows["view"]["n_kept"] == 1
    assert rows["click"]["kept_ratio"] == 0.75
