"""Unit tests for corpus term statistics, sequence packing, and kNN
label propagation — tiny hand-checkable corpora."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from etl_pipeline_challenge_aladia_spark.operators.packing import pack_sequences
from etl_pipeline_challenge_aladia_spark.operators.similarity import knn_classify
from etl_pipeline_challenge_aladia_spark.operators.terms import (
    bigram_lift,
    inverted_shingle_index,
    tfidf_top_terms,
    vocab_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, (t, s) in enumerate(rows)]
    )


def test_tfidf_prefers_rare_terms(spark):
    docs = _docs(
        spark,
        [
            ("common rare common", "s"),
            ("common common common", "s"),
            ("common other other", "s"),
        ],
    )
    out = {
        (r["doc_id"], r["rnk"]): r["term"]
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # doc 0: 'rare' (tf=1, df=1 -> score 3) beats 'common' (tf=2, df=3 -> 2)
    assert out[(0, 1)] == "rare"
    assert out[(2, 1)] == "other"


def test_vocab_topk_rank_and_share(spark):
    docs = _docs(spark, [("a a b", "s"), ("a c", "s")])
    rows = {r["token"]: r for r in vocab_topk(docs, k=10).collect()}
    assert rows["a"]["rank"] == 1 and rows["a"]["n_occ"] == 3
    assert rows["a"]["df"] == 2
    assert rows["a"]["share"] == 0.6  # 3/5
    # count tie between b and c -> lexicographic tie-break
    assert rows["b"]["rank"] == 2 and rows["c"]["rank"] == 3


def test_inverted_index_bounds_and_sorted_postings(spark):
    sh = "x y z"  # the single shingle of each 3-token doc
    docs = _docs(spark, [(sh, "s"), (sh, "s"), ("q r s", "s")])
    rows = {r["shingle"]: r for r in inverted_shingle_index(docs, 2, 5).collect()}
    assert list(rows) == [sh]  # df=1 shingle excluded
    assert rows[sh]["df"] == 2 and rows[sh]["postings"] == "0,1"


def test_bigram_lift_orders_collocations(spark):
    # 'tight pair' always adjacent; 'loose' co-occurs with everything
    docs = _docs(spark, [("tight pair loose", "s")] * 5)
    rows = bigram_lift(docs, min_count=5, k=10).collect()
    by_bigram = {r["bigram"]: r for r in rows}
    assert by_bigram["tight pair"]["c_ab"] == 5
    # N=15, c_ab=5, c_a=c_b=5 -> lift = 75/25 = 3
    assert by_bigram["tight pair"]["lift"] == 3.0
    assert rows[0]["bigram"] in ("pair loose", "tight pair")  # both lift 3


def test_pack_sequences_boundaries(spark):
    # budget 5: doc0 (3 tok) starts seq 0; doc1 (3 tok) starts at offset 3
    # -> seq 0; doc2 starts at offset 6 -> seq 1
    docs = _docs(spark, [("a b c", "s"), ("d e f", "s"), ("g h i", "s")])
    rows = {r["seq_id"]: r for r in pack_sequences(docs, budget=5).collect()}
    assert rows[0]["n_docs"] == 2 and rows[0]["seq_tokens"] == 6
    assert rows[0]["first_doc"] == 0 and rows[0]["last_doc"] == 1
    assert rows[1]["n_docs"] == 1 and rows[1]["first_doc"] == 2


def test_pack_sequences_independent_per_group(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b", source="s1"),
            Row(doc_id=1, text="c d", source="s2"),
        ]
    )
    rows = pack_sequences(docs, budget=2048).collect()
    assert {(r["source"], r["seq_id"]) for r in rows} == {("s1", 0), ("s2", 0)}


@pytest.mark.slow  # measured heavy in the full --durations run (see pytest.ini)
def test_knn_classify_majority_and_tie_break(spark):
    labeled = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[1.0, 0.0], label=1),  # cos 1.0
            Row(vec_id=12, embedding=[0.9, 0.1], label=2),  # cos ~0.994
            Row(vec_id=11, embedding=[0.5, 0.5], label=1),  # cos ~0.707
        ]
    )
    queries = spark.createDataFrame([Row(query_id=0, embedding=[1.0, 0.0])])
    row = knn_classify(labeled, queries, k=3).collect()[0]
    assert row["predicted_label"] == 1 and row["n_votes"] == 2
    # 1-1 tie at k=2 between labels 1 and 2 -> smaller label wins
    row2 = knn_classify(labeled, queries, k=2).collect()[0]
    assert row2["n_votes"] == 1
    assert row2["predicted_label"] == 1


def test_unigram_surprisal_ranks_rare_token_docs_highest(spark):
    from etl_pipeline_challenge_aladia_spark.operators.terms import unigram_surprisal

    # 9 docs of pure heavy-hitters, 1 doc full of singletons
    rows = [(i, "s", "the the the the") for i in range(9)]
    rows.append((9, "s", "zq1 zq2 zq3 zq4"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    top = unigram_surprisal(docs, k=1).collect()
    assert top[0]["doc_id"] == 9
    # bits are exact: T=40 tokens -> bits(40)=6; singleton c=1 -> bits=1
    assert top[0]["total_bits"] == 4 * (6 - 1)


def test_ngram_novelty_attributes_first_occurrence_only(spark):
    from etl_pipeline_challenge_aladia_spark.operators.terms import ngram_novelty

    docs = spark.createDataFrame(
        [
            (0, "a", "x y z w"),       # grams: "x y z", "y z w" -> both novel
            (1, "b", "x y z w"),       # exact re-post -> 0 novel
            (2, "b", "p q r s"),       # fresh -> 2 novel
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out["a"]["n_novel"] == 2 and out["a"]["novelty_rate"] == 1.0
    assert out["b"]["n_grams"] == 4 and out["b"]["n_novel"] == 2
    assert out["b"]["novelty_rate"] == 0.5


def test_oov_rate_counts_tokens_outside_topk(spark):
    from etl_pipeline_challenge_aladia_spark.operators.terms import oov_rate

    docs = spark.createDataFrame(
        [(0, "s", "a a a b b c")],
        "doc_id long, source string, text string",
    )
    # vocab_size=2 keeps {a, b}; c is OOV -> 1/6
    row = oov_rate(docs, vocab_size=2).collect()[0]
    assert row["total_tokens"] == 6 and row["oov_tokens"] == 1
    assert abs(row["oov_share"] - round(1 / 6, 4)) < 1e-12
