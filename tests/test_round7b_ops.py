"""Planted-geometry tests for the round-7b operators: SymSpell
deletion-blocked vocabulary fuzzy pairs, the count-min sketch audit,
and the oracle-pinned distributed connected-components catalog path."""

from __future__ import annotations

from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _docs(spark, tokens):
    return spark.createDataFrame(
        [(0, " ".join(tokens))], "doc_id long, text string"
    )


def test_symspell_matches_bruteforce_levenshtein(spark):
    """Blocking must be lossless: the deletion-neighborhood join +
    verify output equals the brute-force all-pairs lev<=2 set on a
    vocab planted with substitution, insertion, deletion, and mixed
    2-edit pairs."""
    from etl_pipeline_challenge_aladia_spark.operators.terms import (
        symspell_vocab_pairs,
    )

    vocab = ["cat", "bat", "cart", "carts", "dog", "dig", "digs", "query"]
    got = {
        (r["tok_a"], r["tok_b"]): r["lev"]
        for r in symspell_vocab_pairs(_docs(spark, vocab)).collect()
    }
    want = {
        (a, b): _lev(a, b)
        for a in vocab
        for b in vocab
        if a < b and _lev(a, b) <= 2
    }
    assert got == want
    assert ("cart", "cat") in got  # 1 insertion
    assert ("bat", "cat") in got and got[("bat", "cat")] == 1  # substitution
    assert ("bat", "cart") in got and got[("bat", "cart")] == 2  # mixed
    assert ("dig", "dog") in got
    assert not any("query" in p for p in got)  # isolated token pairs nothing


def test_symspell_max_edits_one_and_frequency_columns(spark):
    from etl_pipeline_challenge_aladia_spark.operators.terms import (
        symspell_vocab_pairs,
    )

    # 'cat' twice, 'bat' once: frequency columns must carry the counts
    docs = _docs(spark, ["cat", "bat", "cat", "carts"])
    rows = symspell_vocab_pairs(docs, max_edits=1).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in rows} == {("bat", "cat")}
    (r,) = rows
    assert (r["freq_a"], r["freq_b"], r["lev"]) == (1, 2, 1)


def test_symspell_rejects_bad_max_edits(spark):
    import pytest

    from etl_pipeline_challenge_aladia_spark.operators.terms import (
        symspell_vocab_pairs,
    )

    with pytest.raises(ValueError):
        symspell_vocab_pairs(_docs(spark, ["a"]), max_edits=3)


def test_countmin_never_underestimates_and_width1_sums_everything(spark):
    """Count-min structural properties: estimate >= exact always; with
    width=1 every token collides into one cell per row, so every
    estimate equals the total token count; with a wide sketch and a
    tiny vocab there are no collisions and estimates are exact."""
    from etl_pipeline_challenge_aladia_spark.operators.terms import (
        countmin_audit,
    )

    docs = _docs(spark, ["a"] * 5 + ["b"] * 3 + ["c"] * 2)
    wide = countmin_audit(docs, depth=4, width=4096, top_k=10).collect()
    assert {r["tok"]: r["cm_estimate"] for r in wide} == {
        "a": 5,
        "b": 3,
        "c": 2,
    }
    assert all(r["overestimate"] == 0 for r in wide)
    narrow = countmin_audit(docs, depth=4, width=1, top_k=10).collect()
    assert all(r["cm_estimate"] == 10 for r in narrow)
    assert all(r["cm_estimate"] >= r["exact_n"] for r in narrow)
    # top-k ordering: by exact count desc, then token
    assert [r["tok"] for r in narrow] == ["a", "b", "c"]


def test_distributed_cc_catalog_entry_matches_adaptive_path(spark, sf_dir):
    """doc_dedup_clusters_distributed must emit byte-identical labels
    to doc_dedup_clusters — same graph, pointer-doubling vs union-find."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    a = {
        (r["doc_id"], r["cluster_id"])
        for r in CATALOG["doc_dedup_clusters"].spark(spark, sf_dir).collect()
    }
    b = {
        (r["doc_id"], r["cluster_id"])
        for r in CATALOG["doc_dedup_clusters_distributed"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert a == b and len(a) > 0


def test_revenue_trend_sign_split_division(spark):
    """The sign-split integer division in the trend formula: Spark's
    `div` truncates toward zero, so sign * (abs(num)*1000 div den)
    must floor-toward-zero symmetrically — pinned on a planted
    positive and negative slope through exact integer points."""
    df = spark.createDataFrame(
        [(1, 10), (-7, 10), (-25, 10)], "num long, den long"
    )
    got = [
        r["q"]
        for r in df.select(
            F.expr(
                "(CASE WHEN num < 0 THEN -1 ELSE 1 END)"
                " * ((abs(num) * 1000) div den) AS q"
            )
        ).collect()
    ]
    assert got == [100, -700, -2500]


def test_prefix_filter_equals_inverted_index_exact_jaccard(spark):
    """Prefix filtering must be lossless: identical pairs to
    ngram_jaccard_pairs on a corpus with a planted near-dup pair AND a
    hub shingle shared by every doc (the hub sorts to the end of the
    global (df, shingle) order, so it never enters the prefix index,
    yet the result must not change)."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    hub = "the quick brown"  # 3-gram present in every doc
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in warm moonlight tonight"),
            (2, "the quick brown fox jumps over the lazy dog in warm moonlight today"),
            (3, "the quick brown cat naps under a warm stone ledge"),
            (4, "completely different words live in this other document"),
        ],
        "doc_id long, text string",
    )
    assert hub  # documents 1-3 share the leading shingles
    base = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    pf = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(
            docs, n=3, threshold_permille=800
        ).collect()
    }
    assert pf == base
    assert any(a == 1 and b == 2 for a, b, _ in pf)  # planted pair found


def test_prefix_filter_lossless_on_random_corpus(spark):
    """Randomized cross-check at a lower threshold (more borderline
    pairs): prefix filtering == inverted-index exact on 30 docs drawn
    from a tiny vocabulary (dense near-dup structure)."""
    import random

    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 9))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    pf = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(
            docs, n=3, threshold_permille=300
        ).collect()
    }
    assert pf == base and len(base) > 0


def test_hll_audit_sane_and_deterministic(spark):
    """HLL structural checks: the estimate is deterministic (two runs
    bit-equal), within a loose multiplicative band of exact for a
    500-key group, and lg_m is validated."""
    import pytest

    from etl_pipeline_challenge_aladia_spark.functions.sketches import (
        hll_audit,
    )

    df = spark.createDataFrame(
        [("g", i % 500) for i in range(2000)], "grp string, k long"
    )
    r1 = hll_audit(df, "grp", "k", lg_m=6).collect()
    r2 = hll_audit(df, "grp", "k", lg_m=6).collect()
    assert [row.asDict() for row in r1] == [row.asDict() for row in r2]
    (row,) = r1
    assert row["n_exact"] == 500
    # raw HLL at m=64 on n=500: expect well within [0.5x, 2x]
    assert 250 <= row["hll_estimate"] <= 1000
    assert row["err_permille"] == abs(row["hll_estimate"] - 500) * 1000 // 500
    with pytest.raises(ValueError):
        hll_audit(df, "grp", "k", lg_m=2)


def test_decayed_engagement_shift_halving(spark, sf_dir):
    """The decay is exactly cents >> (age_days div 30): pin the
    catalog query's arithmetic on planted events via the same
    expression shape."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(100, 0), (100, 29), (100, 30), (100, 65), (101, 95)],
        "cents long, age long",
    )
    got = [
        r["d"]
        for r in df.select(
            F.expr("shiftright(cents, CAST(age div 30 AS INT)) AS d")
        ).collect()
    ]
    assert got == [100, 100, 50, 25, 12]  # 101 >> 3 = 12 (floor)


def test_triangle_stats_clique_path_star(spark):
    """Planted graphs: K4 has 4 triangles and clustering 1000; a
    4-path has wedges but no triangle; a 5-star has C(4,2)=6 wedges,
    no triangle; a triangle with a pendant edge gives the textbook
    3*1*1000 div 5 = 600."""
    from etl_pipeline_challenge_aladia_spark.operators.graph import (
        triangle_stats,
    )

    def stats(edges):
        df = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
        return triangle_stats(df).collect()[0].asDict()

    k4 = stats([(a, b) for a in range(4) for b in range(a + 1, 4)])
    assert k4 == {
        "n_nodes": 4,
        "n_edges": 6,
        "n_wedges": 12,
        "n_triangles": 4,
        "clustering_permille": 1000,
    }
    path = stats([(0, 1), (1, 2), (2, 3)])
    assert path["n_triangles"] == 0 and path["n_wedges"] == 2
    assert path["clustering_permille"] == 0
    star = stats([(0, i) for i in range(1, 5)])
    assert star["n_triangles"] == 0 and star["n_wedges"] == 6
    pendant = stats([(0, 1), (1, 2), (0, 2), (2, 3)])
    assert pendant["n_triangles"] == 1 and pendant["n_wedges"] == 5
    assert pendant["clustering_permille"] == 600
    # duplicate/reversed input pairs collapse to one undirected edge
    dup = stats([(0, 1), (1, 0), (0, 1), (1, 2), (0, 2)])
    assert dup["n_edges"] == 3 and dup["n_triangles"] == 1


def test_mmr_select_lambda_trades_relevance_for_diversity(spark):
    """Planted line geometry: query at origin, a relevant pair A=(1,0),
    B=(1.05,0) and a distant C=(3,0). High lambda keeps the redundant-
    but-relevant B second; low lambda jumps to the diverse C — the
    exact integer scores are hand-checkable."""
    import pytest

    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        mmr_select,
    )

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [1.05, 0.0]),
            (3, [3.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    hi = [(r["mmr_rank"], r["vec_id"]) for r in
          mmr_select(emb, k=3, lambda_permille=700).collect()]
    assert hi == [(1, 1), (2, 2), (3, 3)]
    lo = [(r["mmr_rank"], r["vec_id"]) for r in
          mmr_select(emb, k=3, lambda_permille=300).collect()]
    assert lo == [(1, 1), (2, 3), (3, 2)]
    # rank-1 pick is the query's nearest neighbor with md_fx = 0
    r1 = mmr_select(emb, k=1, lambda_permille=700).collect()[0]
    assert (r1["vec_id"], r1["dq_fx"], r1["md_fx"]) == (1, 10**8, 0)
    with pytest.raises(ValueError):
        mmr_select(emb, k=2, lambda_permille=1500)
    with pytest.raises(ValueError):
        mmr_select(emb.filter("vec_id < 0"), k=2)
