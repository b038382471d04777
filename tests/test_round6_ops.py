"""Round-6 operators: sub-document segment dedup, asymmetric shingle
containment, market-basket lift, and the event transition matrix —
semantic unit tests on planted inputs (oracle parity at sf0.001 is
covered by the CATALOG-driven tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_segment_dedup_removes_cross_doc_copies_keeps_canonical(spark):
    """Two docs share an identical 8-token segment; the lowest-id doc
    keeps it, the other's copy is removed, and unique segments survive
    everywhere. Token accounting is exact (non-overlapping spans)."""
    from etl_pipeline_challenge_aladia_spark.operators.text import (
        segment_dedup_stats,
    )

    shared = " ".join(f"s{i}" for i in range(8))
    rows = [
        (1, "web", shared + " " + "tail1 tail2 tail3 tail4"),
        (2, "web", shared + " " + "other1 other2 other3 other4"),
        (3, "web", " ".join(f"u{i}" for i in range(8))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = segment_dedup_stats(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    # doc1: [shared, 4-token tail]; doc2: [shared, 4-token tail]; doc3: [8]
    assert r["n_segments"] == 5
    assert r["n_removed_segments"] == 1  # doc2's copy of the shared segment
    assert r["tokens_removed"] == 8
    assert r["tokens_kept"] == 8 + 4 + 4 + 8
    assert r["removed_permille"] == 8 * 1000 // 32


def test_segment_dedup_within_doc_repeat_not_removed(spark):
    """Cross-doc dedup only: a segment repeated inside ONE document is
    not boilerplate by the df >= 2 criterion (its doc_freq is 1)."""
    from etl_pipeline_challenge_aladia_spark.operators.text import (
        segment_dedup_stats,
    )

    seg = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, "web", seg + " " + seg)], "doc_id long, source string, text string"
    )
    r = segment_dedup_stats(docs).collect()[0]
    assert r["n_segments"] == 2 and r["n_removed_segments"] == 0


def test_containment_flags_subset_doc_that_jaccard_dilutes(spark):
    """Doc 1's shingle set is a strict subset of doc 2's much larger
    set: containment(1 in 2) is 1000 permille while the Jaccard of the
    pair stays far below the near-dup threshold — the asymmetric case
    the operator exists for. The reverse direction does not qualify."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        containment_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(10))
    container = quote + " " + " ".join(f"pad{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, container)], "doc_id long, text string"
    )
    rows = containment_pairs(docs, threshold_permille=800).collect()
    assert [(r["contained_id"], r["container_id"]) for r in rows] == [(1, 2)]
    r = rows[0]
    assert r["containment_permille"] == 1000  # all 8 shingles of doc1 shared
    assert r["jaccard_permille"] < 800  # Jaccard alone would miss this pair
    assert r["n_shared"] == r["n_contained"] == 8


def test_df_cap_kills_hub_shingle_candidate_blowup(spark):
    """One boilerplate shingle shared by 50 docs makes the posting-list
    self-join enumerate all 50*49/2 = 1225 candidate pairs; df_cap drops
    the hub shingle BEFORE the join so those candidates never exist,
    while a true high-containment pair (whose shared shingles are
    non-hub, df = 2) survives at full strength."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    boiler = "common boiler plate"
    rows = [
        (i, f"{boiler} u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(50)
    ]
    quote = " ".join(f"s{j}" for j in range(10))
    rows.append((100, quote))
    rows.append((101, quote + " " + " ".join(f"pad{j}" for j in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # Uncapped, threshold 0: the hub shingle alone forces >= 1225
    # candidate pairs (x2 directed rows) among the boiler docs.
    uncapped = containment_pairs(docs, threshold_permille=0).collect()
    assert len(uncapped) >= 2 * 1225

    # Capped: the entire boiler candidate set vanishes at the index —
    # even at threshold 0 only the true pair remains.
    capped = containment_pairs(docs, threshold_permille=0, df_cap=10)
    got = {
        (r["contained_id"], r["container_id"]): r["containment_permille"]
        for r in capped.collect()
    }
    assert set(got) == {(100, 101), (101, 100)}
    assert got[(100, 101)] == 1000  # true pair at full strength

    # Same mitigation on the Jaccard twin: candidates collapse to the
    # true pair's posting lists only.
    j_capped = ngram_jaccard_pairs(docs, threshold=0.0, df_cap=10).collect()
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in j_capped} == {(100, 101)}


def test_basket_brand_lift_independence_and_affinity(spark, sf_dir):
    """Lift sanity on real data: every returned pair has n_co >= 3,
    lift_permille matches the integer formula recomputed from first
    principles, and pairs are canonically ordered (brand_a < brand_b)."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    from etl_pipeline_challenge_aladia_spark.sources.files import load_table

    out = CATALOG["basket_brand_lift"].spark(spark, sf_dir).collect()
    assert out, "no brand pairs at this sf"
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().count()
    counts = {r["p_brand"]: r["n"] for r in ob.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for r in out:
        assert r["brand_a"] < r["brand_b"] and r["n_co"] >= 3
        expect = (
            r["n_co"] * n_orders * 1000
            // (counts[r["brand_a"]] * counts[r["brand_b"]])
        )
        assert r["lift_permille"] == expect


def test_markov_transitions_rows_sum_to_1000ish_and_count_exactly(spark):
    """Planted timeline: transition counts are exact and each from-type's
    permille shares sum to <= 1000 (integer div truncates, never
    exceeds) with every share = n*1000 div row_total."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: view -> click -> view -> purchase ; user 2: view -> view
    seq = {1: ["view", "click", "view", "purchase"], 2: ["view", "view"]}
    eid = 0
    for u, types in seq.items():
        for i, t in enumerate(types):
            rows.append((eid, base + dt.timedelta(minutes=i), u, t, 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(d + "/events.parquet")
        got = {
            (r["from_type"], r["to_type"]): (r["n_trans"], r["share_permille"])
            for r in CATALOG["events_markov_transitions"].spark(spark, d).collect()
        }
    assert got[("view", "click")] == (1, 333)
    assert got[("view", "view")] == (1, 333)
    assert got[("view", "purchase")] == (1, 333)
    assert got[("click", "view")] == (1, 1000)
    assert len(got) == 4


def test_kcenter_select_picks_extremes_and_reports_radius(spark):
    """Planted geometry: seed = lowest id, next pick = farthest point,
    witness row carries the exact fixed-point coverage radius."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        kcenter_select,
    )

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_select(emb, k=2, dim=2).orderBy("center_rank").collect()
    assert [(r["center_rank"], r["vec_id"]) for r in rows] == [
        (1, 1),
        (2, 2),
        (3, 3),
    ]
    assert rows[0]["dist_fx"] == 0
    assert rows[1]["dist_fx"] == 10**10  # (10-0)^2 * 1e8
    assert rows[2]["dist_fx"] == 10**8  # radius: point 3 at distance 1.0


def test_kcenter_select_empty_input_raises(spark):
    """An empty embeddings frame is a caller error, not an IndexError."""
    import pytest as _pytest

    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        kcenter_select,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty"):
        kcenter_select(emb, k=2, dim=2)


def test_kcenter_select_fewer_points_than_k_duplicates_min_id(spark):
    """Documented duplicate-center semantics: with n < k+1 distinct
    vectors, once every point has running-min distance 0 the min-id
    point is re-selected with dist_fx = 0 (the oracle mirrors this)."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        kcenter_select,
    )

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_select(emb, k=3, dim=2).orderBy("center_rank").collect()
    assert [(r["center_rank"], r["vec_id"], r["dist_fx"]) for r in rows] == [
        (1, 1, 0),
        (2, 2, 25 * 10**8),  # (3^2+4^2) * 1e8
        (3, 1, 0),  # exhausted: min-id re-selected at distance 0
        (4, 1, 0),  # witness is the same degenerate point
    ]
