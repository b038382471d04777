"""Planted-geometry tests for the round-7c operators: candidate-key /
functional-dependency profiling, k-core peeling, the Bloom FPR audit,
and the sliding-distinct / CUSUM time-series queries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_candidate_keys_nulls_and_composites(spark):
    """NULL rows are counted, excluded from the distinct count, and
    disqualify; a composite that is unique only jointly is a key while
    its columns alone are not."""
    from etl_pipeline_challenge_aladia_spark.operators.quality_checks import (
        candidate_keys,
    )

    df = spark.createDataFrame(
        [
            (1, 10, "x"),
            (1, 20, "y"),
            (2, 10, "z"),
            (2, 20, None),
            (None, 30, "w"),
        ],
        "a int, b int, c string",
    )
    got = {
        r["candidate"]: r
        for r in candidate_keys(df, [["a"], ["b"], ["c"], ["a", "b"]]).collect()
    }
    assert got["a"]["n_null_rows"] == 1
    assert got["a"]["n_distinct"] == 2  # {1, 2}; NULL row excluded
    assert not got["a"]["is_key"]
    assert got["b"]["n_null_rows"] == 0
    assert got["b"]["n_distinct"] == 3
    assert not got["b"]["is_key"]  # 3 < 5 rows
    assert got["c"]["n_null_rows"] == 1
    assert got["c"]["n_distinct"] == 4
    assert not got["c"]["is_key"]  # has a NULL row
    assert got["a+b"]["n_null_rows"] == 1  # the (NULL, 30) row
    assert got["a+b"]["n_distinct"] == 4  # 4 non-null rows, all distinct
    assert not got["a+b"]["is_key"]  # null row disqualifies
    nonull = df.filter(F.col("a").isNotNull())
    key = {
        r["candidate"]: r for r in candidate_keys(nonull, [["a", "b"]]).collect()
    }["a+b"]
    assert key["is_key"] and key["n_distinct"] == key["n_rows"] == 4


def test_fd_audit_violations_and_null_semantics(spark):
    """A violated FD reports which share of lhs groups carry >1 distinct
    non-null rhs; NULL rhs values are not variants."""
    from etl_pipeline_challenge_aladia_spark.operators.quality_checks import (
        fd_audit,
    )

    df = spark.createDataFrame(
        [
            ("s1", "en"),
            ("s1", "en"),
            ("s2", "en"),
            ("s2", "de"),
            ("s3", None),
            ("s3", "fr"),
        ],
        "src string, lang string",
    )
    row = fd_audit(df, {"src->lang": (["src"], "lang")}).collect()[0]
    assert row["fd_name"] == "src->lang"
    assert row["n_groups"] == 3
    # s2 violates (en, de); s3 does NOT (fr plus a non-variant NULL)
    assert row["n_violating_groups"] == 1
    assert row["max_rhs_variants"] == 2
    assert row["violation_permille"] == 333


def test_kcore_peels_tails_keeps_cycles(spark):
    """A triangle with a pendant chain: the 2-core is exactly the
    triangle (each surviving node at degree 2); the chain — the
    transitive false-merge shape — peels away over multiple rounds."""
    from etl_pipeline_challenge_aladia_spark.operators.graph import kcore_peel

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "doc_id_a long, doc_id_b long",
    )
    got = {
        r["id"]: r["core_degree"] for r in kcore_peel(pairs, k=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    # k=3: the triangle itself dies; a 4-clique survives whole
    assert kcore_peel(pairs, k=3).count() == 0
    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "doc_id_a long, doc_id_b long",
    )
    core3 = {
        r["id"]: r["core_degree"] for r in kcore_peel(clique, k=3).collect()
    }
    assert core3 == {0: 3, 1: 3, 2: 3, 3: 3}


def test_bloom_audit_undersized_filter_shows_false_positives(spark):
    """An 8-bit filter over 20 members saturates, so probing 30
    negatives must show false positives; a roomy filter shows few. The
    audit never reports more fps than negatives, and members never
    probe (they are anti-joined out)."""
    from etl_pipeline_challenge_aladia_spark.functions.sketches import (
        bloom_audit,
    )

    build = spark.createDataFrame(
        [(i,) for i in range(20)], "k long"
    )
    probe = spark.createDataFrame(
        [(i,) for i in range(50)], "k long"
    )
    tiny = bloom_audit(build, probe, "k", "k", m_bits=8, k_hashes=2).collect()[0]
    assert tiny["n_members"] == 20
    assert tiny["n_true_negatives"] == 30
    assert 0 < tiny["n_false_positives"] <= 30
    assert tiny["n_bits_set"] <= 8
    roomy = bloom_audit(
        build, probe, "k", "k", m_bits=4096, k_hashes=3
    ).collect()[0]
    assert roomy["n_false_positives"] <= tiny["n_false_positives"]
    assert roomy["fpr_permille"] <= tiny["fpr_permille"]


def test_containment_lsh_audit_catches_asymmetric_escape(spark):
    """A short doc quoted wholesale inside a much longer one: exact
    containment flags it, but its Jaccard is so diluted the minhash
    bands shouldn't collide — the audit must report the miss. Identical
    near-dup docs stay caught by both paths."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        containment_lsh_audit,
    )

    short = " ".join(f"q{i}" for i in range(12))
    long = short + " " + " ".join(f"f{i}" for i in range(300))
    twin_a = " ".join(f"t{i}" for i in range(40))
    twin_b = twin_a + " extra"
    docs = spark.createDataFrame(
        [(0, short), (1, long), (2, twin_a), (3, twin_b)],
        "doc_id long, text string",
    )
    row = containment_lsh_audit(docs).collect()[0]
    # exact: (0 in 1) and the twins both ways -> at least 3 directed pairs
    assert row["n_exact"] >= 3
    assert row["n_missed_asymmetric"] >= 1  # the quote escape
    assert row["n_both"] >= 2  # the twins survive both paths
    assert row["recall"] < 1.0


def test_sliding_7d_uniques_matches_bruteforce(spark, tmp_path):
    """The window-assignment explode equals the brute-force per-day
    7-day distinct on a planted schedule with returns and churn."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1 every day; user 2 every 3rd day; users 100+d on day d only
    for d in range(12):
        ts = base + dt.timedelta(days=d)
        rows.append((ts, 1))
        if d % 3 == 0:
            rows.append((ts, 2))
        rows.append((ts, 100 + d))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["day"]: (r["uniques_1d"], r["uniques_7d"], r["lift_permille"])
        for r in CATALOG["events_sliding_7d_unique_users"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    days = sorted({r[0].date() for r in rows})
    for day in days:
        in1 = {u for ts, u in rows if ts.date() == day}
        in7 = {
            u
            for ts, u in rows
            if day - dt.timedelta(days=6) <= ts.date() <= day
        }
        key = day.strftime("%Y-%m-%d")
        assert got[key][0] == len(in1)
        assert got[key][1] == len(in7)
        assert got[key][2] == len(in7) * 1000 // len(in1)


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """A flat-10 series that jumps to flat-30 must place the CUSUM
    argmax at the last day of the low regime, with before/after means
    straddling the shift."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    base = dt.datetime(2024, 3, 1)
    rows = []
    for d in range(20):
        n = 10 if d < 10 else 30
        for i in range(n):
            rows.append((base + dt.timedelta(days=d, seconds=i), 7))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = (
        CATALOG["events_cusum_changepoint"].spark(spark, str(tmp_path)).collect()
    )[0]
    assert row["split_day"] == "2024-03-10"  # day index 9: end of low regime
    assert row["n_days"] == 20
    assert row["cusum_sign"] == -1  # low regime pulls cumsum negative
    assert row["mean_before_x1000"] == 10_000
    assert row["mean_after_x1000"] == 30_000


def test_markov_removal_attribution_planted_journeys(spark):
    """Three journeys: A->B->conv, A->conv, C->(no conversion). Cutting
    A kills all conversion (share ~2/3 of total effect vs B's ~1/3);
    cutting C changes nothing (share 0)."""
    import datetime as dt

    from etl_pipeline_challenge_aladia_spark.operators.funnel import (
        markov_removal_attribution,
    )

    t0 = dt.datetime(2024, 1, 1)

    def row(i, u, typ):
        return (i, t0 + dt.timedelta(minutes=i), u, typ)

    ev = spark.createDataFrame(
        [
            row(1, 1, "A"), row(2, 1, "B"), row(3, 1, "purchase"),
            row(4, 2, "A"), row(5, 2, "purchase"),
            row(6, 3, "C"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        r["channel"]: r
        for r in markov_removal_attribution(ev, steps=8).collect()
    }
    assert set(got) == {"A", "B", "C"}
    full = got["A"]["p_conv_full_fx"]
    assert full == 666666  # 2/3 at 1e6 fixed point (truncated)
    assert got["A"]["p_conv_removed_fx"] == 0
    assert got["C"]["removal_effect_fx"] == 0
    assert got["C"]["attribution_permille"] == 0
    assert got["A"]["attribution_permille"] == 666
    assert got["B"]["attribution_permille"] == 333
