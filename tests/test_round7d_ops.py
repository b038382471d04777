"""Planted-geometry tests for the round-7d queries: cohort revenue,
Pareto/record frontier, MAD outlier days, type-drift chi-square,
distinctive-terms chi-square, and the deterministic weighted sampler.

Each test writes a tiny synthetic table dir and runs the CATALOG
callable end-to-end, asserting hand-computed outcomes (the oracle
parity test covers cross-engine agreement; these pin the semantics)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F  # noqa: F401

from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG


def _write(spark, tmp_path, name, df):
    path = str(tmp_path / f"{name}.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_cohort_revenue_offsets_and_sums(spark, tmp_path):
    """A customer first ordering in Jan contributes offsets 0/1/3 to the
    Jan cohort; a Feb-first customer starts its own cohort at offset 0."""
    t = lambda y, m: dt.datetime(y, m, 15)  # noqa: E731
    rows = [
        (1, 100, "F", 10.0, t(1995, 1), "1-URGENT"),
        (2, 100, "F", 20.0, t(1995, 2), "1-URGENT"),
        (3, 100, "F", 30.0, t(1995, 4), "1-URGENT"),
        (4, 200, "F", 40.0, t(1995, 2), "1-URGENT"),
        (5, 300, "F", 5.0, t(1995, 1), "1-URGENT"),
    ]
    sf = _write(spark, tmp_path, "orders", _orders(spark, rows))
    got = {
        (r["cohort_month"], r["month_offset"]): r
        for r in CATALOG["orders_cohort_revenue"].spark(spark, sf).collect()
    }
    assert got[("1995-01", 0)]["revenue"] == 15.0  # custs 100+300
    assert got[("1995-01", 0)]["n_customers"] == 2
    assert got[("1995-01", 1)]["revenue"] == 20.0
    assert got[("1995-01", 3)]["revenue"] == 30.0
    assert got[("1995-02", 0)]["revenue"] == 40.0
    assert got[("1995-02", 0)]["n_customers"] == 1
    assert len(got) == 4


def test_pareto_frontier_cross_month_and_ties(spark, tmp_path):
    """Records must be strict (> not >=), survive month boundaries (the
    two-phase prefix-max must see prior-month maxima), and ignore
    later same-price orders."""
    t = lambda y, m, d: dt.datetime(y, m, d)  # noqa: E731
    rows = [
        (1, 1, "F", 100.0, t(1995, 1, 1), "x"),
        (2, 1, "F", 50.0, t(1995, 1, 2), "x"),   # below running max
        (3, 1, "F", 100.0, t(1995, 2, 1), "x"),  # tie: not a record
        (4, 1, "F", 150.0, t(1995, 2, 2), "x"),  # record (beats month-1 max)
        (5, 1, "F", 120.0, t(1995, 3, 1), "x"),  # below cross-month max 150
        (6, 1, "F", 151.0, t(1995, 3, 2), "x"),  # record
    ]
    sf = _write(spark, tmp_path, "orders", _orders(spark, rows))
    got = sorted(
        r["o_orderkey"]
        for r in CATALOG["orders_pareto_frontier"].spark(spark, sf).collect()
    )
    assert got == [1, 4, 6]


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_mad_outlier_days_ranks_the_planted_spike(spark, tmp_path):
    """Seven quiet days and one 100x day: the spike must rank first with
    a large robust z; quiet days score ~0."""
    rows = []
    eid = 0
    for day, total in enumerate([10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0], 1):
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 1, day, 12), 1, "view", total, "{}")
        )
    eid += 1
    rows.append((eid, dt.datetime(2024, 1, 8, 12), 1, "view", 1000.0, "{}"))
    # day totals 10..16 + 1000; median 13.5, deviations sorted
    # [0.5,0.5,1.5,1.5,2.5,2.5,3.5,986.5] -> MAD = 2.0
    sf = _write(spark, tmp_path, "events", _events(spark, rows))
    got = CATALOG["events_mad_outlier_days"].spark(spark, sf).collect()
    assert got[0]["day"] == "2024-01-08"
    assert got[0]["daily_total"] == 1000.0
    assert got[0]["robust_z"] == round(986.5 / 2.0, 2)
    assert all(r["robust_z"] < 2 for r in got[1:])


def test_mad_zero_guard_scores_zero(spark, tmp_path):
    """With >50% of days identical the MAD is 0; the guard must emit 0
    rather than dividing by zero — even for the deviating day."""
    rows = [
        (i, dt.datetime(2024, 1, d, 12), 1, "view", v, "{}")
        for i, (d, v) in enumerate(
            [(1, 10.0), (2, 10.0), (3, 10.0), (4, 10.0), (5, 99.0)]
        )
    ]
    sf = _write(spark, tmp_path, "events", _events(spark, rows))
    got = CATALOG["events_mad_outlier_days"].spark(spark, sf).collect()
    assert all(r["robust_z"] == 0.0 for r in got)


def test_type_drift_chisq_matches_hand_formula(spark, tmp_path):
    """Planted 2x2 drift (type a: 8 early / 2 late; type b: 2 early / 8
    late): per-type contribution must equal D^2/((o1+o2)*c1*c2) and the
    split day must be the min/max midpoint."""
    rows = []
    eid = 0
    # days 1..10; split = day 1 + (9 // 2) = day 5 -> early = days 1..5
    for day in range(1, 11):
        ety = "a" if day <= 5 else "b"
        for _ in range(2):  # minor uniform noise absent; keep exact
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day, 12), 1, ety, 1.0, "{}")
            )
    sf = _write(spark, tmp_path, "events", _events(spark, rows))
    got = {
        r["event_type"]: r
        for r in CATALOG["events_type_drift_chisq"].spark(spark, sf).collect()
    }
    # type a: o1=10, o2=0; type b: o1=0, o2=10; c1=c2=10
    assert got["a"]["n_first"] == 10 and got["a"]["n_second"] == 0
    assert got["b"]["n_first"] == 0 and got["b"]["n_second"] == 10
    assert got["a"]["share_first_permille"] == 1000
    assert got["a"]["share_second_permille"] == 0
    # D = 10*10 - 0*10 = 100; contrib = 100^2 / (10*10*10) = 10.0
    assert got["a"]["chisq_contrib"] == 10.0
    assert got["b"]["chisq_contrib"] == 10.0


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_distinctive_terms_surfaces_planted_jargon(spark, tmp_path):
    """A token unique to one source must top that source's list; a token
    present in every document of every source guards to chi=0 when it
    would make a degenerate margin, else scores ~0 relative to jargon."""
    rows = [
        (1, "common common jargonA jargonA jargonA", "en", "A", 30),
        (2, "common common jargonA", "en", "A", 20),
        (3, "common common other", "en", "B", 20),
        (4, "common common other other", "en", "B", 25),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = CATALOG["doc_distinctive_terms_chisq"].spark(spark, sf).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    top_a = max(by_src["A"], key=lambda r: r["chisq"])
    assert top_a["token"] == "jargonA" and top_a["n_in_source"] == 4
    top_b = max(by_src["B"], key=lambda r: r["chisq"])
    assert top_b["token"] == "other"
    assert all(len(v) <= 3 for v in by_src.values())


def _fold32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_weighted_sample_exact_priorities_and_zero_guard(spark, tmp_path):
    """Priorities must equal hash*1e6 div n_chars computed in Python
    (engine-exactness), n_chars=0 rows survive via the greatest(,1)
    guard, and the k smallest priorities win."""
    rows = [(i, "t", "en", "s", n) for i, n in enumerate([10, 1000, 0, 500])]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["doc_id"]: r["priority"]
        for r in CATALOG["doc_weighted_sample"].spark(spark, sf).collect()
    }
    for doc_id, n in [(0, 10), (1, 1000), (2, 0), (3, 500)]:
        want = _fold32(str(doc_id)) * 1000000 // max(n, 1)
        assert got[doc_id] == want
