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


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_mutual_knn_matches_bruteforce_and_cuts_hub_asymmetry(spark, tmp_path):
    """A satellite whose top-5 is a tight cluster, unreciprocated (the
    cluster's members prefer each other), must appear in NO pair; the
    full result must equal a brute-force Python replica of the
    round->threshold->rank->mutual semantics."""
    import numpy as np

    rng = [
        [1.0, 0.0, 0.0] , [0.999, 0.01, 0.0], [0.998, 0.02, 0.0],
        [0.997, 0.03, 0.0], [0.996, 0.04, 0.0], [0.995, 0.05, 0.0],
        [0.994, 0.06, 0.0],
        [0.5, 0.5, 0.70710678],  # satellite: cos ~0.5 to the cluster
        [0.0, 0.0, -1.0],        # below threshold to everything
    ]
    sf = _write(spark, tmp_path, "embeddings", _emb(spark, rng))
    got = {
        (r["vec_id_a"], r["vec_id_b"]): (r["rank_ab"], r["rank_ba"])
        for r in CATALOG["emb_mutual_knn_pairs"].spark(spark, sf).collect()
    }
    # Brute-force replica (float32 parquet round-trip, then exact recipe)
    m = np.array(rng, dtype=np.float32).astype(np.float64)
    norm = np.linalg.norm(m, axis=1)
    sim = (m @ m.T) / np.outer(norm, norm)
    sim = np.floor(sim * 1e4 + 0.5) / 1e4
    n = len(rng)
    cand = {
        i: sorted(
            (j for j in range(n) if j != i and sim[i, j] >= 0.30),
            key=lambda j: (-sim[i, j], j),
        )[:5]
        for i in range(n)
    }
    want = {
        (i, j): (cand[i].index(j) + 1, cand[j].index(i) + 1)
        for i in range(n)
        for j in range(i + 1, n)
        if j in cand[i] and i in cand[j]
    }
    assert got == want
    assert not any(7 in p or 8 in p for p in got)  # satellite + orthogonal


def test_theil_sen_is_robust_to_one_outlier_month(spark, tmp_path):
    """Monthly revenue 100,200,300,400 + one 9900 outlier month: the
    median pairwise slope must equal the hand-computed Theil-Sen value
    (100/mo), unmoved by the outlier that would wreck OLS."""
    t = lambda m: dt.datetime(1995, m, 10)  # noqa: E731
    revs = {1: 100.0, 2: 200.0, 3: 300.0, 4: 9900.0, 5: 500.0}
    rows = [
        (m, m, "F", v, t(m), "x") for m, v in revs.items()
    ]
    sf = _write(spark, tmp_path, "orders", _orders(spark, rows))
    got = CATALOG["orders_theil_sen_monthly_trend"].spark(spark, sf).collect()[0]
    assert got["n_months"] == 5 and got["n_pairs"] == 10
    slopes = sorted(
        (revs[b] - revs[a]) / (b - a)
        for a in revs
        for b in revs
        if b > a
    )
    med = (slopes[4] + slopes[5]) / 2
    assert got["slope_per_month"] == round(med, 2)


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )


def _part(spark, rows):
    return spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )


def test_discount_quantity_corr_signs_and_degenerate(spark, tmp_path):
    """Perfectly aligned discount/quantity gives +1, perfectly opposed
    gives -1, and a constant-discount brand guards to 0."""
    li, pk = [], 0
    ship = dt.datetime(1995, 1, 1)
    parts = [(1, "p", "POS", "t", 1, 1.0), (2, "p", "NEG", "t", 1, 1.0),
             (3, "p", "FLAT", "t", 1, 1.0)]
    for q, d in [(1.0, 0.01), (2.0, 0.02), (3.0, 0.03)]:
        pk += 1
        li.append((pk, 1, 1, 1, q, 1.0, d, 0.0, "N", "O", ship))
    for q, d in [(1.0, 0.03), (2.0, 0.02), (3.0, 0.01)]:
        pk += 1
        li.append((pk, 2, 1, 1, q, 1.0, d, 0.0, "N", "O", ship))
    for q in [1.0, 2.0, 3.0]:
        pk += 1
        li.append((pk, 3, 1, 1, q, 1.0, 0.02, 0.0, "N", "O", ship))
    _write(spark, tmp_path, "lineitem", _lineitem(spark, li))
    sf = _write(spark, tmp_path, "part", _part(spark, parts))
    got = {
        r["p_brand"]: r["corr_r2_signed"]
        for r in CATALOG["lineitem_discount_quantity_corr"]
        .spark(spark, sf)
        .collect()
    }
    assert got == {"POS": 1.0, "NEG": -1.0, "FLAT": 0.0}


def test_fano_zero_days_count_via_sparse_moments(spark, tmp_path):
    """A steady 2/day user over the 10-day span scores fano ~= 0.56
    (pop. variance with zero days implied); a single-day 20-event burst
    scores 18.0 — the zero days must enter through the span, not rows."""
    rows = []
    eid = 0
    for day in range(1, 11):
        for _ in range(2):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day, 12), 1, "view", 1.0, "{}")
            )
    for _ in range(20):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 5, 12), 2, "view", 1.0, "{}"))
    sf = _write(spark, tmp_path, "events", _events(spark, rows))
    got = {
        r["user_id"]: r
        for r in CATALOG["events_user_fano_overdispersion"]
        .spark(spark, sf)
        .collect()
    }
    # user 1: D=10, S1=20, S2=40 -> (400-400)/200 = 0.0
    assert got[1]["fano"] == 0.0 and got[1]["active_days"] == 10
    # user 2: D=10, S1=20, S2=400 -> (4000-400)/200 = 18.0
    assert got[2]["fano"] == 18.0 and got[2]["active_days"] == 1


def test_decile_migration_boundaries_from_1995_only(spark, tmp_path):
    """Boundaries come from the 1995 spend distribution; a 1996-only
    whale must land in decile 10 of the 1995 scale, and only customers
    active in BOTH years appear."""
    rows = []
    ok = 0
    # 1995: customers 1..10 spend 100..1000 (one order each)
    for c in range(1, 11):
        ok += 1
        rows.append((ok, c, "F", 100.0 * c, dt.datetime(1995, 6, 1), "x"))
    # 1996: customer 1 spends like 1995's top (decile 10), customer 2
    # spends like 1995's bottom (decile 1); customer 99 is 1996-only
    rows.append((ok + 1, 1, "F", 5000.0, dt.datetime(1996, 6, 1), "x"))
    rows.append((ok + 2, 2, "F", 100.0, dt.datetime(1996, 6, 1), "x"))
    rows.append((ok + 3, 99, "F", 9999.0, dt.datetime(1996, 6, 1), "x"))
    sf = _write(spark, tmp_path, "orders", _orders(spark, rows))
    got = {
        (r["decile_1995"], r["decile_1996"]): r["n_customers"]
        for r in CATALOG["orders_value_decile_migration"]
        .spark(spark, sf)
        .collect()
    }
    # customer 1: 1995 spend 100 -> decile 1; 1996 spend 5000 -> decile 10
    # customer 2: 1995 spend 200 -> decile 2; 1996 spend 100 -> decile 1
    assert got == {(1, 10): 1, (2, 1): 1}


def test_stickiness_bounds_and_week_indexing(spark, tmp_path):
    """A user active every day of week 0 drives stickiness toward 1000;
    a week with one single-day user scores 1000//7 = 142."""
    rows = []
    eid = 0
    for day in range(1, 8):  # week 0: user 1 every day
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, day, 9), 1, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, dt.datetime(2024, 1, 10, 9), 2, "view", 1.0, "{}"))
    sf = _write(spark, tmp_path, "events", _events(spark, rows))
    got = {
        r["week_index"]: r
        for r in CATALOG["events_stickiness_dau_wau"].spark(spark, sf).collect()
    }
    assert got[0]["wau"] == 1 and got[0]["sum_dau"] == 7
    assert got[0]["stickiness_permille"] == 1000
    assert got[1]["wau"] == 1 and got[1]["sum_dau"] == 1
    assert got[1]["stickiness_permille"] == 142


def test_hhi_monopoly_and_even_split(spark, tmp_path):
    """A single-supplier type scores 10000; a perfect 4-way split
    scores 2500."""
    ship = dt.datetime(1995, 1, 1)
    parts = [(1, "p", "B", "MONO", 1, 1.0), (2, "p", "B", "SPLIT", 1, 1.0)]
    li = [(1, 1, 7, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", ship)]
    for s in range(1, 5):
        li.append((10 + s, 2, s, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", ship))
    _write(spark, tmp_path, "lineitem", _lineitem(spark, li))
    sf = _write(spark, tmp_path, "part", _part(spark, parts))
    got = {
        r["p_type"]: r
        for r in CATALOG["supplier_hhi_by_part_type"].spark(spark, sf).collect()
    }
    assert got["MONO"]["hhi"] == 10000 and got["MONO"]["n_suppliers"] == 1
    assert got["SPLIT"]["hhi"] == 2500 and got["SPLIT"]["n_suppliers"] == 4


def test_seasonal_index_flags_the_hot_month(spark, tmp_path):
    """Two years where June doubles every other month: June's index must
    be > 1000 and equal the hand formula sum_m*N*1000 // (n_m*S)."""
    rows = []
    ok = 0
    cents_total = 0
    june_cents = 0
    for yr in (1995, 1996):
        for mo in (5, 6, 7):
            amt = 200.0 if mo == 6 else 100.0
            ok += 1
            rows.append((ok, ok, "F", amt, dt.datetime(yr, mo, 10), "x"))
            cents_total += int(amt * 100)
            if mo == 6:
                june_cents += int(amt * 100)
    sf = _write(spark, tmp_path, "orders", _orders(spark, rows))
    got = {
        r["month"]: r
        for r in CATALOG["orders_seasonal_index"].spark(spark, sf).collect()
    }
    want = june_cents * 6 * 1000 // (2 * cents_total)
    assert got[6]["seasonal_index_permille"] == want == 1500
    assert got[5]["seasonal_index_permille"] == 750


def test_hapax_counts_corpus_level_not_source_level(spark, tmp_path):
    """A token appearing once in EACH of two sources is not a hapax
    (corpus count 2); a true hapax counts toward its source only."""
    rows = [
        (1, "shared unique1 common common", "en", "A", 25),
        (2, "shared unique2 common", "en", "B", 20),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["source"]: r
        for r in CATALOG["doc_hapax_ratio_by_source"].spark(spark, sf).collect()
    }
    # 'shared' appears once per source -> corpus count 2 -> NOT hapax
    assert got["A"]["n_tokens"] == 4 and got["A"]["n_hapax"] == 1
    assert got["B"]["n_tokens"] == 3 and got["B"]["n_hapax"] == 1
    assert got["A"]["hapax_permille"] == 250
    assert got["B"]["hapax_permille"] == 333


def _cdc_chunks(tokens):
    """Python replica of the CDC boundary rule (4-gram md5 fold % 8)."""
    chunks, cur = [], []
    for i, t in enumerate(tokens):
        cur.append(t)
        if i >= 3:
            gram = " ".join(tokens[i - 3 : i + 1])
            if _fold32(gram) % 8 == 0:
                chunks.append(" ".join(cur))
                cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_cdc_chunks_survive_an_early_insertion(spark, tmp_path):
    """A token inserted near the head of doc B must not re-frame the
    shared tail: CDC must still report shared chunks (the fixed-width
    segmenter would misalign every later segment), and the result must
    equal the Python replica of the boundary rule."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten").split()
    doc_a = base
    doc_b = ["INSERTED"] + base
    rows = [
        (1, " ".join(doc_a), "en", "A", 1),
        (2, " ".join(doc_b), "en", "B", 1),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["chunk_hash"]: (r["n_docs"], r["n_occurrences"])
        for r in CATALOG["doc_cdc_chunk_dedup"].spark(spark, sf).collect()
    }
    ca, cb = _cdc_chunks(doc_a), _cdc_chunks(doc_b)
    shared = set(ca) & set(cb)
    assert shared, "fixture must produce at least one shared chunk"
    want = {
        _fold32(ch): (2, ca.count(ch) + cb.count(ch)) for ch in shared
    }
    assert got == dict(sorted(want.items())[:20] if len(want) > 20 else want)


def test_term_burstiness_concentration_vs_uniform(spark, tmp_path):
    """'burst' (counts 7/1/1 across the 3 docs) must score far above
    'flat' (1/doc, fano = 0 exactly); df<3 tokens are filtered out."""
    rows = [
        (1, "flat burst " + " ".join(["burst"] * 6), "en", "A", 1),
        (2, "flat burst filler", "en", "A", 1),
        (3, "flat burst filler", "en", "A", 1),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["token"]: r
        for r in CATALOG["doc_term_burstiness"].spark(spark, sf).collect()
    }
    # flat: D=3, S1=3, S2=3 -> (9-9)/9 = 0.0
    assert got["flat"]["burstiness"] == 0.0
    # burst: D=3, S1=9, S2=51 -> (153-81)/27 = 2.6667
    assert got["burst"]["burstiness"] == 2.6667
    assert got["burst"]["df"] == 3 and got["burst"]["n_occurrences"] == 9
    assert "filler" not in got  # df=2 < 3 filtered


def test_vocab_coverage_exact_shares_and_tie_cut(spark, tmp_path):
    """With 12 types, two tied at the k=10 boundary: the prefix must cut
    by (count DESC, token) so both engines pick the same 10; coverage
    is an exact permille of all occurrences."""
    toks = []
    for i, n in enumerate([40, 30, 20, 10, 8, 6, 5, 4, 3, 2, 2, 1]):
        # tokens t02..t11 with a tie (2,2) at ranks 10/11: t09 < t10
        toks += [f"t{i:02d}"] * n
    rows = [(1, " ".join(toks), "en", "A", 1)]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["k"]: r
        for r in CATALOG["doc_vocab_coverage_curve"].spark(spark, sf).collect()
    }
    total = sum([40, 30, 20, 10, 8, 6, 5, 4, 3, 2, 2, 1])
    top10 = sum([40, 30, 20, 10, 8, 6, 5, 4, 3, 2])  # tie: t09 in, t10 out
    assert got[10]["n_tokens_used"] == 10
    assert got[10]["coverage_permille"] == top10 * 1000 // total
    assert got[100]["n_tokens_used"] == 12
    assert got[100]["coverage_permille"] == 1000
    assert got[10]["vocab_size"] == 12


def test_dup_cluster_histogram_buckets_and_redundancy(spark, tmp_path):
    """1 unique text, one pair, one 4-cluster, one 7-cluster: buckets,
    doc counts, and keep-one redundancy must match exactly."""
    rows, did = [], 0
    for text, n in [("solo", 1), ("pair", 2), ("quad", 4), ("many", 7)]:
        for _ in range(n):
            did += 1
            rows.append((did, text, "en", "A", len(text)))
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["bucket"]: r
        for r in CATALOG["doc_dup_cluster_size_histogram"]
        .spark(spark, sf)
        .collect()
    }
    assert got["1 unique"]["n_clusters"] == 1
    assert got["1 unique"]["n_redundant_docs"] == 0
    assert got["2"]["n_docs"] == 2 and got["2"]["n_redundant_docs"] == 1
    assert got["3-5"]["n_docs"] == 4 and got["3-5"]["n_redundant_docs"] == 3
    assert got["6+"]["n_docs"] == 7 and got["6+"]["n_redundant_docs"] == 6


def test_reorder_gap_median_and_p90(spark, tmp_path):
    """Customer with orders on days 0,10,20,30 -> gaps 10,10,10; another
    with 0,40 -> gap 40. Segment medians/p90s follow quantile_cont."""
    rows = [
        (1, 1, "F", 1.0, dt.datetime(1995, 1, 1), "x"),
        (2, 1, "F", 1.0, dt.datetime(1995, 1, 11), "x"),
        (3, 1, "F", 1.0, dt.datetime(1995, 1, 21), "x"),
        (4, 1, "F", 1.0, dt.datetime(1995, 1, 31), "x"),
        (5, 2, "F", 1.0, dt.datetime(1995, 1, 1), "x"),
        (6, 2, "F", 1.0, dt.datetime(1995, 2, 10), "x"),
    ]
    cust = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "SEG"), (2, "c2", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    _write(spark, tmp_path, "orders", _orders(spark, rows))
    sf = _write(spark, tmp_path, "customer", cust)
    got = CATALOG["orders_reorder_gap_profile"].spark(spark, sf).collect()
    assert len(got) == 1 and got[0]["n_gaps"] == 4
    # gaps sorted: [10,10,10,40]; median=10, p90 = 10+0.7*(40-10)=31.0
    assert got[0]["median_gap_days"] == 10.0
    assert got[0]["p90_gap_days"] == 31.0


def test_transition_gini_rail_vs_scatter(spark, tmp_path):
    """view->click always (gini 0); click scatters 50/50 to two types
    (gini 500)."""
    rows = []
    eid = 0
    for u in range(1, 5):
        seq = ["view", "click", "purchase" if u % 2 else "error"]
        for i, ety in enumerate(seq):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1, 8 + i), u, ety, 1.0, "{}")
            )
    sf = _write(spark, tmp_path, "events", _events(spark, rows))
    got = {
        r["event_type"]: r
        for r in CATALOG["events_transition_gini"].spark(spark, sf).collect()
    }
    assert got["view"]["gini_permille"] == 0
    assert got["view"]["n_distinct_next"] == 1
    assert got["click"]["gini_permille"] == 500
    assert got["click"]["n_distinct_next"] == 2


def test_growth_accounting_identities(spark, tmp_path):
    """Planted lifecycle: u1 active wks 0,1,3; u2 active wk 0 only;
    u3 joins wk 1. Classes and churn timing must match, and the
    invariants active(w) = new+retained+resurrected and
    churned(w) = active(w-1) - retained(w) must hold."""
    def ev(eid, day, uid):
        return (eid, dt.datetime(2024, 1, day, 9), uid, "view", 1.0, "{}")

    rows = [
        ev(1, 1, 1), ev(2, 8, 1), ev(3, 22, 1),   # u1: wks 0,1,3
        ev(4, 2, 2),                               # u2: wk 0 only
        ev(5, 9, 3), ev(6, 16, 3), ev(7, 23, 3),   # u3: wks 1,2,3
    ]
    sf = _write(spark, tmp_path, "events", _events(spark, rows))
    got = {
        r["week_index"]: r
        for r in CATALOG["events_growth_accounting"].spark(spark, sf).collect()
    }
    assert got[0]["n_new"] == 2  # u1, u2
    assert got[1]["n_new"] == 1 and got[1]["n_retained"] == 1  # u3 new, u1 ret
    assert got[1]["n_churned"] == 1  # u2 churned at wk1
    assert got[2]["n_churned"] == 1  # u1 gap: churned at wk2
    assert got[2]["n_retained"] == 1  # u3
    assert got[3]["n_resurrected"] == 1  # u1 back
    assert got[3]["n_retained"] == 1  # u3
    # no churn emitted past the corpus max week
    assert 4 not in got
    active = {0: 2, 1: 2, 2: 1, 3: 2}
    for w, n in active.items():
        r = got[w]
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == n
    for w in (1, 2, 3):
        assert got[w]["n_churned"] == active[w - 1] - got[w]["n_retained"]


def test_dedup_source_shift_penalizes_the_mirror(spark, tmp_path):
    """Source M mirrors source O's docs (always with higher doc_id):
    after keep-min-id dedup M keeps nothing, O keeps everything, and
    the permille shares move accordingly."""
    rows = [
        (1, "alpha text", "en", "O", 10),
        (2, "beta text", "en", "O", 9),
        (3, "alpha text", "en", "M", 10),   # mirror of doc 1
        (4, "beta text", "en", "M", 9),     # mirror of doc 2
        (5, "original m", "en", "M", 10),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["source"]: r
        for r in CATALOG["doc_dedup_source_shift"].spark(spark, sf).collect()
    }
    assert got["O"]["n_before"] == 2 and got["O"]["n_after"] == 2
    assert got["M"]["n_before"] == 3 and got["M"]["n_after"] == 1
    assert got["O"]["share_before_permille"] == 400
    assert got["O"]["share_after_permille"] == 666
    assert got["M"]["shift_permille"] == 333 - 600


def test_cosine_histogram_buckets_and_clamp(spark, tmp_path):
    """Identical vectors (cos 1.0) must clamp into bucket 9; orthogonal
    pairs land in bucket 0; opposite pairs in bucket -10; shares are
    exact permille of all pairs."""
    vecs = [
        [1.0, 0.0], [1.0, 0.0],   # cos 1.0 -> bucket 9 (clamped)
        [0.0, 1.0],               # orthogonal to 0,1 -> bucket 0
        [-1.0, 0.0],              # cos -1 vs 0,1 -> bucket -10
    ]
    sf = _write(spark, tmp_path, "embeddings", _emb(spark, vecs))
    got = {
        r["bucket"]: r
        for r in CATALOG["emb_cosine_histogram"].spark(spark, sf).collect()
    }
    # pairs: (0,1)=1.0->9, (0,2)=0->0, (1,2)=0->0, (0,3)=-1->-10,
    # (1,3)=-1->-10, (2,3)=0->0
    assert got[9]["n_pairs"] == 1
    assert got[0]["n_pairs"] == 3
    assert got[-10]["n_pairs"] == 2
    assert got[0]["share_permille"] == 500
    assert sum(r["n_pairs"] for r in got.values()) == 6


def test_vocab_growth_first_appearance_buckets(spark, tmp_path):
    """Tokens are credited to their FIRST doc_id-range bucket: a token
    in buckets 0 and 9 counts as new only in 0; cumulative types are a
    running sum; n_tokens counts occurrences per bucket."""
    rows = [
        (0, "alpha beta", "en", "A", 10),    # bucket 0
        (5, "alpha gamma", "en", "A", 10),   # bucket 5
        (9, "alpha delta beta", "en", "A", 15),  # bucket 9
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["bucket"]: r
        for r in CATALOG["doc_vocab_growth_curve"].spark(spark, sf).collect()
    }
    assert got[0]["n_new_types"] == 2  # alpha, beta
    assert got[5]["n_new_types"] == 1  # gamma
    assert got[9]["n_new_types"] == 1  # delta
    assert got[9]["cumulative_types"] == 4
    assert got[9]["n_tokens"] == 3
    assert got[0]["cumulative_types"] == 2


def test_order_size_histogram_includes_zero_item_orders(spark, tmp_path):
    """An order with no line items must appear in the n_items=0 bucket
    (the survivor-bias hole a lineitem-only rollup has)."""
    ship = dt.datetime(1995, 1, 1)
    orders = [
        (1, 1, "F", 1.0, ship, "x"),
        (2, 1, "F", 1.0, ship, "x"),
        (3, 1, "F", 1.0, ship, "x"),  # zero items
    ]
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),
    ]
    _write(spark, tmp_path, "orders", _orders(spark, orders))
    sf = _write(spark, tmp_path, "lineitem", _lineitem(spark, li))
    got = {
        r["n_items"]: r
        for r in CATALOG["orders_lineitem_count_histogram"]
        .spark(spark, sf)
        .collect()
    }
    assert got[0]["n_orders"] == 1 and got[0]["share_permille"] == 333
    assert got[1]["n_orders"] == 1
    assert got[2]["n_orders"] == 1


def test_contingency_independence_and_lift(spark, tmp_path):
    """A perfectly independent 2x2 (margins 2/2, each cell 1) must show
    lift 1000 and chi-square contribution 0 in every cell; a planted
    association shows lift > 1000 on the diagonal."""
    ship = dt.datetime(1995, 1, 1)
    rows = [
        (1, 1, "A", 1.0, ship, "P1"),
        (2, 1, "A", 1.0, ship, "P2"),
        (3, 1, "B", 1.0, ship, "P1"),
        (4, 1, "B", 1.0, ship, "P2"),
    ]
    sf = _write(spark, tmp_path, "orders", _orders(spark, rows))
    got = CATALOG["dq_status_priority_contingency"].spark(spark, sf).collect()
    assert len(got) == 4
    for r in got:
        assert r["lift_permille"] == 1000
        assert r["chisq_contrib"] == 0.0
        assert r["expected_millis"] == 1000  # 2*2*1000//4
    rows2 = [
        (1, 1, "A", 1.0, ship, "P1"),
        (2, 1, "A", 1.0, ship, "P1"),
        (3, 1, "B", 1.0, ship, "P2"),
        (4, 1, "B", 1.0, ship, "P2"),
    ]
    sf2 = _write(spark, tmp_path, "orders", _orders(spark, rows2))
    got2 = {
        (r["o_orderstatus"], r["o_orderpriority"]): r
        for r in CATALOG["dq_status_priority_contingency"]
        .spark(spark, sf2)
        .collect()
    }
    assert got2[("A", "P1")]["lift_permille"] == 2000
    # chi contribution per cell: (2*4 - 2*2)^2 / (4*2*2) = 16/16 = 1.0
    assert got2[("A", "P1")]["chisq_contrib"] == 1.0


def test_garbage_screen_flags_base64_and_symbol_soup(spark, tmp_path):
    """Clean prose passes; a base64-ish blob trips the consonant-run
    rule; symbol soup trips the symbol-ratio rule; digits count
    separately from symbols."""
    rows = [
        (1, "the quick brown fox jumps over a dog", "en", "A", 37),
        (2, "aGVsbG8gd29ybGQgZnJvbSBzcGFyaw", "en", "A", 30),  # base64-ish
        (3, "@@@@ $$$$ %%%% ^^^^ &&&& ****", "en", "A", 29),
        (4, "route 66 and 1234567890 numbers", "en", "A", 31),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["doc_id"]: r
        for r in CATALOG["doc_garbage_text_screen"].spark(spark, sf).collect()
    }
    assert not got[1]["is_garbage"] and got[1]["symbol_permille"] == 0
    assert got[2]["is_garbage"] and got[2]["max_consonant_run"] >= 8
    assert got[3]["is_garbage"] and got[3]["symbol_permille"] > 200
    assert not got[4]["is_garbage"]
    assert got[4]["digit_permille"] > 300


def test_cosine_histogram_gate_kicks_in_above_budget(spark, tmp_path):
    """With 2500 vectors (> M=2000) the deterministic gate must keep the
    exact fold32(id)*n < M*2^32 subset, and the histogram must equal a
    numpy brute force over precisely that subset."""
    import numpy as np

    n = 2500
    rng = np.random.RandomState(7)
    vecs = rng.randn(n, 4).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(n)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = _write(spark, tmp_path, "embeddings", emb)
    got = {
        r["bucket"]: r["n_pairs"]
        for r in CATALOG["emb_cosine_histogram"].spark(spark, sf).collect()
    }
    keep = [i for i in range(n) if _fold32(str(i)) * n < 2000 * (2**32)]
    assert 1500 < len(keep) < 2500  # the gate actually sampled
    m = vecs[keep].astype(np.float64)
    norm = np.linalg.norm(m, axis=1)
    sim = (m @ m.T) / np.outer(norm, norm)
    sim = np.floor(sim * 1e4 + 0.5) / 1e4
    iu = np.triu_indices(len(keep), k=1)
    buckets = np.minimum(np.floor(sim[iu] * 10.0), 9).astype(int)
    want = {int(b): int(c) for b, c in zip(*np.unique(buckets, return_counts=True))}
    assert got == want


def test_bpe_merges_greedy_sequence_and_tiebreak(spark, tmp_path):
    """'x y' dominates round 1; rounds 2-3 break the count tie
    lexicographically among the rewritten pairs."""
    rows = [
        (1, "x y z", "en", "A", 5),
        (2, "x y w", "en", "A", 5),
        (3, "x y", "en", "A", 3),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["merge_round"]: (r["pair"], r["merged"], r["n_occurrences"])
        for r in CATALOG["doc_bpe_merge_rounds"].spark(spark, sf).collect()
    }
    assert got[1] == ("x y", "x+y", 3)
    assert got[2] == ("x+y w", "x+y+w", 1)  # tie 1-1, 'w' < 'z'
    assert got[3] == ("x+y z", "x+y+z", 1)


def test_bpe_consumed_separator_semantics_pinned(spark, tmp_path):
    """'a b a b a b': the padded sequential replace consumes the
    separator after each match, so round 1 merges occurrences 1 and 3
    (leaving ' a+b a b a+b '); round 2 then re-merges the survivor, and
    round 3 pairs the merged symbols. This pins the exact cross-engine
    rewrite semantics the oracle unrolls."""
    rows = [(1, "a b a b a b", "en", "A", 11)]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["merge_round"]: (r["pair"], r["n_occurrences"])
        for r in CATALOG["doc_bpe_merge_rounds"].spark(spark, sf).collect()
    }
    assert got[1] == ("a b", 3)       # pre-merge count
    assert got[2] == ("a b", 1)       # the skipped middle occurrence
    assert got[3] == ("a+b a+b", 2)   # merged symbols pair up


def test_price_dispersion_uniform_vs_mixed(spark, tmp_path):
    """Uniform pricing gives cv2 = 0; a 100/300 two-point mix gives
    variance/mean^2 = 10000/40000 = 250 permille exactly."""
    parts = [
        (1, "p", "B", "FLAT", 1, 50.0),
        (2, "p", "B", "FLAT", 1, 50.0),
        (3, "p", "B", "MIX", 1, 100.0),
        (4, "p", "B", "MIX", 1, 300.0),
    ]
    sf = _write(spark, tmp_path, "part", _part(spark, parts))
    got = {
        r["p_type"]: r
        for r in CATALOG["part_price_dispersion_by_type"]
        .spark(spark, sf)
        .collect()
    }
    assert got["FLAT"]["cv2_permille"] == 0
    assert got["FLAT"]["mean_price"] == 50.0
    # n=2, S1=40000c, S2=1e8+9e8: n*S2-S1^2 = 2e9-1.6e9 = 4e8;
    # 4e8*1000 // 1.6e9 = 250
    assert got["MIX"]["cv2_permille"] == 250
    assert got["MIX"]["mean_price"] == 200.0


def test_acctbal_profile_negative_share_and_signed_mean(spark, tmp_path):
    """Negative balances count toward the permille and the signed
    fixed-point mean is exact."""
    cust = spark.createDataFrame(
        [
            (1, "c", 0, -100.0, "S"),
            (2, "c", 0, 200.0, "S"),
            (3, "c", 0, 350.5, "S"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    sf = _write(spark, tmp_path, "customer", cust)
    got = CATALOG["customer_acctbal_profile_by_segment"].spark(spark, sf).collect()[0]
    assert got["n_customers"] == 3 and got["n_negative"] == 1
    assert got["negative_permille"] == 333
    assert got["mean_acctbal"] == round((-100.0 + 200.0 + 350.5) / 3, 2)


def test_duplicated_span_coverage_counts_positions_once(spark, tmp_path):
    """Two docs sharing an 8-token block: every token of the block is
    covered in both docs (16 covered positions in source A+B), tokens
    outside any duplicated gram are not, and overlapping duplicated
    grams never double-count a position."""
    block = "b1 b2 b3 b4 b5 b6 b7 b8"
    rows = [
        (1, f"u1 u2 {block}", "en", "A", 1),        # 10 tokens, 8 covered
        (2, f"{block} v1 v2 v3", "en", "B", 1),     # 11 tokens, 8 covered
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "C", 1),  # nothing dup'd
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = {
        r["source"]: r
        for r in CATALOG["doc_duplicated_span_coverage"]
        .spark(spark, sf)
        .collect()
    }
    assert got["A"]["n_tokens"] == 10 and got["A"]["covered_tokens"] == 8
    assert got["A"]["covered_permille"] == 800
    assert got["B"]["n_tokens"] == 11 and got["B"]["covered_tokens"] == 8
    assert got["C"]["covered_tokens"] == 0 and got["C"]["covered_permille"] == 0


def test_duplicated_span_coverage_within_one_doc(spark, tmp_path):
    """A repeated 8-gram INSIDE one document counts (n >= 2 occurrences
    anywhere, same-doc included) — self-repetition is memorization risk
    too."""
    block = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [(1, f"{block} mid {block}", "en", "A", 1)]  # 17 tokens
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))
    got = CATALOG["doc_duplicated_span_coverage"].spark(spark, sf).collect()[0]
    assert got["n_tokens"] == 17
    assert got["covered_tokens"] == 16  # both blocks, 'mid' uncovered


def test_bpe_rounds_parameterized_greedy_prefix(spark, tmp_path):
    """The parameterized engine entry point (round-8): rounds=6 must
    extend rounds=3 — the greedy merge sequence is a PREFIX property
    (later rounds never change earlier decisions), and the per-round
    localCheckpoint materialization must not perturb any decision."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import (
        bpe_merge_rounds,
    )

    rows = [
        (1, "x y z x y w x y", "en", "A", 5),
        (2, "p q p q r s", "en", "B", 5),
        (3, "x y z w r s p q", "en", "A", 3),
    ]
    sf = _write(spark, tmp_path, "documents", _docs(spark, rows))

    def table(rounds):
        return {
            r["merge_round"]: (r["pair"], r["merged"], r["n_occurrences"])
            for r in bpe_merge_rounds(spark, sf, rounds=rounds).collect()
        }

    t3, t6 = table(3), table(6)
    assert len(t3) == 3 and len(t6) == 6
    assert all(t6[k] == t3[k] for k in t3)  # greedy prefix preserved
    # catalog entry == rounds=3 of the parameterized path
    cat = {
        r["merge_round"]: (r["pair"], r["merged"], r["n_occurrences"])
        for r in CATALOG["doc_bpe_merge_rounds"].spark(spark, sf).collect()
    }
    assert cat == t3


def test_mutual_knn_ivf_recovers_exact_on_separable_cells(spark, tmp_path):
    """Round-8 IVF mutual-kNN: when every reciprocal pair lives inside
    one well-separated cell (and each vector's own cell is its nearest
    probe), the cell-routed result equals the exact blocked-GEMM result
    bit-for-bit, and the recall audit reports 1000 permille — the
    planted separable case; what routing misses on MIXED corpora is the
    audit's whole job."""
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        cosine_pairs_blocked,
        mutual_knn_ivf,
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import (
        _mutual_topk_pairs,
    )

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for cell in range(3):
        base = np.zeros(16)
        base[cell] = 10.0  # orthogonal cell anchors
        for _ in range(6):
            v = base + rng.normal(0, 0.2, 16)
            rows.append((vid, [float(x) for x in v], cell))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["vec_id_a"], r["vec_id_b"]): (
            r["cos_sim"], r["rank_ab"], r["rank_ba"]
        )
        for r in mutual_knn_ivf(emb, k=3, nprobe=1, threshold=0.30).collect()
    }
    want = {
        (r["vec_id_a"], r["vec_id_b"]): (
            r["cos_sim"], r["rank_ab"], r["rank_ba"]
        )
        for r in _mutual_topk_pairs(
            cosine_pairs_blocked(emb, threshold=0.30), k=3
        ).collect()
    }
    assert got == want and len(got) > 0
    # cross-cell cosines sit near 0 (< the 0.30 threshold), so nothing
    # the exact path finds straddles cells — the separable premise
    assert all(a // 6 == b // 6 for a, b in got)


def test_nprobe_tradeoff_reconciles_with_recall_audit(spark, sf_dir):
    """The docstring's reconciliation claim, pinned: the nprobe=2 row of
    emb_ivf_nprobe_tradeoff must equal the emb_ivf_recall_audit summed
    over queries (same cell split, centroid arithmetic, tie-breaks),
    and recall must be monotone non-decreasing in nprobe while the
    candidate count strictly grows."""
    rows = {
        r["nprobe"]: r
        for r in CATALOG["emb_ivf_nprobe_tradeoff"].spark(spark, sf_dir).collect()
    }
    audit = CATALOG["emb_ivf_recall_audit"].spark(spark, sf_dir).collect()
    assert rows[2]["n_hits"] == sum(r["n_hits"] for r in audit)
    assert (
        rows[1]["recall_permille"]
        <= rows[2]["recall_permille"]
        <= rows[3]["recall_permille"]
    )
    assert rows[1]["n_candidates"] < rows[2]["n_candidates"] < rows[3]["n_candidates"]
