"""Planted-geometry tests for the round-7 operators: fixed-point
PageRank over the dup graph, source segment overlap, first/last-touch
attribution, and the label separation audit."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pagerank_star_center_outranks_leaves(spark):
    """A 4-leaf star: the hub receives every leaf's full share each
    round and must outrank the leaves; ranks are exact int64 so the
    values can be checked against a hand-rolled iteration."""
    from etl_pipeline_challenge_aladia_spark.operators.graph import (
        PR_SCALE,
        pagerank_fixed_point,
    )

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "doc_id_a long, doc_id_b long"
    )
    got = {
        r["id"]: (r["degree"], r["rank_fx"])
        for r in pagerank_fixed_point(pairs, iterations=3).collect()
    }
    assert got[0][0] == 4 and all(got[i][0] == 1 for i in range(1, 5))
    # hand-rolled identical integer iteration
    n = 5
    rank = {v: PR_SCALE // n for v in range(5)}
    deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
    nbr = {0: [1, 2, 3, 4], 1: [0], 2: [0], 3: [0], 4: [0]}
    for _ in range(3):
        rank = {
            v: ((150 * PR_SCALE) // 1000) // n
            + (850 * sum(rank[u] // deg[u] for u in nbr[v])) // 1000
            for v in range(5)
        }
    assert {v: got[v][1] for v in got} == rank
    assert got[0][1] > got[1][1]


def test_pagerank_disconnected_components_keep_local_mass(spark):
    """Two disjoint edges: all four nodes are symmetric (degree 1) and
    must end with identical ranks — no cross-component leakage."""
    from etl_pipeline_challenge_aladia_spark.operators.graph import (
        pagerank_fixed_point,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_id_a long, doc_id_b long"
    )
    ranks = {
        r["id"]: r["rank_fx"]
        for r in pagerank_fixed_point(pairs, iterations=3).collect()
    }
    assert len(set(ranks.values())) == 1 and len(ranks) == 4


def test_source_segment_overlap_counts_shared_distinct_segments(spark):
    """Sources s1/s2 share exactly two distinct 8-token segments (one
    of them repeated inside s2 — still counted once); s3 shares
    nothing and must not pair."""
    seg = lambda p: " ".join(f"{p}{i}" for i in range(8))  # noqa: E731
    rows = [
        (1, "s1", seg("a") + " " + seg("b")),
        (2, "s1", seg("c")),
        (3, "s2", seg("a") + " " + seg("b") + " " + seg("a")),
        (4, "s2", seg("d")),
        (5, "s3", seg("z")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(d + "/documents.parquet")
        got = {
            (r["source_a"], r["source_b"]): r
            for r in CATALOG["doc_source_segment_overlap"]
            .spark(spark, d)
            .collect()
        }
    assert set(got) == {("s1", "s2")}
    r = got[("s1", "s2")]
    # s1 holds {a,b,c}; s2 holds {a,b,d}; shared {a,b}; both sized 3
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["overlap_permille"] == 666  # 2*1000 div 3


def test_attribution_first_vs_last_touch_disagree(spark):
    """User journey view -> click -> purchase(10.0): first touch is the
    view, last touch is the click; a purchase with no preceding event
    attributes nothing."""
    import datetime as dt
    import tempfile

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 0.0, None),
        (2, t0 + dt.timedelta(minutes=1), 7, "click", 0.0, None),
        (3, t0 + dt.timedelta(minutes=2), 7, "purchase", 10.0, None),
        (4, t0, 8, "purchase", 99.0, None),  # orphan purchase
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(d + "/events.parquet")
        got = {
            r["touch_type"]: r
            for r in CATALOG["events_attribution_touch"]
            .spark(spark, d)
            .collect()
        }
    assert set(got) == {"view", "click"}
    assert got["view"]["n_first_touch"] == 1
    assert got["view"]["first_touch_value"] == 10.0
    assert got["view"]["n_last_touch"] == 0
    assert got["view"]["last_touch_value"] == 0.0
    assert got["click"]["n_last_touch"] == 1
    assert got["click"]["last_touch_value"] == 10.0
    assert got["click"]["n_first_touch"] == 0


def test_label_separation_audit_planted_clusters(spark):
    """Two tight clusters far apart: separation >> 1000; the nearest
    rival is the other label; within scatter matches hand arithmetic."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        label_separation_audit,
    )

    rows = [
        (1, [0.0, 0.1], 0),
        (2, [0.0, -0.1], 0),
        (3, [10.0, 0.1], 1),
        (4, [10.0, -0.1], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["label"]: r
        for r in label_separation_audit(emb, dim=2).collect()
    }
    assert set(got) == {0, 1}
    for lab in (0, 1):
        r = got[lab]
        assert r["nearest_label"] == 1 - lab
        # centroid (x, 0.0); each point at squared distance 0.01 -> fx 1e6
        assert r["within_mean_fx"] == 10**6
        # centroids 10 apart -> fx 100 * 1e8 = 1e10
        assert r["between_min_fx"] == 10**10
        assert r["separation_permille"] == (10**10 * 2 * 1000) // (2 * 10**6)


def test_session_paths_splits_on_gap_and_caps_at_five(spark):
    """One user: 3 events, 31-min gap, then 7 rapid events — two
    sessions; the second path is capped at its first five types."""
    import datetime as dt
    import tempfile

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        (1, t0, 7, "view", 0.0, None),
        (2, t0 + dt.timedelta(minutes=1), 7, "click", 0.0, None),
        (3, t0 + dt.timedelta(minutes=2), 7, "purchase", 5.0, None),
    ]
    t1 = t0 + dt.timedelta(minutes=33)
    types = ["view", "view", "click", "view", "click", "purchase", "view"]
    rows += [
        (10 + i, t1 + dt.timedelta(seconds=i), 7, ty, 0.0, None)
        for i, ty in enumerate(types)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(d + "/events.parquet")
        got = {
            r["path"]: (r["n_sessions"], r["n_users"])
            for r in CATALOG["events_session_paths"].spark(spark, d).collect()
        }
    assert got == {
        "view>click>purchase": (1, 1),
        "view>view>click>view>click": (1, 1),  # capped at 5 of 7
    }


def test_topk_revenue_concentration_exact_shares(spark):
    """Four customers with revenues 70/20/9/1: top-10 covers everyone
    (1000 permille); hand-checked cents arithmetic."""
    import datetime as dt
    import tempfile

    rows = [
        (1, 100, "F", 70.0, dt.datetime(1995, 1, 1), "1-URGENT"),
        (2, 200, "F", 15.0, dt.datetime(1995, 1, 2), "1-URGENT"),
        (3, 200, "F", 5.0, dt.datetime(1995, 1, 3), "1-URGENT"),
        (4, 300, "F", 9.0, dt.datetime(1995, 1, 4), "1-URGENT"),
        (5, 400, "F", 1.0, dt.datetime(1995, 1, 5), "1-URGENT"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(d + "/orders.parquet")
        got = {
            r["top_k"]: r
            for r in CATALOG["orders_topk_revenue_concentration"]
            .spark(spark, d)
            .collect()
        }
    assert set(got) == {10, 100, 1000}
    for k in (10, 100, 1000):
        r = got[k]
        assert r["n_customers"] == 4
        assert r["topk_revenue_cents"] == 10000
        assert r["revenue_share_permille"] == 1000


def test_crosslang_matrix_buckets_unordered_lang_pairs(spark):
    """Two near-dup docs with different langs land in one off-diagonal
    bucket; two same-lang dups in a diagonal one."""
    import tempfile

    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"oth{i}" for i in range(40))
    rows = [
        (1, base, "en", "s1", len(base)),
        (2, base + " x", "de", "s1", len(base)),  # cross-lang near-dup
        (3, other, "fr", "s2", len(other)),
        (4, other + " y", "fr", "s2", len(other)),  # same-lang near-dup
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(d + "/documents.parquet")
        got = {
            (r["lang_a"], r["lang_b"]): (r["n_pairs"], r["share_permille"])
            for r in CATALOG["doc_crosslang_near_dup_matrix"]
            .spark(spark, d)
            .collect()
        }
    assert got == {("de", "en"): (1, 500), ("fr", "fr"): (1, 500)}


def test_top_pc_power_iteration_finds_dominant_axis(spark):
    """Vectors spread along x with tiny y jitter: the top PC is the
    x-axis (unit component ~1.0 on dim 1, ~0 on dim 2), sign fixed by
    the positive seed."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        top_pc_power_iteration,
    )

    rows = [
        (1, [3.0, 0.02]),
        (2, [-3.0, 0.01]),
        (3, [2.0, -0.02]),
        (4, [-2.0, -0.01]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["dim"]: r["pc1"]
        for r in top_pc_power_iteration(emb, iterations=3, dim=2).collect()
    }
    assert abs(abs(got[1]) - 1.0) < 0.01  # dominant axis
    assert abs(got[2]) < 0.05
    assert abs(got[1] ** 2 + got[2] ** 2 - 1.0) < 0.01  # unit norm


def test_bot_suspects_ranks_scripted_traffic_first(spark):
    """A scraper (60 identical events 100ms apart) must outrank an
    organic user (3 mixed events minutes apart) on every component."""
    import datetime as dt
    import tempfile

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (100 + i, t0 + dt.timedelta(milliseconds=100 * i), 1, "view", 0.0, None)
        for i in range(60)
    ]
    rows += [
        (1, t0, 2, "view", 0.0, None),
        (2, t0 + dt.timedelta(minutes=5), 2, "click", 0.0, None),
        (3, t0 + dt.timedelta(minutes=11), 2, "purchase", 4.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(d + "/events.parquet")
        out = CATALOG["events_bot_suspects"].spark(spark, d).collect()
    assert [r["user_id"] for r in out] == [1, 2]
    bot, human = out[0], out[1]
    assert bot["top_type_share_permille"] == 1000
    assert bot["min_gap_us"] == 100_000  # 100ms cadence
    # 60 events over 5.9s -> ~36k/hour; organic: 3 over 11 min -> 16/hour
    assert bot["events_per_hour"] > 10_000 > human["events_per_hour"]
    assert bot["bot_score"] > human["bot_score"] + 1000  # rate + gap penalty


def test_anisotropy_audit_detects_dominant_axis_energy(spark):
    """Vectors almost entirely along one axis: the top-PC energy share
    approaches 1000 permille; isotropic 2D data sits near 500."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        anisotropy_audit,
    )

    aniso = spark.createDataFrame(
        [(i, [float(3 + (i % 3)), 0.01 * (i % 2)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    r = anisotropy_audit(aniso, iterations=3, dim=2).collect()[0]
    assert r["n_vecs"] == 8
    assert r["top_axis_energy_permille"] >= 990

    iso = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]), (4, [0.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    r2 = anisotropy_audit(iso, iterations=3, dim=2).collect()[0]
    assert 400 <= r2["top_axis_energy_permille"] <= 600


def test_winnowing_detects_long_shared_run(spark):
    """The winnowing guarantee: a shared run of >= k+window-1 tokens
    always yields shared fingerprints. Two docs embedding the same
    16-token passage in different contexts must pair; unrelated docs
    must not."""
    from etl_pipeline_challenge_aladia_spark.operators.text import (
        winnow_fingerprints,
        winnowing_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, "intro one two " + shared + " outro alpha"),
            (2, "different lead " + shared + " tail omega zz"),
            (3, " ".join(f"x{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    got = winnowing_pairs(docs, k=4, window=4, min_shared=2).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in got] == [(1, 2)]
    # 13 grams inside the shared run -> 10 full windows -> >= 3 selected
    assert got[0]["n_shared_fp"] >= 3

    # density: winnowing indexes far fewer positions than grams exist
    fp = winnow_fingerprints(docs, k=4, window=4)
    n_fp = fp.filter("id = 3").count()
    assert 0 < n_fp <= 27 - 3  # 27 grams, strictly compressed


def test_open_backlog_interval_counting(spark):
    """Two overlapping orders: backlog rises to 2 in the overlap and
    returns to 0 the day after the last ship."""
    import datetime as dt
    import tempfile

    d = dt.datetime
    orders = spark.createDataFrame(
        [
            (1, 10, "F", 5.0, d(1995, 1, 1), "x"),
            (2, 11, "F", 5.0, d(1995, 1, 3), "x"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, 100, d(1995, 1, 5)), (2, 101, d(1995, 1, 4))],
        "l_orderkey long, l_partkey long, l_shipdate timestamp",
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    with tempfile.TemporaryDirectory() as tmp:
        orders.write.parquet(tmp + "/orders.parquet")
        li.write.parquet(tmp + "/lineitem.parquet")
        got = {
            r["day"]: r["open_orders"]
            for r in CATALOG["orders_open_backlog_daily"]
            .spark(spark, tmp)
            .collect()
        }
    assert got == {
        "1995-01-01": 1,  # order 1 opens
        "1995-01-03": 2,  # order 2 opens, 1 still open
        "1995-01-05": 1,  # order 2 closed (shipped 1/4)
        "1995-01-06": 0,  # order 1 closed (shipped 1/5)
    }


def test_benford_audit_shares_sum_and_deviation_arithmetic(spark, sf_dir):
    """Nine rows always; observed permilles reconstruct from counts;
    deviation = observed - expected exactly."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    rows = CATALOG["dq_benford_totalprice"].spark(spark, sf_dir).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    n = sum(r["n_orders"] for r in rows)
    for r in rows:
        assert r["observed_permille"] == (r["n_orders"] * 1000) // n
        assert (
            r["deviation_permille"]
            == r["observed_permille"] - r["expected_permille"]
        )
    assert sum(r["expected_permille"] for r in rows) == 1000
