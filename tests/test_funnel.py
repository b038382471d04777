"""Unit tests for ordered-funnel semantics."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Row

from etl_pipeline_challenge_aladia_spark.operators.funnel import (
    funnel_counts,
    markov_removal_attribution,
)


def _ev(user, typ, minute):
    return Row(
        user_id=user, event_type=typ, ts=datetime(2024, 1, 1, 10, minute, 0)
    )


def test_funnel_requires_strict_order(spark):
    events = spark.createDataFrame(
        [
            # user 1 completes the funnel in order
            _ev(1, "view", 0), _ev(1, "click", 5), _ev(1, "purchase", 9),
            # user 2 clicked BEFORE viewing: reaches view, not click
            _ev(2, "click", 0), _ev(2, "view", 5),
            # user 3 views and clicks, purchase came before the click
            _ev(3, "view", 0), _ev(3, "purchase", 1), _ev(3, "click", 4),
            # user 4 never views: contributes nothing
            _ev(4, "click", 0), _ev(4, "purchase", 1),
        ]
    )
    row = funnel_counts(events, ["view", "click", "purchase"]).collect()[0]
    assert row["n_reached_view"] == 3
    assert row["n_reached_click"] == 2  # users 1 and 3
    assert row["n_reached_purchase"] == 1  # user 1 only


def test_markov_zero_truncated_conversion_mass_still_emits_rows(
    spark, tmp_path
):
    """ADVICE r11 low (operators/funnel.py): the applyInPandas
    propagation must carry fx=0 entries through every round exactly like
    the unrolled oracle's absorbing pass-through (which has no fx>0
    filter). Fixture: the only converting journey crosses two 1/1000-ish
    hops (x->z, then z->w diluted by a 1000-long z self-loop run), so
    the fixed-point mass reaching w truncates to EXACTLY 0 before the
    conversion edge fires — __conv__ must then exist with mass 0, and
    the query must return one all-zero row per channel (the oracle's
    behavior), not an empty frame (a truthiness guard drops the 0 and
    the '__none__' variant loses its __conv__ row entirely)."""
    t0 = datetime(2024, 1, 1)
    rows = []
    # user 0: x, z * 1001 (self-loop run), w, purchase — the one journey
    # that converts; p(x->z)=1/1000, p(z->w)=1/1001 => mass at w is
    # (1000 * 999) // 1e6 = 0 after truncation
    seq = ["x"] + ["z"] * 1001 + ["w", "purchase"]
    for i, st in enumerate(seq):
        rows.append((i, t0 + timedelta(seconds=i), 0, st))
    # users 1..999: a single unconverted x event (tail x -> __null__),
    # diluting p(x->z) to 1/1000
    for u in range(1, 1000):
        rows.append((10_000 + u, t0, u, "x"))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r.channel: r
        for r in markov_removal_attribution(
            events, conversion="purchase", steps=8
        ).collect()
    }
    assert set(got) == {"x", "z", "w"}
    for r in got.values():
        assert (
            r.p_conv_full_fx,
            r.p_conv_removed_fx,
            r.removal_effect_fx,
            r.attribution_permille,
        ) == (0, 0, 0, 0)


def test_markov_zero_mass_parity_with_catalog_oracle(spark, tmp_path):
    """The same zero-truncation fixture, checked end-to-end against the
    catalog's own DuckDB oracle (CATALOG['events_markov_removal_
    attribution']) — the exact comparison the driver gate runs, on the
    corner the gate's organic events fixture never exercises."""
    import duckdb
    import pandas as pd

    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    t0 = datetime(2024, 1, 1)
    rows = []
    seq = ["x"] + ["z"] * 1001 + ["w", "purchase"]
    for i, st in enumerate(seq):
        rows.append((i, t0 + timedelta(seconds=i), 0, st, 0.0, "{}"))
    for u in range(1, 1000):
        rows.append((10_000 + u, t0, u, "x", 0.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path / "sf")
    events.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    spec = CATALOG["events_markov_removal_attribution"]
    eng = (
        spec.spark(spark, sf_dir)
        .toPandas()
        .sort_values("channel", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    ora = (
        con.execute(spec.oracle)
        .fetchdf()
        .sort_values("channel", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        eng[sorted(eng.columns)].astype("int64", errors="ignore"),
        ora[sorted(ora.columns)].astype("int64", errors="ignore"),
        check_dtype=False,
    )
    assert len(eng) == 3 and (eng["p_conv_full_fx"] == 0).all()


def test_funnel_first_touch_maximizes_reach(spark):
    # user views twice; the click is after the FIRST view only when
    # first-touch semantics are used
    events = spark.createDataFrame(
        [_ev(1, "view", 0), _ev(1, "click", 2), _ev(1, "view", 5)]
    )
    row = funnel_counts(events, ["view", "click"]).collect()[0]
    assert row["n_reached_view"] == 1
    assert row["n_reached_click"] == 1
