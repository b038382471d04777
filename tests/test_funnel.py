"""Unit tests for ordered-funnel semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from etl_pipeline_challenge_aladia_spark.operators.funnel import funnel_counts


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


def test_funnel_first_touch_maximizes_reach(spark):
    # user views twice; the click is after the FIRST view only when
    # first-touch semantics are used
    events = spark.createDataFrame(
        [_ev(1, "view", 0), _ev(1, "click", 2), _ev(1, "view", 5)]
    )
    row = funnel_counts(events, ["view", "click"]).collect()[0]
    assert row["n_reached_view"] == 1
    assert row["n_reached_click"] == 1
