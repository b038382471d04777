"""Ordered-funnel analysis over an event stream.

The classic product-analytics shape: of the users who did step 1, how many
went on to do step 2 strictly after it, then step 3 after that, ... Each
stage is one filter + one equi-join on the user key + one hash aggregation
keeping a single timestamp per user — per-user state is ONE value
regardless of event volume, so the plan is a chain of linear shuffles on
``user_col`` (and with the input pre-bucketed on the user key, no shuffle
at all). No window over the full event history, no per-user event-list
materialization — the two shapes that fall over at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row: ``n_reached_<step>`` for every prefix of ``steps``, where a
    user reaches step i+1 only with an event strictly AFTER their earliest
    qualifying step-i event (the standard first-touch funnel semantics;
    earliest-touch makes the count deterministic and maximizes reach, since
    any later qualifying chain implies one starting at the first touch)."""
    prev: DataFrame | None = None
    counts: list[DataFrame] = []
    for step in steps:
        cur = events.filter(F.col(type_col) == step)
        if prev is not None:
            cur = cur.join(prev, user_col).filter(F.col(ts_col) > F.col("_t_prev"))
        cur = cur.groupBy(user_col).agg(F.min(ts_col).alias("_t_prev"))
        counts.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias(f"n_reached_{step}"))
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(F.broadcast(c))  # single-row frames
    return out
