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

from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up


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

def debounce_stats(
    events: DataFrame,
    gap_seconds: int = 60,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Burst-collapse (debounce) audit per event type: an event is KEPT iff
    it is the first of its (user, type) stream or arrived at least
    ``gap_seconds`` after its immediate predecessor — repeated rapid-fire
    events (double-clicks, retry storms, bot bursts) collapse to their
    burst opener. Returns ``(event_type, n_total, n_kept, kept_ratio)``.

    The keep rule reads the PREVIOUS RAW event (one ``lag`` over a window
    partitioned by (user, type)), not the previous kept one — that keeps
    the operator a single declarative window instead of an iterative
    chain, and is the standard debounce semantics for burst suppression.
    Per-(user, type) partitions are bounded, the window carries one lag
    value of state, and the final rollup is a tiny hash aggregation —
    linear at 100 TB.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col, type_col).orderBy(us, F.col(id_col))
    gap = us - F.lag(us).over(w)
    kept = F.when(gap.isNull() | (gap >= gap_seconds * 1_000_000), 1).otherwise(0)
    flagged = events.select(
        F.col(type_col).alias("event_type"), kept.alias("_kept")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("_kept").cast("long").alias("n_kept"),
        )
        .withColumn(
            "kept_ratio",
            round_half_up(
                F.col("n_kept").cast("double") / F.col("n_total").cast("double"), 4
            ),
        )
    )
