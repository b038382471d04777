"""watched_ratio enrichment — the reference's F1 operator.

Reference: consumer/DoFns/calculate_watched_ratio.py:3-19. Semantics ledger
(SURVEY.md §7.5.4):
- missing watched_seconds        -> treated as 0     (line 9)
- missing video_duration_seconds -> treated as 1     (line 10)
- duration <= 0                  -> ratio 0          (line 12)
- result rounded to 4 decimals   (line 13)

Expressed as a native Column (JVM-side, whole-stage-codegen'd) — the
reference needs a Python DoFn per message; Spark needs no Python at all.
Rounding uses the cross-engine-deterministic half-up formula
(functions/rounding.py); ``bround`` (HALF_EVEN, matching Python round) is
available via ``watched_ratio_col(mode="half_even")`` for reference-exact
fidelity when oracle parity is not the consumer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up


def watched_ratio_col(
    watched: Column,
    duration: Column,
    mode: str = "half_up",
) -> Column:
    """ratio = round(coalesce(watched,0) / coalesce(duration,1), 4); 0 if d<=0."""
    w = F.coalesce(watched, F.lit(0)).cast("double")
    d = F.coalesce(duration, F.lit(1)).cast("double")
    raw = F.when(d > 0, w / d).otherwise(F.lit(0.0))
    if mode == "half_even":
        return F.bround(raw, 4)
    return round_half_up(raw, 4)


def with_watched_ratio(envelopes: DataFrame, mode: str = "half_up") -> DataFrame:
    """Add ``watched_ratio`` inside the nested ``data`` struct (the reference
    mutates the data sub-dict in place, calculate_watched_ratio.py:13-15).
    Delete envelopes (data NULL) stay NULL — the reference emits nothing for
    them at this stage (SURVEY.md §7.5.1)."""
    ratio = watched_ratio_col(
        F.col("data.watched_seconds"), F.col("data.video_duration_seconds"), mode
    )
    return envelopes.withColumn(
        "data",
        F.when(
            F.col("data").isNotNull(), F.col("data").withField("watched_ratio", ratio)
        ),
    )
