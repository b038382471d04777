"""Skew mitigation for joins at scale.

AQE's skew-join split (enabled in session.py) handles most skew at runtime
by splitting oversized shuffle partitions. ``salted_join`` is the explicit
fallback for the pathological case AQE can't fix: a single join key so hot
that one task would receive a large fraction of the stream side (e.g. a
null-ish default key, a viral video_id). Salting sub-partitions the hot
side randomly and replicates the build side per salt, so the hot key fans
out over ``salt_factor`` tasks.

Trade-off: the build side is replicated ``salt_factor`` times through the
shuffle — use only when the build side is small-ish (but too big to
broadcast outright, otherwise ``broadcast()`` already avoids skew since
there is no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated.

    probe gains a uniform random salt in [0, salt_factor); build is exploded
    once per salt value; the join adds ``_salt`` to the key so each hot key
    spreads over ``salt_factor`` shuffle partitions. Result equals
    ``probe.join(build, on, how)`` for inner/left joins (salt is dropped).
    """
    if salt_factor < 2:
        return probe.join(build, list(on), how)
    salted_probe = probe.withColumn(
        SALT_COL, (F.rand(seed=42) * salt_factor).cast("int")
    )
    replicated_build = build.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = salted_probe.join(replicated_build, [*on, SALT_COL], how)
    return out.drop(SALT_COL)


def auto_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    share_threshold: float = 0.2,
    salt_factor: int = 8,
    how: str = "inner",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Measure-then-decide salting: run the ``top_key_skew`` diagnostic and
    salt ONLY when the heaviest key holds at least ``share_threshold`` of
    the probe rows; otherwise emit the plain join (no rand/explode nodes,
    no build-side replication for the common non-skewed case).

    The diagnostic is one small aggregation returning a single row — at
    100 TB pass ``sample_fraction`` (e.g. 0.01) so the measurement reads a
    sample instead of the full probe side; a key hot enough to need
    salting is hot in any honest sample. The measured share is a
    plan-time decision, so the choice is visible in the physical plan
    (explode+salt present or absent), not buried in a config.
    """
    diag = (
        probe.sample(fraction=sample_fraction, seed=42)
        if sample_fraction
        else probe
    )
    top = top_key_skew(diag, on, n=1).collect()
    share = top[0]["share"] if top else 0.0
    if share >= share_threshold:
        return salted_join(probe, build, on, salt_factor=salt_factor, how=how)
    return probe.join(build, list(on), how)


def top_key_skew(df: DataFrame, keys: Sequence[str], n: int = 5) -> DataFrame:
    """Diagnostic: the n heaviest key groups and their share of all rows —
    the number to look at before choosing broadcast / AQE / salting."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(n)
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lo: int,
    hi: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Bounded range join with a coarse bucket equi-key — the 100-TB
    shape for "right_ts BETWEEN left_ts+lo AND left_ts+hi" (inclusive,
    integer units): a plain equi-join on ``on`` with a residual range
    filter degrades to a per-key cross product when keys are hot (one
    busy user's clicks x purchases all meet in one task); widening the
    join key with floor(ts / bucket_width) bounds each task's work to
    ADJACENT time buckets regardless of per-key volume.

    The right side is bucketed ONCE by its own timestamp; the left side
    explodes to the (at most ceil((hi-lo)/w)+1, = 2 at the default
    width) buckets its window can touch, so every qualifying pair meets
    on exactly one (key, bucket) — no dedup stage — and the exact
    BETWEEN filter runs as the join residual: results are IDENTICAL to
    the naive range join (the oracle of a bucketed query is the plain
    range-join SQL), only the meeting granularity changes.

    ``bucket_width`` defaults to the window width hi-lo — the coarsest
    width that still guarantees a 2-bucket left fan-out (wider buckets
    re-grow per-task volume; much narrower ones inflate the left
    explode)."""
    w = int(bucket_width) if bucket_width is not None else max(1, hi - lo)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")
    if hi < lo:
        raise ValueError(f"empty range: lo={lo} > hi={hi}")
    clash = {"_brj_bucket"} & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"internal column already present: {sorted(clash)}")
    # exact integer division, never floor(double/double): at microsecond
    # epoch magnitudes a one-ulp quotient error could bucket an endpoint
    # off by one and silently DROP a qualifying pair; `div` is a pure
    # int64 op, and its monotonicity guarantees every qualifying right
    # bucket lies inside the left side's exploded [lo..hi] bucket span
    b_right = right.withColumn(
        "_brj_bucket", F.expr(f"`{right_ts}` div {w}")
    )
    b_left = left.withColumn(
        "_brj_bucket",
        F.explode(
            F.sequence(
                F.expr(f"(`{left_ts}` + {lo}) div {w}"),
                F.expr(f"(`{left_ts}` + {hi}) div {w}"),
            )
        ),
    )
    return (
        b_left.join(b_right, [*on, "_brj_bucket"])
        .filter(
            F.col(right_ts).between(
                F.col(left_ts) + F.lit(lo), F.col(left_ts) + F.lit(hi)
            )
        )
        .drop("_brj_bucket")
    )
