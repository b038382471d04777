"""Deterministic cross-engine rounding.

The reference rounds ``watched_ratio`` with Python ``round(x, 4)``
(reference consumer/DoFns/calculate_watched_ratio.py:13 — half-even on
binary doubles). Engines disagree on rounding modes (Spark ``round`` is
HALF_UP via BigDecimal, ``bround`` HALF_EVEN; DuckDB rounds through a
different path), so every double this engine emits for oracle-compared
output goes through an explicit ``floor(x * 10^n + 0.5) / 10^n`` — the
same IEEE ops in any engine, hence bit-identical results. Inputs here are
non-negative or far from ties, so the half-up-toward-+inf behavior is the
agreed contract (documented divergence from Python's half-even; ties are
impossible for odd denominators — see SURVEY.md §7.5.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int = 4) -> Column:
    """floor(x * 10^scale + 0.5) / 10^scale, as a double."""
    factor = float(10**scale)
    return (F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)).cast("double")


def sql_round_half_up(expr: str, scale: int = 4) -> str:
    """The identical formula as ANSI SQL text (for DuckDB oracles)."""
    factor = float(10**scale)
    return f"CAST(floor(({expr}) * {factor} + 0.5) / {factor} AS DOUBLE)"


def avg_fixed_point(col: Column, quant_scale: int = 6) -> Column:
    """Order-independent mean (aggregate expression): quantize each value to
    fixed-point int64 (``floor(x * 10^q + 0.5)``), sum EXACTLY in integer
    space, then make one double division by the count.

    A raw double ``avg`` is summation-order-dependent, so Spark's partial-agg
    fold and a sequential oracle fold can land on opposite sides of a
    rounding boundary; with the sum integer-exact, every engine computes the
    identical rational and the single division is one deterministic IEEE op.
    NULLs are ignored on both sides (sum/count skip them, like ``avg``).
    """
    q = float(10**quant_scale)
    fx = F.floor(col * F.lit(q) + F.lit(0.5)).cast("long")
    return F.sum(fx).cast("double") / F.lit(q) / F.count(col)


def sql_avg_fixed_point(expr: str, quant_scale: int = 6) -> str:
    """The identical order-independent mean as ANSI SQL text."""
    q = float(10**quant_scale)
    return (
        f"CAST(sum(CAST(floor(({expr}) * {q} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {q} / count({expr})"
    )


def sum_fixed_point(col: Column, quant_scale: int = 6) -> Column:
    """Order-independent sum (aggregate expression): quantize each value
    to fixed-point int64 (``floor(x * 10^q + 0.5)``), sum EXACTLY in
    integer space, then one double division back — the sum twin of
    ``avg_fixed_point`` (same rationale: a raw double ``sum`` is
    fold-order-dependent across engines/partitionings)."""
    q = float(10**quant_scale)
    fx = F.floor(col * F.lit(q) + F.lit(0.5)).cast("long")
    return F.sum(fx).cast("double") / F.lit(q)


def sql_sum_fixed_point(expr: str, quant_scale: int = 6) -> str:
    """The identical order-independent sum as ANSI SQL text."""
    q = float(10**quant_scale)
    return (
        f"CAST(sum(CAST(floor(({expr}) * {q} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {q}"
    )
