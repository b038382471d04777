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
