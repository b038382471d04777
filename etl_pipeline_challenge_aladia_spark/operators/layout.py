"""Physical-layout keys: z-order (Morton) interleaving for multi-column
data skipping.

Sorting a table by one column gives min/max pruning on that column only; a
z-order key bit-interleaves two quantized dimensions so that rows close in
EITHER dimension land close in the sort order — each written file then
covers a bounded rectangle of (a, b) space, and scans filtered on either
column skip most files (the OPTIMIZE ZORDER BY idea from Delta/Iceberg,
available here as a plain expression: write sorted by the key via
``sortWithinPartitions`` / ``repartitionByRange``).

Everything is exact integer arithmetic (integer-DIV quantization against
global min/max, shift/mask interleave), fully codegen'd JVM-side and
reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize_col(v: Column, mn: Column, mx: Column, bits: int = 8) -> Column:
    """Map integer ``v`` in [mn, mx] to a cell in [0, 2^bits):
    ``floor((v - mn) * 2^bits / (mx - mn + 1))``.

    The double division is exact here: the numerator is an exact integer
    double (< 2^53) and the quotient's distance from any integer is at
    least 1/denominator (>> one ulp), so floor lands identically in every
    IEEE engine — the same expression text works as the SQL twin."""
    cells = F.lit(float(1 << bits))
    span = (mx - mn + F.lit(1)).cast("double")
    return F.floor((v - mn).cast("double") * cells / span).cast("long")


def zorder_key_col(qa: Column, qb: Column, bits: int = 8) -> Column:
    """Bit-interleave two quantized cells (each in [0, 2^bits)) into a
    Morton key: bit i of ``qa`` -> key bit 2i, bit i of ``qb`` -> key bit
    2i+1. Pure shift/mask expression tree (2*bits terms), whole-stage
    codegen'd."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(qa, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(qb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z.cast("long")


def zorder_sql(qa: str, qb: str, bits: int = 8) -> str:
    """The identical interleave as SQL text (DuckDB oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({qa} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({qb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
