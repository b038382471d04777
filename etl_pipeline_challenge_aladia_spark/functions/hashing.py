"""Engine-independent 32-bit hashing (md5-fold).

Deterministic hashing that any SQL engine can reproduce exactly — used
wherever a hash value is part of oracle-compared output (MinHash/SimHash
signatures, hash-based dataset splits). ``xxhash64`` is the faster choice
when the hash never leaves Spark (see operators/dedup.py:exact_dedup), but
it has no DuckDB twin; md5 does.

Both sides of the contract live here so they can't drift:
``md5_fold32_col`` (Spark Column) and ``sql_md5_fold32`` (DuckDB SQL text)
compute the identical value: the first 8 hex chars of md5, read as a
base-16 integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_fold32_col(c: Column) -> Column:
    """First 8 hex chars of md5(col), as a long in [0, 2^32)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def sql_md5_fold32(expr: str) -> str:
    """The identical fold as DuckDB SQL (digit arithmetic — DuckDB has no
    base-conversion builtin)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ")"
    )
