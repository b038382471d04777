"""Approximate/sketch aggregations — the 100 TB substitutes for exact
distinct counts and quantiles.

The exact forms (count_distinct, percentile) shuffle every distinct value /
sort every group; the sketch forms are constant-space per group and merge
associatively, so they stay one map-side-combined aggregation at any scale:

- ``approx_distinct``: HyperLogLog++ (relative error configurable)
- ``approx_quantiles``: Greenwald-Khanna variant via approx_percentile
- ``bloom_might_contain``: Bloom-filter semi-join pruning — build a compact
  filter from the small side's keys, drop probe rows that cannot match
  BEFORE the join shuffle (the poor man's runtime filter / DPP analog)

These are deliberately NOT in the oracle-checked catalog: sketch outputs
are engine-specific by construction. Tests bound them against the exact
answers instead (relative-error tolerance), which is the correct contract
for approximate operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, rsd: float = 0.05) -> Column:
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: Column | str, probabilities: Sequence[float], accuracy: int = 10_000
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def _bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    import math

    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _bloom_hashes(value, m: int, k: int) -> list[int]:
    import hashlib

    digest = hashlib.md5(str(value).encode()).digest()
    h1 = int.from_bytes(digest[:8], "big")
    h2 = int.from_bytes(digest[8:], "big") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def bloom_prune_probe(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Filter probe rows through a Bloom filter of the build side's keys.

    The filter is built DISTRIBUTED: each build partition fills a local
    bitmap, bitmaps OR-merge associatively (the treeAggregate shape Spark's
    Scala-side bloomFilter uses), and only the final m-bit array reaches the
    driver for broadcast — never the keys themselves. False positives pass
    (removed by the real join); false negatives are impossible, so
    semantics are preserved. Worth it when the join is selective: the
    pruned probe side shuffles a fraction of its rows.
    """
    m, k = _bloom_params(expected_items, fpp)

    def partition_bits(rows):
        bits = bytearray(m // 8 + 1)
        for r in rows:
            v = r[0]
            if v is None:
                continue
            for pos in _bloom_hashes(v, m, k):
                bits[pos // 8] |= 1 << (pos % 8)
        yield bytes(bits)

    def merge(a: bytes, b: bytes) -> bytes:
        return bytes(x | y for x, y in zip(a, b))

    bitmap = build.select(build_key).rdd.mapPartitions(partition_bits).reduce(merge)
    bloom_bc = probe.sparkSession.sparkContext.broadcast((bitmap, m, k))

    from pyspark.sql.functions import udf
    from pyspark.sql.types import BooleanType

    def might_contain(v):
        if v is None:
            return False
        bits, mm, kk = bloom_bc.value
        return all(bits[p // 8] & (1 << (p % 8)) for p in _bloom_hashes(v, mm, kk))

    return probe.filter(udf(might_contain, BooleanType())(F.col(probe_key)))
