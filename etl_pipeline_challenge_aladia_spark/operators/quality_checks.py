"""Declarative data-quality checks and table profiling (deequ-style).

An analytics engine that ingests 100 TB needs its validation pass to be an
engine feature, not an afterthought: rule violations, referential
integrity, and column profiles computed in the SAME distributed scans as
everything else.

- ``check_rules``: N boolean rules evaluated in ONE pass over the table —
  a single hash-free aggregation with one conditional sum per rule, then a
  tiny unpivot of the 1-row result. Adding a rule adds one codegen'd
  expression, never a scan.
- ``fk_orphans``: referential-integrity counts via anti-join semantics,
  expressed as an aggregate-then-join on the key so the child table is
  aggregated BEFORE the join (shuffle carries one row per distinct key,
  not per child row).
- ``profile_table``: per-column null/distinct/min/max summary — the
  what-is-in-this-table pass. One aggregation; distinct counts use
  Spark's multi-distinct expand. min/max are stringified through a
  cross-engine-stable cast (doubles are pre-rounded; magnitudes beyond
  1e7 would hit scientific-notation divergence between engines and should
  profile as rounded numerics instead).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate violation predicates in one pass: one output row per rule
    with ``(check_name, n_violations, n_rows, violation_rate)``.

    ``rules`` maps check name -> Column that is TRUE when the row VIOLATES
    the check (NULL predicate results count as violations — an unevaluable
    rule should fail loudly, not pass silently).
    """
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(
            F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)
        ).alias(f"_v{i}")
        for i, (_, pred) in enumerate(rules.items())
    ]
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(f"_v{i}").cast("long").alias("n_violations"),
                        F.col("_n").cast("long").alias("n_rows"),
                    )
                    for i, name in enumerate(rules)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return stacked.withColumn(
        "violation_rate",
        round_half_up(
            F.col("n_violations").cast("double") / F.col("n_rows").cast("double"), 4
        ),
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relationship: str,
) -> DataFrame:
    """One row: ``(relationship, n_children, n_orphans)`` — child rows whose
    key has no match in the parent (NULL keys count as orphans: a fact row
    that cannot be joined IS unparented for every downstream query).

    The child side aggregates to (key, count) BEFORE the join, so the join
    input is distinct-key-sized; the parent side projects just its key.
    """
    per_key = child.groupBy(F.col(child_key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    pk = parent.select(F.col(parent_key).alias("_k")).distinct()
    joined = per_key.join(pk.withColumn("_hit", F.lit(1)), "_k", "left")
    return joined.agg(
        F.lit(relationship).alias("relationship"),
        F.sum("_c").cast("long").alias("n_children"),
        F.sum(F.when(F.col("_hit").isNull(), F.col("_c")).otherwise(0))
        .cast("long")
        .alias("n_orphans"),
    )


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None, double_scale: int = 4
) -> DataFrame:
    """Per-column profile: ``(column_name, n_null, n_distinct, min_value,
    max_value)`` with min/max stringified (doubles pre-rounded half-up to
    ``double_scale`` so the text form is engine-stable)."""
    cols = list(columns) if columns is not None else df.columns
    types = dict(df.dtypes)

    def _s(c: str, agg) -> Column:
        base = F.col(c)
        if types[c] in ("double", "float"):
            base = round_half_up(base.cast("double"), double_scale)
        return agg(base).cast("string")

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn{i}"),
            F.countDistinct(F.col(c)).alias(f"_nd{i}"),
            _s(c, F.min).alias(f"_mn{i}"),
            _s(c, F.max).alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"_nn{i}").cast("long").alias("n_null"),
                        F.col(f"_nd{i}").cast("long").alias("n_distinct"),
                        F.col(f"_mn{i}").alias("min_value"),
                        F.col(f"_mx{i}").alias("max_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("r")
    ).select("r.*")


def fixed_width_histogram(
    df: DataFrame, value_col: str, n_bins: int = 20, scale: int = 4
) -> DataFrame:
    """Fixed-width histogram of a numeric column: ``(bin, lo, hi, n_rows)``
    with ``n_bins`` equal-width bins spanning [min, max]; the max value
    lands in the last bin. NULLs are excluded (profile them via
    ``profile_table``).

    Two passes: a 1-row min/max aggregate (broadcast back), then one
    linear binning pass + a bins-sized aggregation — the distribution
    profile at any corpus scale. Bin edges are the same IEEE divisions on
    every engine, so assignment is deterministic.
    """
    v = F.col(value_col).cast("double")
    mm = df.filter(v.isNotNull()).agg(
        F.min(v).alias("_mn"), F.max(v).alias("_mx")
    )
    binned = (
        df.filter(v.isNotNull())
        .crossJoin(F.broadcast(mm))  # single-row frame
        .select(
            F.when(
                F.col("_mx") == F.col("_mn"), F.lit(0)
            )
            .otherwise(
                F.least(
                    F.floor(
                        (v - F.col("_mn"))
                        / ((F.col("_mx") - F.col("_mn")) / F.lit(float(n_bins)))
                    ),
                    F.lit(n_bins - 1),
                )
            )
            .cast("long")
            .alias("bin"),
            "_mn",
            "_mx",
        )
    )
    w = (F.col("_mx") - F.col("_mn")) / F.lit(float(n_bins))
    return binned.groupBy("bin").agg(
        round_half_up(F.min(F.col("_mn") + F.col("bin") * w), scale).alias("lo"),
        round_half_up(F.min(F.col("_mn") + (F.col("bin") + 1) * w), scale).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
