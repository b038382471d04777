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
    from etl_pipeline_challenge_aladia_spark.sources.files import fan_out

    cols = list(columns) if columns is not None else df.columns
    types = dict(df.dtypes)
    # fan_out BEFORE the aggregate: the multi-distinct plan EXPANDS every
    # row (cols+1)x in the partial-agg stage, and on a single-row-group
    # testdata scan that whole expansion runs in one task; the round-robin
    # exchange spreads it (no-op passthrough on wide production scans)
    df = fan_out(df.select(*cols))

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


def candidate_keys(
    df: DataFrame, candidates: Sequence[Sequence[str]]
) -> DataFrame:
    """Candidate-key discovery: for each candidate column set, one row
    ``(candidate, n_rows, n_null_rows, n_distinct, is_key)`` — the
    uniqueness profile schema-inference and dedup passes consult before
    trusting a column set as a join or merge key.

    A candidate is a key iff no row has a NULL in any of its columns and
    the non-null rows are pairwise distinct on the set. Rows with a NULL
    in the set are counted separately and EXCLUDED from the distinct
    count on both engines (dodging the count(DISTINCT a,b) null-skipping
    divergence between dialects), so the check is exact cross-engine.

    One aggregation pass over the table: each candidate adds a
    count-distinct (Spark's multi-distinct expand — same plan shape as
    ``profile_table``) and a conditional null-row sum; the result is a
    candidates-sized unpivot of the 1-row aggregate. No shuffle carries
    more than the distinct-key cardinality, at any table size.
    """
    from etl_pipeline_challenge_aladia_spark.sources.files import fan_out

    cands = [list(c) for c in candidates]
    # fan_out BEFORE the aggregate (see profile_table): the multi-distinct
    # expand must run above the round-robin exchange, not in the scan task
    need = sorted({c for cols in cands for c in cols})
    df = fan_out(df.select(*need))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, cols in enumerate(cands):
        anynull = None
        for c in cols:
            p = F.col(c).isNull()
            anynull = p if anynull is None else (anynull | p)
        aggs.append(
            F.sum(F.when(anynull, 1).otherwise(0)).alias(f"_nu{i}")
        )
        # A single struct expression (not countDistinct(a, b, ...)): the
        # when() nulls the WHOLE tuple for any-null rows, and single-input
        # count distinct skips NULLs identically on every engine — the
        # multi-argument form's null handling is dialect-dependent.
        aggs.append(
            F.countDistinct(
                F.when(~anynull, F.struct(*[F.col(c) for c in cols]))
            ).alias(f"_nd{i}")
        )
    one = df.agg(*aggs)
    return (
        one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit("+".join(cols)).alias("candidate"),
                            F.col("_n").cast("long").alias("n_rows"),
                            F.col(f"_nu{i}").cast("long").alias("n_null_rows"),
                            F.col(f"_nd{i}").cast("long").alias("n_distinct"),
                        )
                        for i, cols in enumerate(cands)
                    ]
                )
            ).alias("r")
        )
        .select("r.*")
        .withColumn(
            "is_key",
            (F.col("n_null_rows") == 0)
            & (F.col("n_distinct") == F.col("n_rows")),
        )
    )


def fd_audit(
    df: DataFrame, fds: Mapping[str, tuple[Sequence[str], str]]
) -> DataFrame:
    """Functional-dependency audit (Metanome-style profiling): for each
    asserted dependency ``lhs -> rhs``, one row ``(fd_name, n_groups,
    n_violating_groups, max_rhs_variants, violation_permille)``.

    A group is an lhs value combination; it violates the FD when more
    than one distinct non-null rhs value appears under it. NULL lhs
    values form their own group (standard GROUP BY semantics on both
    engines); NULL rhs values don't count as variants.

    Per FD: one lhs-keyed aggregate (map-side combined, shuffle carries
    distinct-lhs rows) feeding a 1-row summary; the audit result is the
    union of the tiny summaries. ``violation_permille`` is the integer
    ``n_violating * 1000 div n_groups`` — non-negative, so Spark's
    truncating div and DuckDB's flooring // agree.
    """
    outs = []
    for name, (lhs, rhs) in fds.items():
        per = df.groupBy(*[F.col(c) for c in lhs]).agg(
            F.countDistinct(F.col(rhs)).alias("_v")
        )
        outs.append(
            per.agg(
                F.lit(name).alias("fd_name"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("_v") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_groups"),
                F.max("_v").cast("long").alias("max_rhs_variants"),
            ).withColumn(
                "violation_permille",
                F.expr("n_violating_groups * 1000 div n_groups").cast("long"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


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
