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


def bloom_prune_probe(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Filter probe rows through a Bloom filter of the build side's keys.

    Everything stays JVM-side. The build runs through
    ``DataFrameStatFunctions.bloomFilter`` — a distributed treeAggregate
    where each build partition fills a local bitmap and bitmaps OR-merge
    associatively, so only the final bit array reaches the driver, never
    the keys. The probe is Spark's native ``might_contain``
    (BloomFilterMightContain, the expression behind the optimizer's
    runtime row-level filtering since 3.3): it inlines into whole-stage
    codegen — no Python in either path.

    Both sides hash through ``xxhash64`` so any key type works and the
    build/probe hash spaces agree. False positives pass (removed by the
    real join); false negatives are impossible, so semantics are
    preserved. Worth it when the join is selective: the pruned probe side
    shuffles a fraction of its rows. NULL probe keys are dropped — they
    can never match an equi-join anyway.

    The native path reaches through non-public JVM surfaces
    (``ExpressionUtils``/``BloomFilterMightContain`` constructors), so it
    is capability-probed once per JVM: if a PySpark upgrade moves them,
    this degrades gracefully to ``semi_join_prune`` — a fully public
    broadcast distinct-key semi-join prefilter with the same
    keeps-all-true-matches contract (stricter, in fact: zero false
    positives) — instead of raising at call time.
    """
    spark = probe.sparkSession
    if not _native_bloom_available(spark):
        return semi_join_prune(probe, build, probe_key, build_key)
    jvm = spark._jvm
    hashed = build.select(F.xxhash64(build_key).alias("__bloom_key"))
    jbloom = hashed._jdf.stat().bloomFilter("__bloom_key", expected_items, fpp)
    out = jvm.java.io.ByteArrayOutputStream()
    jbloom.writeTo(out)
    blob = bytearray(out.toByteArray())

    from pyspark.sql.classic.column import Column as _ClassicColumn

    expr_of = jvm.org.apache.spark.sql.classic.ExpressionUtils
    might_contain = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        expr_of.expression(F.lit(blob)._jc),
        expr_of.expression(F.xxhash64(probe_key)._jc),
    )
    keep = F.col(probe_key).isNotNull() & _ClassicColumn(expr_of.column(might_contain))
    return probe.filter(keep)


def semi_join_prune(
    probe: DataFrame, build: DataFrame, probe_key: str, build_key: str
) -> DataFrame:
    """Public-API fallback for ``bloom_prune_probe``: broadcast the build
    side's DISTINCT keys and left-semi join the probe against them.

    Same contract (every true match kept, NULL probe keys dropped —
    leftsemi on an equi-condition never matches NULL) and exact rather
    than approximate. The distinct-key list must fit the broadcast
    threshold, which holds whenever bloom pruning is worthwhile (a
    selective small build side); a build side too big to broadcast is one
    the bloom filter also wouldn't be built from.
    """
    keys = build.select(F.col(build_key).alias("__prune_key")).distinct()
    return probe.join(
        F.broadcast(keys), F.col(probe_key) == F.col("__prune_key"), "leftsemi"
    )


def hll_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    lg_config_k: int = 12,
    sketch_alias: str = "uniques_sketch",
) -> DataFrame:
    """Pre-aggregate distinct counts as PERSISTED, MERGEABLE HLL sketches
    (Apache DataSketches via Spark's ``hll_sketch_agg``): one binary
    sketch per group, storable in parquet next to the rollup's other
    measures. This is the 100 TB distinct-count serving pattern — daily
    sketches are built once from the raw scan, and any coarser rollup
    (weekly, monthly, all-time, cross-region) comes from
    ``hll_merge_estimate`` over the STORED sketches, never another pass
    over raw data; exact distinct cannot do this because distinct sets
    don't merge without the original values."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_config_k)).alias(sketch_alias)
    )


def hll_merge_estimate(
    rollup: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "uniques_sketch",
    estimate_alias: str = "approx_uniques",
) -> DataFrame:
    """Merge stored HLL sketches up to a coarser grouping and estimate:
    ``hll_union_agg`` is associative and order-independent, so the
    estimate from merged daily sketches equals the estimate of a direct
    sketch over the union of the raw data — the invariant the tests
    bound against exact counts."""
    return rollup.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
            estimate_alias
        )
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    support_permille: int = 5,
    count_alias: str = "n_occurrences",
    total: int | None = None,
) -> DataFrame:
    """EXACT frequent items at sketch cost: every value of ``col`` whose
    occurrence count is >= support_permille/1000 of the total row count,
    with its exact count — the boilerplate/overrepresented-token detector
    a training-data pipeline runs on corpus-scale token streams, where a
    plain groupBy would shuffle every distinct value.

    Two data passes (plus one ``count()`` unless ``total`` is supplied),
    all scale-safe:
    1. CANDIDATES: ``df.stat.freqItems`` — Spark's single-pass Karp-style
       frequent-items summary (JVM-side, map-combined, constant space per
       partition). Its contract is "superset of everything above support,
       possibly false positives"; called at HALF the target support so
       boundary items can't be strict-inequality'd out. The driver holds
       only the candidate list, bounded by 2000/support_permille items by
       the algorithm's invariant — a count-bounded collect, same class as
       the union-find guard in operators/dedup.py.
    2. VERIFY: one aggregation over rows matching the candidate list (an
       ``isin`` that inlines into codegen and pushes to the scan — rows
       of non-candidate values never reach the shuffle; a frequent NULL
       surfaces as a None candidate and is re-admitted via ``isNull()``
       because SQL ``IN`` never matches NULL), keeping
       ``n * 1000 >= support_permille * total``. Because candidates are a
       superset, the output is EXACTLY the >= threshold set with exact
       counts — which is what makes this sketch-built operator fully
       SQL-oracle-able (integer-arithmetic threshold, no float dispute).

    Returns (col, n_occurrences, share_permille) where share_permille is
    the exact integer floor(n*1000/total).

    Pass ``total`` (the exact row count) when the caller can derive it
    more cheaply than scanning ``df`` — e.g. a token stream's total is
    one separator-count aggregate over the UN-exploded documents — which
    drops this operator from three actions over ``df`` to two (the
    candidate sweep and the verify aggregate; without it a third
    ``count()`` pass re-executes ``df``'s full upstream plan).
    """
    if not 1 <= support_permille <= 1000:
        raise ValueError(f"support_permille must be in [1, 1000], got {support_permille}")
    if total is None:
        total = df.count()
    if total == 0:
        return (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias(count_alias))
            .withColumn("share_permille", F.lit(0).cast("long"))
            .limit(0)
        )
    cands = df.stat.freqItems([col], max(1e-4, support_permille / 2000.0)).first()[0]
    # isin() never matches NULL (three-valued logic), so a NULL share
    # above threshold must be re-admitted explicitly; freqItems reports
    # NULL as a None candidate when it is frequent. An empty candidate
    # list means nothing can be above half-support — short-circuit to an
    # empty result instead of shipping an always-false filter.
    non_null = [c for c in cands if c is not None]
    keep = F.col(col).isin(non_null) if non_null else F.lit(False)
    if len(non_null) < len(cands):  # None was among the candidates
        keep = keep | F.col(col).isNull()
    return (
        df.filter(keep)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .filter(F.col(count_alias) * 1000 >= F.lit(support_permille) * F.lit(total))
        .withColumn(
            "share_permille",
            (F.col(count_alias) * 1000 / F.lit(total)).cast("long"),
        )
    )


#: Per-JVM capability cache: None = unprobed, else bool.
_NATIVE_BLOOM_OK: bool | None = None


def _native_bloom_available(spark) -> bool:
    """Probe (once) every non-public surface the native bloom path needs;
    any missing piece flips the whole path to the public fallback."""
    global _NATIVE_BLOOM_OK
    if _NATIVE_BLOOM_OK is None:
        try:
            from pyspark.sql.classic.column import Column  # noqa: F401

            jvm = spark._jvm
            expr_of = jvm.org.apache.spark.sql.classic.ExpressionUtils
            # py4j resolves lazily: force both lookups to prove they exist
            probe_expr = expr_of.expression(F.lit(1)._jc)
            jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
                probe_expr, probe_expr
            )
            _NATIVE_BLOOM_OK = True
        except Exception:
            _NATIVE_BLOOM_OK = False
    return _NATIVE_BLOOM_OK


def hll_audit(
    df: DataFrame,
    group_col: str,
    key_col: str,
    lg_m: int = 6,
) -> DataFrame:
    """Cross-engine DETERMINISTIC HyperLogLog accuracy audit: per
    ``group_col``, the exact distinct ``key_col`` count next to a raw
    HLL estimate built from md5-fold32 register assignments — unlike
    the engine-native sketches above (``approx_distinct``,
    ``hll_rollup``), every register value here is reproducible bit-
    for-bit in any SQL engine, so THIS one is oracle-checkable.

    Construction (m = 2^lg_m registers over the 32-bit fold): the top
    ``lg_m`` hash bits pick the register, rho = 1 + leading-zero count
    of the remaining ``32-lg_m`` bits (exact via bit-length:
    rho = (32-lg_m) + 1 - length(bin(suffix)), all-zero suffix =>
    rho = 33-lg_m), register = max rho. The harmonic mean is computed
    in EXACT integers by scaling through 2^(33-lg_m):
    S = sum_j 2^((33-lg_m) - M_j) (empty register: M=0 contributes the
    full 2^(33-lg_m)), estimate = (alpha_permille * m^2 * 2^(33-lg_m))
    div (1000 * S) — one integer division at the end, no floats, no
    transcendentals (alpha is a precomputed permille literal; the
    small-range linear-counting correction needs ln so the audit
    reports the RAW estimator, which is the regime a 100-TB distinct
    count lives in anyway). Output per group: ``n_exact``,
    ``hll_estimate``, ``err_permille`` (absolute, vs exact).

    Scale shape: one (group, register) aggregate over the hashed
    stream (map-side combined, group x m rows), a broadcast
    group-by-group exact distinct for the audit column, and the m-row
    register fold per group. The ESTIMATOR alone is one linear pass at
    any scale; the exact side exists because this is an audit.
    """
    if not 4 <= lg_m <= 12:
        raise ValueError("hll_audit: lg_m must be in [4, 12]")
    from etl_pipeline_challenge_aladia_spark.functions.hashing import (
        md5_fold32_col,
    )

    m = 1 << lg_m
    suffix_bits = 32 - lg_m
    # alpha_m = 0.7213 / (1 + 1.079/m), permille, precomputed literals
    # (no transcendental in-engine; values from the HLL paper)
    alpha_pm = {16: 673, 32: 697, 64: 709}.get(m, 721)
    g = F.col(group_col).alias("grp")
    hashed = df.select(
        g, md5_fold32_col(F.col(key_col).cast("string")).alias("h")
    )
    sfx = 1 << suffix_bits
    regs = (
        hashed.select(
            "grp",
            F.expr(f"h div {sfx}").cast("long").alias("reg"),
            F.expr(
                f"CASE WHEN h % {sfx} = 0 THEN {suffix_bits + 1} "
                f"ELSE {suffix_bits + 1} - length(bin(h % {sfx})) END"
            )
            .cast("long")
            .alias("rho"),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    # densify: every group needs all m registers (empty => M=0)
    grid = (
        df.select(g).distinct().select(
            "grp",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("reg"),
        )
    )
    folded = (
        grid.join(regs, ["grp", "reg"], "left")
        .select(
            "grp",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST("
                f"{suffix_bits + 1} - coalesce(m_j, CAST(0 AS BIGINT))"
                f" AS INT))"
            ).alias("term"),
        )
        .groupBy("grp")
        .agg(F.sum("term").cast("long").alias("s"))
    )
    exact = df.groupBy(g).agg(
        F.countDistinct(key_col).cast("long").alias("n_exact")
    )
    num = alpha_pm * m * m * (1 << (suffix_bits + 1))
    return (
        exact.join(folded, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            F.expr(f"CAST({num} AS BIGINT) div (1000 * s)")
            .cast("long")
            .alias("hll_estimate"),
        )
        .withColumn(
            "err_permille",
            F.expr(
                "(abs(hll_estimate - n_exact) * 1000) div n_exact"
            ).cast("long"),
        )
    )


def bloom_audit(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> DataFrame:
    """Deterministic Bloom-filter false-positive audit — the measured
    answer to "is this filter budget worth shipping?" before a Bloom
    prune (``bloom_prune_probe``) is trusted at 100 TB.

    Builds an ``m_bits``-bit filter over the build side's distinct keys
    using ``k_hashes`` salted md5-fold32 positions (the engine's
    cross-engine hash — any SQL engine reproduces every bit), then
    probes it with the keys that are in ``probe`` but NOT in ``build``
    (the true negatives: anything else could legitimately match). One
    summary row: ``(n_members, n_bits_set, fill_permille,
    n_true_negatives, n_false_positives, fpr_permille)``.

    A probe key is a false positive iff EVERY one of its (distinct)
    positions is set. The observed fpr_permille tracks the classic
    fill^k expectation without ever computing a transcendental — the
    audit MEASURES instead. Scale shape: the bit table is at most
    ``m_bits`` rows regardless of corpus size, so it broadcasts to the
    probe side; the only wide shuffles are the two distinct-key
    aggregates and the per-probe-key verdict aggregate, all map-side
    combined. Unlike ``bloom_prune_probe`` (JVM treeAggregate, xxhash,
    fastest) this path is hash-reproducible, which is what an AUDIT
    needs: the measured FPR is the same number on every engine.
    """
    from etl_pipeline_challenge_aladia_spark.functions.hashing import (
        md5_fold32_col,
    )

    salts = F.explode(
        F.array(*[F.lit(i) for i in range(k_hashes)])
    ).alias("s")
    members = build.select(
        F.col(build_key).cast("long").alias("k")
    ).distinct()
    pos_of = (
        md5_fold32_col(
            F.concat(
                F.col("s").cast("string"), F.lit(":"), F.col("k").cast("string")
            )
        )
        % m_bits
    ).alias("pos")
    bits = members.select(salts, "k").select(pos_of).distinct()
    neg = (
        probe.select(F.col(probe_key).cast("long").alias("k"))
        .distinct()
        .join(members, "k", "left_anti")
    )
    ppos = neg.select(salts, "k").select("k", pos_of).distinct()
    verdict = (
        ppos.join(
            F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left"
        )
        .groupBy("k")
        .agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("_hit"), F.lit(0))))
            .cast("int")
            .alias("fp")
        )
    )
    nm = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    nb = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    nv = verdict.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_negatives"),
        F.sum("fp").cast("long").alias("n_false_positives"),
    )
    return (
        nm.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nv))
        .select(
            "n_members",
            "n_bits_set",
            F.expr(f"n_bits_set * 1000 div {m_bits}")
            .cast("long")
            .alias("fill_permille"),
            "n_true_negatives",
            "n_false_positives",
            F.expr(
                "CASE WHEN n_true_negatives = 0 THEN 0"
                " ELSE n_false_positives * 1000 div n_true_negatives END"
            )
            .cast("long")
            .alias("fpr_permille"),
        )
    )
