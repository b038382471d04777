"""Deterministic dataset splitting and sampling (north-star scope).

Every training-data pipeline needs a train/val/test split and down-sampling
that are (a) stable across runs and engines, (b) a pure function of the row
key — so re-running the pipeline, adding executors, or re-partitioning the
input never moves a document between splits. Spark's ``randomSplit`` /
``sample`` are neither (partition-dependent seeds), so these operators hash
the id instead: split membership is decided by ``md5_fold32(id) % 100``,
reproducible in any engine (functions/hashing.py carries the SQL twin).

Scale: both operators are single narrow projections/filters — zero shuffle,
fully codegen'd, trivially 100 TB-safe. The hash read ranges also compose:
``deterministic_sample(rate=0.1)`` selects a subset of the ``train`` split's
buckets, so samples are nested across rates (a 1% sample is contained in
the 10% sample) — the property curriculum/ablation runs rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.hashing import md5_fold32_col
from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up


def hash_order_col(id_col: Column | str) -> Column:
    """Stable pseudo-random priority from the stringified id — the full
    32-bit md5 fold (no modulus). Ordering by it gives every deterministic
    selection ('first k by hash') the same winners in any engine."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_fold32_col(c.cast("string"))


def hash_bucket_col(id_col: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the stringified id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(md5_fold32_col(c.cast("string")), F.lit(buckets)).cast("long")


def hash_split_col(
    id_col: Column | str, train_pct: int = 80, val_pct: int = 10
) -> Column:
    """'train' / 'val' / 'test' assignment from the id hash: buckets
    [0, train) -> train, [train, train+val) -> val, rest -> test."""
    b = hash_bucket_col(id_col, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, buckets: int = 1000
) -> DataFrame:
    """Keep rows whose id-hash bucket falls below ``rate`` — a stable,
    engine-reproducible Bernoulli-style sample (exact membership, not just
    expected rate). Nested: a lower-rate sample is a subset of a higher-rate
    one over the same ``buckets``."""
    cut = int(rate * buckets)
    return df.filter(hash_bucket_col(id_col, buckets) < cut)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    buckets: int = 1000,
) -> DataFrame:
    """Per-stratum rate sampling — the mixture-REWEIGHTING step (keep 10%
    of crawl, 100% of curated, 50% of forum...), complementing
    ``cap_per_group``'s absolute caps. Membership is the same pure
    id-hash-bucket function as ``deterministic_sample``, applied with a
    per-group cut, so it inherits every determinism property: stable
    across runs/engines/partitionings, and nested across rates per group.

    The rates table is a literal-sized frame broadcast into one equi-join
    (never a shuffle of ``df``), then a single filter — scan-shaped cost
    at any corpus size. Groups absent from ``rates`` use ``default_rate``.
    """
    spark = df.sparkSession
    rows = [(k, int(v * buckets)) for k, v in sorted(rates.items())]
    cuts = spark.createDataFrame(rows, f"{group_col} string, _cut int")
    return (
        df.join(F.broadcast(cuts), group_col, "left")
        .withColumn("_cut", F.coalesce(F.col("_cut"), F.lit(int(default_rate * buckets))))
        .filter(hash_bucket_col(id_col, buckets) < F.col("_cut"))
        .drop("_cut")
    )


def upsample_by_rate(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    buckets: int = 1000,
) -> DataFrame:
    """The UPsampling half of mixture reweighting (rates may exceed 1):
    each row is emitted ``floor(rate)`` times, plus one more iff its hash
    bucket falls under the fractional remainder — so a rate of 2.3 yields
    exactly 2 copies of every row and a deterministic, engine-stable 30%
    subset yields a third. The emitted ``epoch`` column (0-based copy
    index) keeps downstream shuffles/dedup from collapsing the copies and
    records which pass of the data each copy belongs to.

    This is how low-resource slices get > 1 epoch in a training mixture
    while the corpus stays one declarative frame: one broadcast rates
    join, one ``explode(sequence(...))`` — zero extra shuffles, linear
    output cost. Composes with ``stratified_sample`` (rates < 1) to
    express any mixture vector.
    """
    spark = df.sparkSession
    rows = [
        (g, int(r), int(round((r - int(r)) * buckets)))
        for g, r in sorted(rates.items())
    ]
    cuts = spark.createDataFrame(
        rows, f"{group_col} string, _whole int, _frac_cut int"
    )
    d_whole, d_frac = int(default_rate), int(
        round((default_rate - int(default_rate)) * buckets)
    )
    n_copies = F.col("_whole") + (
        hash_bucket_col(id_col, buckets) < F.col("_frac_cut")
    ).cast("int")
    return (
        df.join(F.broadcast(cuts), group_col, "left")
        .withColumn("_whole", F.coalesce(F.col("_whole"), F.lit(d_whole)))
        .withColumn("_frac_cut", F.coalesce(F.col("_frac_cut"), F.lit(d_frac)))
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_whole", "_frac_cut", "_n")
        .withColumn("epoch", F.col("epoch").cast("long"))
    )


def cap_per_group(
    df: DataFrame, group_col: str, cap: int, id_col: str
) -> DataFrame:
    """Domain capping / stratified down-sampling: keep at most ``cap`` rows
    per group, chosen deterministically by id-hash priority (ties broken by
    the id itself).

    The mixture-balancing step of a training pipeline — no single domain /
    language / source may dominate the corpus. Hash-priority selection
    keeps the survivors a pure function of the ids: adding or removing
    OTHER rows of a group only ever swaps the boundary rows, never
    reshuffles the whole selection, and any engine picks the same winners.
    One hash-partition shuffle on the group key; the rank<=cap filter is
    recognized by Spark's WindowGroupLimit rule, which prunes each group to
    its top ``cap`` rows map-side BEFORE the exchange — so at 100 TB the
    shuffle carries at most cap rows per group per input partition, not
    the whole corpus.
    """
    w = Window.partitionBy(group_col).orderBy(hash_order_col(id_col), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )

def length_buckets(
    docs: DataFrame,
    n_buckets: int = 10,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Equal-mass token-length buckets per corpus slice: ntile over
    ``(n_tokens, id)`` within each ``group_col``, summarized as
    ``(group, bucket, n_docs, min_tokens, max_tokens, avg_tokens)`` — the
    length-distribution audit that sizes packing/chunking and exposes
    truncation-heavy slices before training.

    The ntile window partitions BY GROUP (one sort per slice, parallel
    across slices, never global); the unique ``(n_tokens, id)`` order
    makes bucket membership deterministic across engines. For a single
    giant slice at 100 TB the same summary comes from approx-quantile
    boundaries + a range bucket join instead — the per-group exact form
    here is the audit-grade variant.
    """
    from etl_pipeline_challenge_aladia_spark.operators.text import token_count_col

    w = Window.partitionBy("grp").orderBy(F.col("n_tokens"), F.col(id_col))
    d = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col),
        token_count_col(text_col).alias("n_tokens"),
    ).withColumn("bucket", F.ntile(n_buckets).over(w).cast("long"))
    return (
        d.groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            round_half_up(F.avg("n_tokens"), 2).alias("avg_tokens"),
        )
        .withColumnRenamed("grp", group_col)
    )

def keep_above_group_median(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group summary of a keep-above-median filter: for each group the
    LOWER MEDIAN of ``score_col`` (the element at row ceil(n/2) in
    ``(score, id)`` order — an actual data value, no interpolation, so the
    cut is deterministic in any engine) and how many rows sit strictly
    above it. Returns ``(group, n_rows, median_score, n_kept)``.

    This is the per-slice adaptive quality cut (keep the better half of
    every language/domain) as opposed to a global threshold, which
    over-prunes low-resource slices. One window per group (rank) + one
    aggregation; group partitions bound the sort — no global ordering.
    """
    w = Window.partitionBy("grp").orderBy(F.col("sc"), F.col("rid"))
    wc = Window.partitionBy("grp")
    d = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(score_col).alias("sc"),
            F.col(id_col).alias("rid"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
    )
    # the lower-median row of each group; group-count-sized frame, so the
    # join back is AQE-broadcastable at any corpus size
    # floor() explicitly: engines disagree on float->int CAST rounding
    # (truncate vs half-away), and (n+1)/2 is x.5 for even groups
    med = d.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("long")).select(
        "grp", F.col("sc").alias("median_score")
    )
    return (
        d.join(med, "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max("median_score").alias("median_score"),
            F.sum(F.when(F.col("sc") > F.col("median_score"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .withColumnRenamed("grp", group_col)
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Train/val/test split by NEAR-DUP CLUSTER, not by document — the
    contamination fix ``hash_split_col`` alone cannot give: when two
    near-identical documents hash into different splits, the model is
    evaluated on paraphrases of its own training data and the benchmark
    silently inflates. Here every document's split is decided by the
    min-id representative of its connected near-dup component (``pairs``
    from any detector: MinHash, SimHash, embedding cosine), so near-dups
    land in the SAME split by construction; documents in no pair fall
    back to their own id — bitwise identical to ``hash_split_col`` for
    the clean majority, preserving split stability when the pair set
    evolves.

    Scale: clusters exist only for documents that appear in a pair — a
    vanishing fraction of a deduplicated corpus — so the left join is a
    broadcast of the small cluster table against the corpus scan; the
    assignment itself stays the pure zero-shuffle hash function. Output:
    ``docs`` columns + (rep_id, split).
    """
    from etl_pipeline_challenge_aladia_spark.operators.dedup import dedup_clusters

    # rep_id/split are this operator's output contract; _lss_cluster_id
    # is internal and uniquified so a caller-side cluster_id column is
    # neither shadowed in the join nor dropped on the way out
    clash = {"rep_id", "split", "_lss_cluster_id"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"leakage_safe_split output/internal columns already present "
            f"in docs: {sorted(clash)}"
        )
    clusters = dedup_clusters(pairs).select(
        F.col("id").alias(id_col), F.col("cluster_id").alias("_lss_cluster_id")
    )
    # rep keeps the id column's NATIVE type (cluster_id inherits it from
    # dedup_clusters): casting to long would silently NULL string ids and
    # collapse every document's split to the .otherwise() branch
    rep = F.coalesce(F.col("_lss_cluster_id"), F.col(id_col))
    return (
        docs.join(F.broadcast(clusters), id_col, "left")
        .withColumn("rep_id", rep)
        .withColumn(
            "split", hash_split_col(F.col("rep_id"), train_pct, val_pct)
        )
        .drop("_lss_cluster_id")
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Select documents per group until a TOKEN budget is exhausted — the
    mixture-building step when the target is 'this many training tokens
    per source/language', not 'this fraction of documents' (rate-based
    sampling over-serves slices with long documents).

    Candidates are ordered by the deterministic id-hash priority (ties by
    id), then kept while the running token total stays within ``budget``
    — pure integer arithmetic end to end, so selection is stable across
    runs, engines, and partitionings, and (like the rate samplers) NESTED:
    a smaller budget selects a prefix of a larger budget's picks.

    Scale: one hash-partition shuffle on the group key, then a per-group
    ordered sweep for the running sum — groups process in parallel and
    nothing global sorts. Output: the selected rows of ``df`` plus
    ``n_tokens`` and the running ``cum_tokens`` that admitted each row.
    """
    from etl_pipeline_challenge_aladia_spark.operators.text import token_count_col

    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_order_col(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", token_count_col(text_col))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )
