"""Corpus term statistics for training-data curation: TF-IDF keyword
extraction, vocabulary/Zipf profiles, inverted posting lists, and bigram
collocation strength.

All four are classic "understand the corpus before you train on it"
passes. Every operator is explode + hash-aggregate + (bounded) window —
JVM column expressions only, no Python in the row loop. Windows are
partitioned by document or run over vocabulary-sized aggregates, never
over the raw corpus, so each stage is one linear shuffle at 100 TB.

Determinism contract (shared with the DuckDB oracles in plans/queries.py):
scores are ratios of exact integer counts computed with the same IEEE
operation order on both engines — no transcendental functions (ln-based
idf/PMI is replaced by the monotone-equivalent count ratio), so rank
order and rounded values are reproducible bit-for-bit cross-engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.hashing import md5_fold32_col
from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up
from etl_pipeline_challenge_aladia_spark.operators.text import (
    ngrams_col,
    shingles_col,
    tokens_col,
)
from etl_pipeline_challenge_aladia_spark.sources.files import fan_out


def _term_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # NO fan_out here, on measurement: a plain split-on-space explode is
    # cheap enough that the round-robin exchange costs MORE than the
    # single-task projection it parallelizes (tfidf/vocab/bm25 each ran
    # ~0.6 s slower with it in both full bench runs). The SHINGLE-based
    # operators (ngram_novelty, inverted_shingle_index, bigram_lift) keep
    # their fan_out — there the projection is the measured bottleneck.
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` characteristic terms per document, scored by
    tf * (N / df) — the monotone count-ratio form of tf-idf (same ranking
    as tf * ln-idf for any fixed tf, no transcendental in the compare).

    Plan shape: one explode, two hash aggregations (per-doc tf, corpus
    df), one join, and a window partitioned BY DOCUMENT (never global).
    The df side is vocabulary-sized; AQE picks broadcast vs shuffle from
    its runtime size — no forced hint, since real corpora can push the
    shingle/term vocabulary past broadcast limits.
    """
    tok = _term_rows(docs, id_col, text_col)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        tok.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))  # single-row frame
        .withColumn(
            "score", (F.col("tf").cast("double") * F.col("n_docs")) / F.col("df")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "rnk", round_half_up(F.col("score"), 4).alias("score"))
    )


def _ranked_topk(
    df: DataFrame,
    order_cols: Sequence,
    struct_fields: Sequence[tuple],
    k: int,
    rank_name: str,
) -> DataFrame:
    """Global top-k with a positional rank column, WITHOUT an
    unpartitioned row_number window: ``orderBy(*order_cols).limit(k)``
    (TakeOrderedAndProject — per-partition heaps, k rows across the
    final exchange), then the k-row result is packed into a sorted
    struct array and posexploded, so rank = array position. The struct
    sorted ASCENDING must reproduce ``order_cols``' ordering including
    tie-breaks (callers negate descending keys); fields whose alias
    starts with '_' are sort-only and excluded from the output."""
    top = df.orderBy(*order_cols).limit(k)
    packed = top.agg(
        F.array_sort(
            F.collect_list(F.struct(*[c.alias(a) for c, a in struct_fields]))
        ).alias("_top")
    )
    return packed.select(F.posexplode("_top").alias("_i", "_s")).select(
        (F.col("_i") + 1).cast("long").alias(rank_name),
        *[
            F.col(f"_s.{a}").alias(a)
            for _, a in struct_fields
            if not a.startswith("_")
        ],
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary profile: the ``k`` most frequent tokens with
    document frequency, occurrence count, rank, and corpus share — the
    Zipf-curve head every tokenizer/mixture audit starts from.

    One explode + one hash aggregation over the corpus; the top-k is
    ``orderBy().limit(k)`` — TakeOrderedAndProject over the VOCABULARY
    aggregate (per-partition top-k heaps, k rows cross the exchange),
    never a single-partition row_number over all |V| rows. Rank is then
    recovered positionally from the k-row result (the same
    sort-key-struct + posexplode pattern as the kmeans init), so no
    unpartitioned WindowExec appears anywhere in the plan.
    """
    tok = _term_rows(docs, id_col, text_col)
    counts = tok.groupBy(F.col("term").alias("token")).agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    total = counts.agg(F.sum("n_occ").cast("double").alias("total"))
    scored = counts.crossJoin(F.broadcast(total)).withColumn(  # single-row frame
        "share", round_half_up(F.col("n_occ").cast("double") / F.col("total"), 4)
    )
    return _ranked_topk(
        scored,
        order_cols=[F.col("n_occ").desc(), F.col("token")],
        struct_fields=[
            (-F.col("n_occ"), "_neg"),
            (F.col("token"), "token"),
            (F.col("df"), "df"),
            (F.col("n_occ"), "n_occ"),
            (F.col("share"), "share"),
        ],
        k=k,
        rank_name="rank",
    )


def inverted_shingle_index(
    docs: DataFrame,
    min_df: int = 2,
    max_df: int = 5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted index over word n-gram shingles, keeping rare postings
    (``min_df <= df <= max_df``): shingle -> sorted comma-joined doc ids.

    The retrieval-side building block for substring-level decontamination
    and provenance lookups. df-bounded posting lists keep each output row
    O(max_df); the frequency cap is also what makes the index scale-safe —
    boilerplate shingles with huge posting lists are exactly the ones the
    filter drops. One explode + one hash aggregation; collect_list is
    bounded by ``max_df`` per group (the HAVING prunes, the sort is
    per-row on <= max_df elements).
    """
    # fan_out BEFORE the shingle explode (see _term_rows)
    ex = fan_out(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    ).select(
        "doc_id",
        F.explode(shingles_col(tokens_col("_t"), n)).alias("shingle"),
    )
    grouped = ex.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("_ids"),
    )
    return (
        grouped.filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
        .select(
            "shingle",
            "df",
            F.array_join(
                F.transform(F.col("_ids"), lambda x: x.cast("string")), ","
            ).alias("postings"),
        )
    )


def bigram_lift(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` bigram collocations by lift = P(w1 w2) / (P(w1) P(w2)),
    computed as the integer-count ratio (c_ab * N) / (c_a * c_b) — the
    monotone-equivalent of PMI without the logarithm, so cross-engine
    ordering is exact. ``min_count`` suppresses noise collocations.

    Two explodes (bigrams, unigrams) + three hash aggregations; the
    unigram count table is vocabulary-sized, so the two count joins are
    AQE-broadcastable. The top-k is ``orderBy().limit(k)`` over the
    filtered collocation table (TakeOrderedAndProject — per-partition
    heaps, k rows to one task) with rank recovered positionally, never
    a single-partition row_number over all collocations.
    """
    # fan_out BEFORE the tokenize (see _term_rows): both explode branches
    # read the shuffled skinny text rows, not the single-task scan
    words = fan_out(docs.select(F.col(text_col).alias("_t"))).select(
        tokens_col("_t").alias("w")
    )
    bg = words.select(F.explode(ngrams_col(F.col("w"), 2)).alias("bigram"))
    cb = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = words.select(F.explode("w").alias("wd"))
    cu = uni.groupBy("wd").agg(F.count(F.lit(1)).alias("c_w"))
    tot = cu.agg(F.sum("c_w").cast("double").alias("n"))
    a = cu.withColumnsRenamed({"wd": "_w1", "c_w": "c_a"})
    b = cu.withColumnsRenamed({"wd": "_w2", "c_w": "c_b"})
    scored = (
        cb.filter(F.col("c_ab") >= min_count)
        .withColumn("_w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("_w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
        .join(a, "_w1")
        .join(b, "_w2")
        .crossJoin(F.broadcast(tot))  # single-row frame
        .withColumn(
            "lift",
            (F.col("c_ab").cast("double") * F.col("n"))
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double")),
        )
    )
    return _ranked_topk(
        scored,
        # sort by the UNROUNDED lift (the original window's ordering);
        # the emitted value is the rounded one
        order_cols=[F.col("lift").desc(), F.col("bigram")],
        struct_fields=[
            (-F.col("lift"), "_neg"),
            (F.col("bigram"), "bigram"),
            (F.col("c_ab"), "c_ab"),
            (round_half_up(F.col("lift"), 4), "lift"),
        ],
        k=k,
        rank_name="rnk",
    )

def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25 ranking —
    the retrieval pass of quality-by-example curation (rank a corpus
    against a trusted seed query, keep the head).

    Two determinism choices, mirrored by the SQL oracle:

    - idf is the rational Robertson form ``(N - df + 0.5) / (df + 0.5)``
      WITHOUT the log — a monotone transform per term, no transcendental,
      so cross-engine values are exact;
    - per-term contributions are fixed-pointed to 1e-6 (``floor(x*1e6 +
      0.5)`` as int64) before the per-document sum, making the sum
      associative — Spark's partial-agg order cannot drift from the
      oracle's sequential fold.

    Plan shape: the token stream is filtered to the query's terms BEFORE
    any aggregation (the per-(doc, term) tf table carries only query
    terms), df/N/avgdl are single-row or |terms|-row frames joined by
    broadcast, and the final top-k is a global TakeOrdered (no full sort).
    Scale-safe at 100 TB: everything after the scan is proportional to
    documents-containing-query-terms, not corpus size.
    """
    tok = _term_rows(docs, id_col, text_col)
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("dl"),
    )
    g = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    qt = [str(t) for t in query_terms]
    tf = (
        tok.filter(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_part = (F.col("tf") * (k1l + F.lit(1.0))) / (
        F.col("tf")
        + k1l * (F.lit(1.0) - bl + bl * F.col("dl").cast("double") / F.col("avgdl"))
    )
    contrib = F.floor(idf * tf_part * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    scored = (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))  # single-row frame
        .withColumn("_sfx", contrib)
        .groupBy("doc_id")
        .agg(
            (F.sum("_sfx").cast("double") / F.lit(1000000.0)).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(k)


def token_diversity(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-slice lexical diversity via the Simpson index
    ``1 - sum(tf^2) / n^2`` over each document's token distribution —
    the repetition-collapse signal (template/spam pages score near 0,
    varied prose near 1) computed WITHOUT logarithms: entropy's usual
    ``p log p`` is transcendental and engines disagree in the last ulp,
    while this rational form is exact integer arithmetic until one final
    division.

    Per-document indexes are fixed-pointed to 1e-6 before the per-slice
    mean, so the aggregate is an order-independent integer sum. One
    explode + two hash aggregations; the final frame is slice-sized.
    """
    tok = _term_rows(docs.withColumnRenamed(id_col, "doc_id"), "doc_id", text_col)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n"), F.sum(F.col("tf") * F.col("tf")).alias("s2")
    )
    div = F.lit(1.0) - F.col("s2").cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    d6 = F.floor(div * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    grp = docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp"))
    return (
        per_doc.withColumn("d6", d6)
        .join(grp, "doc_id")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            round_half_up(
                F.sum("d6").cast("double") / F.lit(1000000.0) / F.count(F.lit(1)), 6
            ).alias("avg_diversity"),
        )
        .withColumnRenamed("grp", group_col)
    )


def bits_col(c: Column) -> Column:
    """Exact floor-log2 + 1 of a positive integer column: the length of
    its binary representation. Integer-exact in any engine (DuckDB:
    ``length(bin(x))``) — the transcendental-free building block for
    information-content scores."""
    return F.length(F.bin(c)).cast("long")


def unigram_surprisal(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most 'surprising' documents under a corpus unigram model —
    the CCNet/perplexity-style quality signal, with the log replaced by
    exact integer bit-lengths so the score is engine-reproducible.

    Per token, surprisal ~= log2(T / c) where T is the corpus token count
    and c the token's occurrence count; here it is computed as
    ``bits(T) - bits(c)`` (floor-log2 within +-1 of the real value — the
    ranking signal survives, the transcendental does not). A document's
    score is its mean per-token surprisal: high = rare-token-dense
    (misspellings, codes, noise, or genuinely novel text), low =
    boilerplate built from corpus heavy-hitters. Pre-training pipelines
    cut both tails.

    Shape: one explode -> vocabulary hash-aggregate (map-side partials,
    |V| rows) -> vocab joined back onto the token stream -> one
    per-document aggregate -> global top-k (TakeOrderedAndProject, k rows
    to the driver stage). The corpus shuffles once, keyed by document.
    The vocab join carries no forced broadcast hint: like
    ``tfidf_top_terms`` above, real corpora can push |V| past broadcast
    limits, so AQE picks BHJ when the vocabulary is small and SMJ when
    it is not; only the single-row total is hint-broadcast.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n_occ"))
    total = vocab.agg(F.sum("n_occ").cast("long").alias("total"))
    scored = (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "grp",
            (bits_col(F.col("total")) - bits_col(F.col("n_occ"))).alias("bits"),
        )
    )
    # group on (doc_id, grp) rather than any_value(grp): grp is per-doc
    # constant, and a string-buffered any_value would demote the aggregate
    # from HashAggregate to SortAggregate (per-partition sort at scale)
    per_doc = scored.groupBy("doc_id", F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("bits").cast("long").alias("total_bits"),
    )
    ranked = per_doc.select(
        "doc_id",
        group_col,
        "n_tokens",
        "total_bits",
        round_half_up(
            F.col("total_bits").cast("double") / F.col("n_tokens").cast("double"), 4
        ).alias("avg_bits"),
    )
    return ranked.orderBy(F.col("avg_bits").desc(), F.col("doc_id")).limit(k)


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-slice n-gram novelty: of each document's distinct word
    n-grams, the fraction whose FIRST corpus occurrence (minimum doc id)
    is that document. Sources full of re-hashed/templated text score
    low; sources contributing genuinely new phrasing score high — the
    incremental-value signal dedup rates alone miss (a doc can be 0%
    exact-duplicate yet 0% novel).

    Shape: distinct-shingle explode -> min(doc_id) per shingle (map-side
    combinable, shingle-vocabulary-sized result) -> join back -> two
    slice-sized aggregates. The min-per-shingle frame is the same scale
    class as the inverted index; novelty attribution by minimum id is
    deterministic in any engine (no randomness, no floats until the
    final ratio).
    """
    # fan_out BEFORE the shingle explode (see _term_rows)
    grams = fan_out(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).alias("grp"),
            F.col(text_col).alias("_t"),
        )
    ).select(
        "doc_id",
        "grp",
        F.explode(shingles_col(tokens_col("_t"), n)).alias("shingle"),
    )
    first = grams.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "shingle")
        .groupBy("grp")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("long"))
            .cast("long")
            .alias("n_novel"),
            round_half_up(
                F.sum((F.col("doc_id") == F.col("first_doc")).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("novelty_rate"),
        )
        .withColumnRenamed("grp", group_col)
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 100,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary token rate per corpus slice against the corpus'
    own top-``vocab_size`` tokens (by occurrence count, ties broken by
    token text) — the tokenizer-coverage audit run before committing to
    a vocabulary: a slice with a high OOV share will fragment into
    byte-fallback tokens and train poorly.

    Shape: one vocabulary aggregate, a ``vocab_size``-row top-k, then a
    broadcast LEFT join of the token stream against the vocab and one
    slice-sized aggregate. The corpus is never shuffled — the only wide
    exchange is the map-side-combined vocabulary count.
    """
    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(tokens_col(text_col)).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), F.col("term"))
        .limit(vocab_size)
        .select("term", F.lit(True).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_tokens"),
            F.sum(F.col("_in_vocab").isNull().cast("long"))
            .cast("long")
            .alias("oov_tokens"),
            round_half_up(
                F.sum(F.col("_in_vocab").isNull().cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("oov_share"),
        )
        .withColumnRenamed("grp", group_col)
    )


def _deletion_variants(c, max_edits: int):
    """All strings reachable from column ``c`` by deleting up to
    ``max_edits`` characters (SymSpell deletion neighborhood), self
    included, duplicates removed. Pure column expressions — the variant
    arrays are built per row inside codegen, never in Python."""
    L = F.length(c)
    parts = [F.array(c)]
    d1 = F.when(
        L >= 1,
        F.transform(
            F.sequence(F.lit(0), L - 1),
            lambda i: F.concat(c.substr(F.lit(1), i), c.substr(i + 2, L)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    parts.append(d1)
    if max_edits >= 2:
        d2 = F.when(
            L >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), L - 2),
                    lambda i: F.transform(
                        F.sequence(i + 1, L - 1),
                        lambda j: F.concat(
                            c.substr(F.lit(1), i),
                            c.substr(i + 2, j - i - 1),
                            c.substr(j + 2, L),
                        ),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(d2)
    return F.array_distinct(F.concat(*parts))


def symspell_vocab_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_edits: int = 2,
) -> DataFrame:
    """Vocabulary typo-pair mining by SymSpell deletion-neighborhood
    blocking: every token pair within Levenshtein distance
    ``max_edits``, with both occurrence counts (the higher-frequency
    side is the likely canonical spelling, the lower the typo — the
    normalization table a curation pass applies before dedup and
    tokenizer training).

    Scale shape: the corpus collapses to its VOCABULARY first (one
    explode + hash agg), so everything downstream is vocab-sized, not
    corpus-sized. Blocking is the SymSpell deletion trick: if
    lev(a, b) <= d then a and b share a string reachable by deleting
    <= d chars from each (every substitution deletes one char on both
    sides, every insert/delete one char on one side) — so joining the
    deletion neighborhoods on equality has FULL recall and the
    all-pairs O(V^2) edit-distance scan becomes a posting-list join on
    O(V * len^d) short keys. Candidates then verify with one exact
    ``levenshtein`` call per pair. Hub caveat: very short tokens
    funnel into tiny variants (a 1-char token's neighborhood includes
    the empty string), so posting lists on those keys are bounded by
    the count of short tokens — at web-corpus scale pre-filter the
    vocab to len >= 3 if that tail matters.

    Reference analog: none (north-star curation scope). Output:
    ``(tok_a, tok_b, lev, freq_a, freq_b)`` with tok_a < tok_b.
    """
    if not 1 <= max_edits <= 2:
        raise ValueError("symspell_vocab_pairs: max_edits must be 1 or 2")
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .localCheckpoint(eager=True)  # reused 3x: variants + both freq joins
    )
    var = vocab.select(
        "tok", F.explode(_deletion_variants(F.col("tok"), max_edits)).alias("v")
    )
    cand = (
        var.alias("a")
        .join(
            var.alias("b"),
            (F.col("a.v") == F.col("b.v")) & (F.col("a.tok") < F.col("b.tok")),
        )
        .select(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .distinct()
    )
    verified = cand.withColumn(
        "lev", F.levenshtein("tok_a", "tok_b").cast("long")
    ).filter(F.col("lev") <= max_edits)
    fa = vocab.select(F.col("tok").alias("tok_a"), F.col("freq").alias("freq_a"))
    fb = vocab.select(F.col("tok").alias("tok_b"), F.col("freq").alias("freq_b"))
    return verified.join(fa, "tok_a").join(fb, "tok_b").select(
        "tok_a", "tok_b", "lev", "freq_a", "freq_b"
    )


def countmin_audit(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """Count-min sketch accuracy audit: build a ``depth x width``
    count-min sketch of the token stream with deterministic salted
    md5-fold32 hash rows, then report, for the ``top_k`` most frequent
    tokens, the exact count next to the sketch estimate (min over the
    token's depth cells) and the signed overestimate — the bias a
    consumer of the sketch would see. Count-min never underestimates,
    so ``overestimate >= 0`` by construction; the audit quantifies how
    much collision inflation this (depth, width) budget costs on THIS
    corpus before anyone trusts the sketch at scale.

    Scale shape: the sketch is built from the vocabulary aggregate,
    not the raw stream — cell(r, b) = sum of exact counts of tokens
    hashing to (r, b), which is identical to streaming increments
    because the sketch update is a distributive sum. One corpus-wide
    token aggregate (map-side combined), then everything is
    vocab-sized: depth rows per term, a depth*width-cell aggregate
    (1024 cells here — driver-trivial at any corpus size), one
    cell-keyed join back, a min over depth values per term, and a
    top-k TakeOrdered. All integer; the salted hash is the
    cross-engine md5 fold, so the DuckDB oracle reproduces every cell
    bit-for-bit. Reference analog: none (north-star sketch family —
    the frequency twin of the MinHash/SimHash membership sketches).
    """
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        # vocab-sized; materialized so the corpus is scanned ONCE, not
        # once per consumer (cell build + estimate side)
        .localCheckpoint(eager=True)
    )
    hashed = vocab.select(
        "tok",
        "exact_n",
        F.posexplode(
            F.array(
                *[
                    (
                        md5_fold32_col(
                            F.concat(F.lit(f"{s}:"), F.col("tok"))
                        )
                        % F.lit(width)
                    ).cast("long")
                    for s in range(depth)
                ]
            )
        ).alias("rw", "bucket"),
    )
    cells = hashed.groupBy("rw", "bucket").agg(
        F.sum("exact_n").cast("long").alias("cell_n")
    )
    est = (
        hashed.join(cells, ["rw", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cell_n").cast("long").alias("cm_estimate"))
    )
    return (
        est.orderBy(F.desc("exact_n"), "tok")
        .limit(top_k)
        .select(
            "tok",
            "exact_n",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_n"))
            .cast("long")
            .alias("overestimate"),
            F.expr("((cm_estimate - exact_n) * 1000) div exact_n")
            .cast("long")
            .alias("overestimate_permille"),
        )
    )
