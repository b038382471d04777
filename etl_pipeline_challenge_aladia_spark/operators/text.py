"""Text-analysis operators for the large-scale training-data pipeline
(north-star scope, BASELINE.json): token statistics, quality scoring,
shingling, and document fingerprinting over the ``documents`` table.

Everything is built from JVM-side column expressions (split / transform /
aggregate / filter higher-order functions) — no Python UDFs — so the whole
stage codegens and scales linearly with input splits. The arithmetic is
chosen to be reproducible in any engine (see the paired DuckDB oracles in
plans/queries.py): ascii/length-based token hashing and an explicit
modular polynomial fold instead of engine-specific hash builtins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Stopwords present in the synthetic corpus vocabulary.
STOPWORDS = ("the", "a")

_MOD = 2_147_483_647  # 2^31 - 1
_MULT = 1_000_003


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization (single-space-joined corpus)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count_col(text: Column | str) -> Column:
    """Token count via separator counting — avoids materializing the array
    when only the count is needed: (len - len(without spaces)) + 1."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, " ", "")) + 1).cast("long")


def stopword_count_col(words: Column) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("long")


def unique_count_col(words: Column) -> Column:
    return F.size(F.array_distinct(words)).cast("long")


def quality_score_col(n_unique: Column, n_tokens: Column, n_stop: Column) -> Column:
    """Heuristic quality in [0, 1]: lexical diversity damped by stopword
    density — unique_ratio * (1 - stop_ratio). Deterministic double
    arithmetic from integer counts."""
    t = n_tokens.cast("double")
    return (n_unique.cast("double") / t) * (F.lit(1.0) - n_stop.cast("double") / t)


def ngrams_col(words: Column, n: int = 3) -> Column:
    """All word n-grams of an array<string> column, in order, duplicates
    kept. Docs shorter than n tokens yield an empty list (Spark's
    ``sequence`` would otherwise descend for negative spans)."""
    joined = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(words) >= n, joined).otherwise(empty)


def shingles_col(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of an array<string> column."""
    return F.array_distinct(ngrams_col(words, n))


def repetition_ratio_col(words: Column, n: int = 2) -> Column:
    """Fraction of within-document n-gram occurrences that are repeats:
    1 - distinct/total, in [0, 1); 0.0 for docs shorter than n tokens.

    The Gopher-style repetition quality signal — high values flag looping
    generators, boilerplate, and degenerate text before training. Pure
    higher-order-function arithmetic on the token array: no explode, no
    shuffle, codegen'd per row. The n-gram list is referenced three times
    (count, distinct-count, emptiness guard); wrapping it in a
    single-element array and scoring inside ``transform`` binds it to the
    lambda variable so it is BUILT ONCE per row — inlining it directly
    would re-evaluate the construction per reference (measured 2x on the
    bench corpus, since CollapseProject duplicates non-trivial exprs).
    """
    score = F.transform(
        F.array(ngrams_col(words, n)),
        lambda g: F.when(
            F.size(g) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(g)).cast("double") / F.size(g).cast("double"),
        ).otherwise(F.lit(0.0)),
    )
    return F.element_at(score, 1)


def token_hash_col(w: Column) -> Column:
    """Cross-engine token hash: ascii(first char) * 131 + length. Collisions
    are acceptable for fingerprinting; the point is engine-independence."""
    return (F.ascii(w) * F.lit(131) + F.length(w)).cast("long")


def fingerprint_col(words: Column) -> Column:
    """Order-sensitive rolling polynomial fingerprint of the token stream:
    fold acc -> (acc * 1000003 + token_hash) mod (2^31 - 1). Stays in int64
    (acc < 2^31, * 1e6 < 2^51)."""
    return F.aggregate(
        F.transform(words, token_hash_col),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * _MULT + h) % _MOD,
    )


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach n_tokens / n_unique / n_stopwords / quality_score columns."""
    words = tokens_col(text_col)
    n_tokens = token_count_col(text_col)
    n_unique = unique_count_col(words)
    n_stop = stopword_count_col(words)
    return docs.withColumns(
        {
            "n_tokens": n_tokens,
            "n_unique": n_unique,
            "n_stopwords": n_stop,
            "quality_score": quality_score_col(n_unique, n_tokens, n_stop),
        }
    )


def stop_ratio_col(text: Column | str) -> Column:
    words = tokens_col(text)
    return stopword_count_col(words).cast("double") / token_count_col(text).cast("double")


def lang_id_col(text: Column | str, dense: float = 0.09, sparse: float = 0.05) -> Column:
    """Heuristic language ID from function-word density.

    Real language ID compares character-n-gram profiles per language; this
    corpus is a synthetic shared-vocabulary word salad, so the deterministic
    stand-in buckets documents by stopword-marker density — the same plumbing
    (pure column expr -> groupBy confusion matrix) with a trivially
    exchangeable scoring core.
    """
    r = stop_ratio_col(text)
    return (
        F.when(r >= dense, F.lit("stop_dense"))
        .when(r >= sparse, F.lit("stop_mid"))
        .otherwise(F.lit("stop_sparse"))
    )


def subword_count_col(text: Column | str) -> Column:
    """BPE-ish subword proxy count: alpha runs and digit runs as separate
    units (the regex split real BPE tokenizers apply before merges).
    Whitespace tokens (token_count_col) estimate words; this estimates
    tokenizer cost — both pure column expressions.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit("[a-z]+|[0-9]+"), 0)).cast(
        "long"
    )


#: PII patterns restricted to regex features with identical semantics in
#: Java regex (Spark) and RE2 (DuckDB/most engines): no lookaround, no
#: backreferences.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^ ]+"


def scrub_pii_col(text: Column | str) -> Column:
    """Redact emails and URLs -> '<EMAIL>' / '<URL>' placeholders.

    The standard pre-training scrub pass, as a pure column expression
    (regexp_replace is global in Spark). Chain additional patterns the same
    way; at 100 TB this stays inside whole-stage codegen — no Python.
    """
    c = F.col(text) if isinstance(text, str) else text
    no_mail = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_mail, URL_PATTERN, "<URL>")


def pii_match_count_col(text: Column | str) -> Column:
    """How many redactions ``scrub_pii_col`` applies to a document.

    Counts mirror the scrub's pass order — emails on the raw text, then
    URLs on the email-scrubbed text — so an email embedded in a URL counts
    as two redactions (both replacements happen), never double-counts one
    span, and the metric agrees with the pass it audits.
    """
    c = F.col(text) if isinstance(text, str) else text
    emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0))
    after_email = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    urls = F.size(F.regexp_extract_all(after_email, F.lit(URL_PATTERN), 0))
    return (emails + urls).cast("long")


def shingle_doc_freq(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(shingle, doc_freq): in how many documents each distinct word-n-gram
    appears — the boilerplate / heavy-hitter detector.

    Feeds two pipeline decisions: (a) the posting-list cap for the inverted
    shingle index (``similarity.ngram_jaccard_pairs`` docstring — drop
    shingles with doc_freq above a threshold so boilerplate can't inflate
    join fan-out), and (b) boilerplate stripping before training. One
    explode + one hash aggregation with map-side partials; at 100 TB the
    exact top-k over the full shingle vocabulary stays one shuffle of
    (shingle, partial-count) pairs. If only approximate heavy hitters are
    needed, swap the agg for a count-min / space-saving sketch per
    partition and merge — same plan shape, bounded state.
    """
    from etl_pipeline_challenge_aladia_spark.sources.files import fan_out

    # fan_out BEFORE the shingle explode: single-row-group testdata scans
    # run as one task, so the expensive projection must sit above the
    # round-robin exchange (no-op passthrough on wide production scans)
    return (
        fan_out(docs.select(F.col(text_col).alias("_t")))
        .select(F.explode(shingles_col(tokens_col("_t"), n)).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )


def contamination_overlap(
    train: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = False,
) -> DataFrame:
    """Benchmark decontamination: (train doc id, n_shared_shingles) for
    every training document sharing at least one word-n-gram with the
    benchmark/eval set.

    The standard pre-training decontamination pass (n-gram collision
    against held-out benchmarks). Shape: explode distinct shingles on both
    sides, inner-join on the shingle, count per train doc — one shuffle
    each side, linear in corpus size, never all-pairs. Benchmark suites
    are tiny relative to a 100 TB corpus, so set ``broadcast_bench=True``
    in production and the train side never shuffles at all; at equal-sized
    inputs (e.g. auditing a 10% test split) leave it to AQE. For very long
    shingles, hash them to 8-byte keys first (xxhash64) so the join
    shuffles fixed-width keys — kept as raw strings here so any engine
    reproduces the exact same collisions.
    """
    from etl_pipeline_challenge_aladia_spark.sources.files import fan_out

    # fan_out BEFORE the shingle explodes (see shingle_doc_freq): both
    # sides' tokenize+shingle otherwise run in the scan's single task
    tr = fan_out(
        train.select(F.col(id_col), F.col(text_col).alias("_t"))
    ).select(
        id_col,
        F.explode(shingles_col(tokens_col("_t"), n)).alias("shingle"),
    )
    te = (
        fan_out(bench.select(F.col(text_col).alias("_t")))
        .select(F.explode(shingles_col(tokens_col("_t"), n)).alias("shingle"))
        .distinct()
    )
    if broadcast_bench:
        te = F.broadcast(te)
    return (
        tr.join(te, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def chunk_plan(
    docs,
    chunk_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Documents -> fixed-size training-chunk work plan: one row per
    (doc, chunk) with its token span.

    The split step every pre-training pipeline runs before tokenization.
    Pure column math — chunk counts from the separator-count token formula,
    spans from ``sequence`` + explode — so the plan (not the text) is what
    shuffles; downstream tokenizers read only their span. Every doc yields
    at least one chunk (the token formula is >= 1 even for empty text).
    """
    n_tok = token_count_col(text_col)
    with_counts = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.ceil(n_tok / F.lit(float(chunk_tokens))).cast("long").alias("n_chunks"),
    )
    return with_counts.select(
        id_col,
        "n_tokens",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
            "chunk_id"
        ),
    ).select(
        id_col,
        "chunk_id",
        (F.col("chunk_id") * chunk_tokens).alias("start_token"),
        F.least(
            F.lit(chunk_tokens).cast("long"),
            F.col("n_tokens") - F.col("chunk_id") * chunk_tokens,
        ).alias("chunk_len"),
    )


def segments_col(toks: Column, segment_tokens: int) -> Column:
    """Consecutive non-overlapping ``segment_tokens``-token segments of a
    token array, each re-joined to its exact text — the deterministic
    segmentation shared by the batch segment-dedup audit and the
    incremental/streaming segment store."""
    n_seg = F.ceil(F.size(toks) / F.lit(float(segment_tokens))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(toks, i * segment_tokens + 1, segment_tokens), " "
        ),
    )


def segment_fingerprint_store(
    docs: DataFrame,
    segment_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Precompute the STORED form of a corpus for incremental SEGMENT
    dedup screening: the distinct set of exact segment texts — the
    paragraph-level twin of ``doc_signature_store``. A 100-TB deployment
    persists this (as 128-bit hashes; kept as text here so the DuckDB
    oracle joins on the identical key) instead of re-segmenting the
    corpus per ingest batch: each arriving batch pays only its own
    segmentation plus one key-equi join against the store. Output:
    one ``seg`` column, distinct."""
    toks = tokens_col(text_col)
    return (
        docs.select(F.explode(segments_col(toks, segment_tokens)).alias("seg"))
        .distinct()
    )


def segment_dedup_from_store(
    store: DataFrame,
    delta: DataFrame,
    segment_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_col: str = "source",
) -> DataFrame:
    """Incremental segment-dedup audit of a DELTA against a PRECOMPUTED
    segment-fingerprint store (``segment_fingerprint_store``): a delta
    segment instance is REMOVED when its exact text already exists in
    the store (the corpus already holds the canonical copy), and the
    per-``slice_col`` rollup reports how many segments/tokens the
    ingest screen would strip — the same output shape as
    ``segment_dedup_stats`` but delta-only cost: one explode over the
    delta, one key-equi left join against the store (corpus text never
    re-read), one slice-sized rollup. Within-delta duplicates are NOT
    removed here — they are screened when the next batch arrives and
    this batch's segments are already in the store (exactly the
    streaming ingest's batch-ordering semantics).

    Reference analog: none; north-star LLM-pipeline scope (the
    streaming twin is ``streaming/docs.py:make_segment_store_ingest_
    processor``)."""
    toks = tokens_col(text_col)
    inst = delta.select(
        F.col(id_col),
        F.col(slice_col),
        F.explode(segments_col(toks, segment_tokens)).alias("seg"),
    )
    hit = store.select("seg").distinct().withColumn(
        "in_store", F.lit(True)
    )
    j = inst.join(hit, "seg", "left").select(
        slice_col,
        id_col,
        token_count_col(F.col("seg")).alias("n_tok"),
        F.coalesce(F.col("in_store"), F.lit(False)).alias("removed"),
    )
    removed_tok = F.sum(F.when(F.col("removed"), F.col("n_tok")).otherwise(F.lit(0)))
    kept_tok = F.sum(F.when(~F.col("removed"), F.col("n_tok")).otherwise(F.lit(0)))
    return (
        j.groupBy(slice_col)
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.col("removed").cast("long")).cast("long").alias(
                "n_removed_segments"
            ),
            removed_tok.cast("long").alias("tokens_removed"),
            kept_tok.cast("long").alias("tokens_kept"),
        )
        .select(
            slice_col,
            "n_docs",
            "n_segments",
            "n_removed_segments",
            "tokens_removed",
            "tokens_kept",
            F.expr(
                "(tokens_removed * 1000) div (tokens_removed + tokens_kept)"
            )
            .cast("long")
            .alias("removed_permille"),
        )
    )


def segment_dedup_stats(
    docs: DataFrame,
    segment_tokens: int = 8,
    min_doc_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_col: str = "source",
) -> DataFrame:
    """Sub-document exact dedup audit (the CCNet/RefinedWeb
    paragraph-dedup shape with deterministic segmentation): split every
    document into consecutive ``segment_tokens``-token segments, mark a
    segment instance REMOVED when its exact text occurs in at least
    ``min_doc_freq`` distinct documents and this document is not the
    lowest-id holder (one canonical copy survives corpus-wide), and
    report per-``slice_col`` how many segments/tokens the pass would
    strip. This is the granularity between whole-document exact dedup
    (``doc_exact_dedup``) and overlapping-shingle boilerplate detection
    (``shingle_doc_freq``): non-overlapping spans, every token counted
    exactly once, so `tokens_removed` is the real training-token saving.

    Plan shape: one explode (n_tokens/segment_tokens rows per doc), a
    hash aggregate keyed by segment text (map-side partials; the
    canonical holder is a plain ``min``), a same-key join back, and a
    slice-sized rollup — two shuffles on the segment key, one on the
    slice. No windows, no driver state; at 100 TB the segment key would
    be a 128-bit hash instead of the text (same plan, narrower
    exchange — kept as text here so the DuckDB oracle joins on the
    identical key). ``removed_permille`` uses integer `div` per the
    exactness convention.

    Reference analog: none (the reference dedups whole rows by key,
    SURVEY.md §1.4); this is north-star LLM-pipeline scope.
    """
    toks = tokens_col(text_col)
    segs = segments_col(toks, segment_tokens)
    inst = docs.select(
        F.col(id_col), F.col(slice_col), F.explode(segs).alias("seg")
    )
    g = inst.groupBy("seg").agg(
        F.countDistinct(id_col).alias("df_docs"),
        F.min(id_col).alias("canon_doc"),
    )
    j = inst.join(g, "seg").select(
        slice_col,
        id_col,
        token_count_col(F.col("seg")).alias("n_tok"),
        (
            (F.col("df_docs") >= min_doc_freq) & (F.col(id_col) != F.col("canon_doc"))
        ).alias("removed"),
    )
    removed_tok = F.sum(F.when(F.col("removed"), F.col("n_tok")).otherwise(F.lit(0)))
    kept_tok = F.sum(F.when(~F.col("removed"), F.col("n_tok")).otherwise(F.lit(0)))
    return (
        j.groupBy(slice_col)
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.col("removed").cast("long")).cast("long").alias(
                "n_removed_segments"
            ),
            removed_tok.cast("long").alias("tokens_removed"),
            kept_tok.cast("long").alias("tokens_kept"),
        )
        .select(
            slice_col,
            "n_docs",
            "n_segments",
            "n_removed_segments",
            "tokens_removed",
            "tokens_kept",
            F.expr(
                "(tokens_removed * 1000) div (tokens_removed + tokens_kept)"
            )
            .cast("long")
            .alias("removed_permille"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-token gram, slide a ``window``-hash
    window, keep each window's MINIMUM hash — the classic
    guarantee-bearing fingerprint selection (any shared substring of
    length >= k + window - 1 tokens is always detected, density ~
    2/(window+1)). The selected-HASH set is position-independent (ties
    only affect which position carries the hash, never the set), so
    the engine emits exactly ``distinct (id, fp)``.

    Hashes are the engine-independent md5-fold32, so the fingerprints
    themselves are oracle-comparable. One posexplode + one min-window
    per doc partition + a distinct — no joins. Documents shorter than
    k + window - 1 tokens have no full window and yield no
    fingerprints (they can't carry the guarantee).

    Reference analog: none; north-star LLM-pipeline scope (the
    order-sensitive dedup family: shared_span_pairs detects exact
    spans, this detects them at ~2/(window+1) the index size)."""
    from etl_pipeline_challenge_aladia_spark.functions.hashing import (
        md5_fold32_col,
    )

    grams = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(shingles_col(tokens_col(text_col), k)).alias(
            "pos", "gram"
        ),
    )
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    return (
        grams.select(
            "id",
            "pos",
            F.min(md5_fold32_col(F.col("gram"))).over(w).alias("fp"),
        )
        .filter(F.col("pos") >= window - 1)
        .select("id", "fp")
        .distinct()
    )


def winnowing_pairs(
    docs: DataFrame,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints
    (``winnow_fingerprints``) — the MOSS-style plagiarism/copy screen:
    order-sensitive like ``shared_span_pairs``, but the inverted index
    holds only ~2/(window+1) of the grams, which is the winnowing
    trade: a ~3x smaller index for the same
    shared-substring-length guarantee. Posting-list self-join on the
    fingerprint hash, pair-keyed count, sizes joined back;
    ``share_permille`` = shared fingerprints vs the smaller doc's set.
    """
    fp = winnow_fingerprints(docs, k, window, id_col, text_col)
    sizes = fp.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_id_a"), F.col("b.id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("id").alias("doc_id_a"), F.col("n_fp").alias("n_a")),
            "doc_id_a",
        )
        .join(
            sizes.select(F.col("id").alias("doc_id_b"), F.col("n_fp").alias("n_b")),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared_fp",
            "n_a",
            "n_b",
            F.expr("(n_shared_fp * 1000) div least(n_a, n_b)")
            .cast("long")
            .alias("share_permille"),
        )
    )


# --------------------------------------------------------------------------
# Content-defined chunking (CDC): shared by the batch catalog query and the
# streaming chunk-store ingest, so both sides chunk IDENTICALLY.
# --------------------------------------------------------------------------


def cdc_chunk_frame(
    docs: DataFrame,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Content-defined chunks of every document: a chunk boundary falls
    AFTER token ``pos`` when the rolling 4-token fingerprint
    (engine-exact md5 fold of the space-joined gram) hits 0 mod
    ``divisor`` — so boundaries are content-anchored and an insertion
    early in a document shifts only the chunk it lands in, unlike
    fixed-width segmenting where one added token re-frames every later
    segment (the rsync/backup-dedup property; expected chunk length =
    divisor). One posexplode + two doc-partitioned windows (lag-gram and
    running breakpoint count — never global) + one (doc, chunk)
    position-ordered string_agg. ``keep_cols`` carries functionally-
    dependent columns (e.g. source) through the grouping.

    Output: (id_col, *keep_cols, chunk_no, chunk_text, chunk_tokens).
    The single source of truth for CDC chunking — the batch
    doc_cdc_chunk_dedup query and the streaming
    make_cdc_chunk_ingest_processor both call it.
    """
    from etl_pipeline_challenge_aladia_spark.functions.hashing import (
        md5_fold32_col,
    )

    w = docs.select(
        id_col, *keep_cols, F.posexplode(tokens_col(text_col)).alias("pos", "tok")
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ",
        F.lag("tok", 3).over(win),
        F.lag("tok", 2).over(win),
        F.lag("tok", 1).over(win),
        F.col("tok"),
    )
    h = w.select(
        id_col,
        *keep_cols,
        "pos",
        "tok",
        F.when(
            (F.col("pos") >= 3) & (md5_fold32_col(gram) % divisor == 0), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = h.select(
        id_col,
        *keep_cols,
        "pos",
        "tok",
        F.coalesce(F.sum("brk").over(run), F.lit(0)).alias("chunk_no"),
    )
    return c.groupBy(id_col, *keep_cols, "chunk_no").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("chunk_text"),
        F.count(F.lit(1)).cast("long").alias("chunk_tokens"),
    )


def cdc_chunk_store(
    docs: DataFrame,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The STORED form of a corpus for incremental CDC-chunk dedup
    screening: the distinct set of content-defined chunk texts — the
    insertion-robust twin of ``segment_fingerprint_store`` (a 100-TB
    deployment persists 128-bit hashes; kept as text here so the DuckDB
    oracle joins on the identical key). Output: one ``chunk`` column,
    distinct."""
    return (
        cdc_chunk_frame(docs, divisor, id_col=id_col, text_col=text_col)
        .select(F.col("chunk_text").alias("chunk"))
        .distinct()
    )


def cdc_chunk_dedup_from_store(
    store: DataFrame,
    delta: DataFrame,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_col: str = "source",
) -> DataFrame:
    """Incremental CDC-chunk dedup audit of a DELTA against a
    PRECOMPUTED chunk store (``cdc_chunk_store``): a delta chunk
    instance is REMOVED when its exact content-defined text already
    exists in the store. Because boundaries are content-anchored, a
    delta document that prepends one sentence to an already-ingested
    document still matches every unshifted chunk — the
    insertion-shifted-duplicate case fixed-width segment screening
    misses by construction. Same rollup shape and cost model as
    ``segment_dedup_from_store``: the delta's own chunking plus one
    key-equi join; corpus text never re-read. Within-delta duplicates
    surface when the NEXT batch screens against the appended store
    (the streaming ingest's batch-ordering semantics)."""
    ch = cdc_chunk_frame(
        delta, divisor, id_col=id_col, text_col=text_col,
        keep_cols=(slice_col,),
    )
    hit = (
        store.select(F.col("chunk").alias("chunk_text"))
        .distinct()
        .withColumn("in_store", F.lit(True))
    )
    j = ch.join(hit, "chunk_text", "left").select(
        slice_col,
        id_col,
        F.col("chunk_tokens").alias("n_tok"),
        F.coalesce(F.col("in_store"), F.lit(False)).alias("removed"),
    )
    removed_tok = F.sum(
        F.when(F.col("removed"), F.col("n_tok")).otherwise(F.lit(0))
    )
    kept_tok = F.sum(
        F.when(~F.col("removed"), F.col("n_tok")).otherwise(F.lit(0))
    )
    return j.groupBy(slice_col).agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("removed").cast("long"))
        .cast("long")
        .alias("n_removed_chunks"),
        removed_tok.cast("long").alias("tokens_removed"),
        kept_tok.cast("long").alias("tokens_kept"),
        F.expr(
            "CAST((sum(CASE WHEN removed THEN n_tok ELSE 0 END) * 1000)"
            " div greatest(sum(n_tok), 1L) AS BIGINT)"
        ).alias("removed_permille"),
    )


def bpe_train(
    docs: DataFrame, rounds: int = 3, text_col: str = "text"
) -> DataFrame:
    """Greedy BPE merge-table training, ``rounds`` rounds — the engine
    body behind the cataloged doc_bpe_merge_rounds (see that query's
    doc for the full semantics contract): per round, count adjacent
    token pairs over the CURRENT corpus, pick the most frequent (count
    DESC, pair ASC tie-break), and rewrite the corpus joining that pair
    with '+' via one space-padded sequential-leftmost replace. The
    rewritten corpus is MATERIALIZED between rounds (lazy
    localCheckpoint folded into the next round's pair-count job — the
    pagerank_fixed_point iterative discipline): without it round r's
    scan would re-execute rounds 1..r-1's rewrites, O(rounds^2) text
    rewrites total; with it per-round cost is flat, O(rounds * corpus)
    with 1-row merge state at any ``rounds``. Output: the merge table
    (merge_round, pair, merged, n_occurrences) — k = rounds rows."""
    tx = docs.select(
        F.concat(F.lit(" "), F.col(text_col), F.lit(" ")).alias("tx")
    )
    out = None
    for r in range(1, rounds + 1):
        pairs = (
            tx.select(F.split(F.trim("tx"), " ").alias("w"))
            .filter(F.size("w") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(w) - 2),"
                        " i -> concat(w[i], ' ', w[i+1]))"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "pair").limit(1)
        rec = top.select(
            F.lit(r).cast("long").alias("merge_round"),
            "pair",
            F.regexp_replace("pair", " ", "+").alias("merged"),
            F.col("n").alias("n_occurrences"),
        )
        out = rec if out is None else out.unionByName(rec)
        if r < rounds:
            tx = tx.crossJoin(F.broadcast(top)).select(
                F.expr(
                    "replace(tx, concat(' ', pair, ' '),"
                    " concat(' ', replace(pair, ' ', '+'), ' ')) AS tx"
                )
            ).localCheckpoint(eager=False)
    return out


def bpe_composed_replace_col(
    col: Column, merges: list[tuple[str, str]]
) -> Column:
    """The trained merge table as ONE nested replace projection: merges
    MUST compose in training order (round r's pair literals contain
    rounds 1..r-1's '+'-joined symbols), so the first merge is the
    innermost replace. ``col`` must already be space-padded. k = rounds
    literals by definition — the broadcast-as-literal shape a tokenizer
    deployment applies as a single shuffle-free map over documents."""
    for pair, merged in merges:
        col = F.replace(col, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return col
