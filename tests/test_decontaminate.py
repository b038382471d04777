"""Semantic benchmark decontamination (VERDICT r11 next #4): the
embedding-side screen that catches PARAPHRASE leakage — a training item
restating an eval row in different words shares no 4-gram (invisible to
doc_decontaminate's n-gram join) but sits at near-identical embedding
cosine. The operator is the incremental-screen shape with corpus=eval,
delta=train: the small frozen eval index broadcasts, the train corpus
streams through one linear routed screen."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.similarity import (
    semantic_decontaminate,
)
from etl_pipeline_challenge_aladia_spark.operators.text import (
    contamination_overlap,
)

EVAL_TEXT = "the quick brown fox jumps over the lazy dog every morning"
PARAPHRASE = "a swift russet fox vaults across one sleepy hound at dawn"
CLEAN = "completely unrelated sentence about database query planning"


def _fixture(spark):
    """3 train docs vs a 2-doc eval set:
    - train 1 PARAPHRASES eval 100 (zero shared 4-grams, ~identical
      embedding — the tilt twin),
    - train 2 copies eval 100 VERBATIM (both screens must flag it),
    - train 3 is clean (neither screen may flag it)."""
    train_docs = spark.createDataFrame(
        [(1, PARAPHRASE), (2, EVAL_TEXT), (3, CLEAN)],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, EVAL_TEXT), (101, "benchmark item two about arithmetic")],
        "doc_id long, text string",
    )
    e_eval = [1.0, 0.2, -0.5, 0.7]
    e_other = [-0.9, 0.1, 0.8, 0.05]  # far from e_eval (cosine ~ -0.5)
    tilt = [x * (1 + 0.001 * ((i % 3) - 1)) for i, x in enumerate(e_eval)]
    train_emb = spark.createDataFrame(
        [(1, tilt), (2, e_eval), (3, e_other)],
        "vec_id long, e array<double>",
    )
    eval_emb = spark.createDataFrame(
        [(100, e_eval), (101, [0.1, -0.8, 0.3, 0.4])],
        "vec_id long, e array<double>",
    )
    return train_docs, eval_docs, train_emb, eval_emb


def test_ngram_screen_misses_the_paraphrase(spark):
    train_docs, eval_docs, _, _ = _fixture(spark)
    flagged = {
        r.doc_id: r.n_shared_shingles
        for r in contamination_overlap(train_docs, eval_docs, n=4).collect()
    }
    assert 2 in flagged  # the verbatim copy is caught
    assert 1 not in flagged  # the paraphrase shares NO 4-gram: missed
    assert 3 not in flagged


def test_semantic_screen_catches_the_paraphrase(spark):
    _, _, train_emb, eval_emb = _fixture(spark)
    got = {
        r.vec_id: (r.matched_eval_id, r.cosine)
        for r in semantic_decontaminate(
            train_emb, eval_emb, vec_col="e", threshold=0.95
        ).collect()
    }
    assert set(got) == {1, 2}  # paraphrase AND verbatim; never the clean doc
    assert got[1][0] == 100 and got[1][1] >= 0.999
    assert got[2] == (100, 1.0)


def test_semantic_screen_output_contract(spark):
    """min matching eval id + max cosine when a train row leaks against
    several eval rows; explicit route passthrough stays exact."""
    train_emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, e array<double>"
    )
    eval_emb = spark.createDataFrame(
        [
            (200, [1.0, 0.0, 0.0, 0.0]),
            (150, [0.999, 0.001, 0.0, 0.0]),  # also above threshold
            (300, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, e array<double>",
    )
    rows = semantic_decontaminate(
        train_emb, eval_emb, vec_col="e", threshold=0.95, route="flat"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # k=32 floor puts every eval vector in its own cell; the train
    # vector routes to its argmin cell and matches what's there — the
    # lowest qualifying id 150 unless cells split them
    assert r.vec_id == 1 and r.matched_eval_id in (150, 200)
    assert r.cosine == 1.0


def test_leakage_rollup_counts_planted_rows(spark, sf_dir):
    """The cataloged rollup on real testdata: planted paraphrases leak,
    and the per-label totals reconcile with the train split."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import (
        CATALOG,
        _decontamination_scenario,
    )

    train, _ = _decontamination_scenario(spark, sf_dir)
    per_label_train = {
        r.label: r.n
        for r in train.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    rows = CATALOG["emb_leakage_rate_by_label"].spark(spark, sf_dir).collect()
    assert {r.label for r in rows} == set(per_label_train)
    total_leaked = sum(r.n_leaked for r in rows)
    planted = train.filter(F.col("vec_id") >= 200000).count()
    assert total_leaked >= planted  # every planted row is caught
    for r in rows:
        assert r.n_train == per_label_train[r.label]
        assert 0 <= r.n_leaked <= r.n_train
        assert r.leak_permille == r.n_leaked * 1000 // r.n_train


def test_curation_pipeline_decontaminated_drops_only_leaked_train(
    spark, sf_dir
):
    """The composed pipeline: v2 output equals v1 minus leaked TRAIN
    docs — val/test rows byte-identical, train counts never increase,
    and the per-(split,lang) totals stay internally consistent."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    v1 = {
        (r.split, r.lang): (r.n_docs, r.total_tokens)
        for r in CATALOG["doc_curation_pipeline"].spark(spark, sf_dir).collect()
    }
    v2 = {
        (r.split, r.lang): (r.n_docs, r.total_tokens)
        for r in CATALOG["doc_curation_pipeline_decontaminated"]
        .spark(spark, sf_dir)
        .collect()
    }
    for k, (n1, t1) in v1.items():
        split = k[0]
        if split != "train":
            assert v2.get(k) == (n1, t1)  # non-train rows untouched
        else:
            n2, t2 = v2.get(k, (0, 0))
            assert 0 <= n2 <= n1 and 0 <= t2 <= t1
    # something is organically leaked at every sf (the 4-gram screen is
    # non-empty on this corpus), so v2 must be a STRICT reduction
    assert sum(n for (s, _), (n, _) in v2.items() if s == "train") < sum(
        n for (s, _), (n, _) in v1.items() if s == "train"
    )
