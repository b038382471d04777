"""Multimodal plumbing tests: schema, Arrow batch shape, determinism of the
stubbed decode kernel, and frame-sampling plan fan-out."""

from __future__ import annotations

from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=12).repartition(3)
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 12
    for r in rows.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r["feature"])
        assert len(r["content_sha"]) == 64
        assert r["n_bytes"] > 0
    # deterministic across runs and partitionings
    again = {r["media_id"]: r["feature"] for r in extract_features(media.coalesce(1)).collect()}
    assert {k: v["feature"] for k, v in rows.items()} == again


def test_features_compose_with_similarity(spark):
    from etl_pipeline_challenge_aladia_spark.operators.similarity import brute_force_topk
    from pyspark.sql import functions as F

    media = synthetic_media(spark, n=12)
    feats = extract_features(media)
    queries = feats.filter(F.col("media_id") < 2).select(
        F.col("media_id").alias("query_id"), F.col("feature")
    )
    out = brute_force_topk(
        feats, queries, k=3, id_col="media_id", vec_col="feature", query_id_col="query_id"
    )
    got = out.collect()
    assert len(got) == 6  # 2 queries x top-3
    best = {r["query_id"]: r["neighbor_id"] for r in got if r["rnk"] == 1}
    assert best == {0: 0, 1: 1}  # self is nearest


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    videos = media.filter("modality = 'video'").select("media_id", "meta.duration_ms").collect()
    expected = sum((v["duration_ms"] - 1) // 1000 + 1 for v in videos)
    assert len(rows) == expected


def test_resize_images_aspect_fit_and_determinism(spark):
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    out = resize_images(media, out_w=224, out_h=224).collect()
    # only image rows survive, geometry fits in the box preserving aspect
    assert len(out) == len([r for r in media.collect() if r["modality"] == "image"])
    for r in out:
        assert 1 <= r["out_width"] <= 224 and 1 <= r["out_height"] <= 224
        # fit, not shrink-only (>=223 allows the one-ulp int truncation)
        assert max(r["out_width"], r["out_height"]) >= 223
        assert isinstance(r["content"], (bytes, bytearray)) and len(r["content"]) == 32
    # deterministic: same inputs -> same payloads
    again = {r["media_id"]: r["content"] for r in resize_images(media).collect()}
    assert {r["media_id"]: r["content"] for r in out} == again
