"""Round-10 additions: hub-frame-capped video near-dup, sequence-aware
video dedup, store-level key erasure, sample-disciplined band autotune,
stored-merge BPE apply, and persisted tuning decisions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _frame(fn):
    """16x16 uint8 luma frame from a (y, x) -> int formula."""
    y, x = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    return (fn(y, x) % 256).astype(np.uint8)


def _hub_video_media(spark, n_videos=20):
    """n_videos Y4M clips that ALL contain one identical black frame
    (the hub: title cards / black frames are shared corpus-wide in real
    video data) plus one distinctive frame each; videos 0 and 1
    additionally share two genuine distinctive frames — the only true
    near-dup pair."""
    from etl_pipeline_challenge_aladia_spark.operators.codecs import (
        encode_y4m,
    )
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        _ahash64_gray,
    )

    hub = _frame(lambda y, x: 0 * y)
    shared = [
        _frame(lambda y, x: 7 * (x + 16 * y)),
        _frame(lambda y, x: 11 * (x + 16 * y)),
    ]
    rows, hashes = [], set()
    for v in range(n_videos):
        # one-hot frame: a single bright 2x2 block covering exactly one
        # pixel-center sample -> ahash is 1 << v, unique by construction
        uniq = np.full((16, 16), 1, np.uint8)
        r, c = divmod(v, 8)
        uniq[2 * r : 2 * r + 2, 2 * c : 2 * c + 2] = 255
        hashes.add(_ahash64_gray(uniq))
        frames = [hub, uniq] + (shared if v < 2 else [])
        rows.append(
            (v, "video", bytearray(encode_y4m(np.stack(frames), 25)))
        )
    # fixture premise: every distinctive frame hashes uniquely, and the
    # hub/shared hashes don't collide with them
    assert len(hashes) == n_videos
    assert _ahash64_gray(hub) not in hashes
    assert not {_ahash64_gray(f) for f in shared} & hashes
    return spark.createDataFrame(
        rows, "media_id long, modality string, content binary"
    )


def test_video_near_dup_hub_frame_cap(spark):
    """One hub frame across 20 videos: uncapped, the hash bucket emits
    all C(20,2)=190 pairs; with the default cap (16 < 20) only the
    genuinely-shared pair survives, and its shared-frame count excludes
    the hub."""
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        video_frame_near_dup_pairs,
    )

    media = _hub_video_media(spark, n_videos=20)

    uncapped = video_frame_near_dup_pairs(media, frame_df_cap=None)
    assert uncapped.count() == 190  # every pair rides the hub hash

    capped = video_frame_near_dup_pairs(media).collect()
    assert {(r.media_id_a, r.media_id_b): r.n_shared_frames
            for r in capped} == {(0, 1): 2}


def test_video_near_dup_min_shared_frames(spark):
    """The >= m shared-frames predicate: at m=2 the planted pair (2
    genuine shared frames) survives; at m=3 nothing does."""
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        video_frame_near_dup_pairs,
    )

    media = _hub_video_media(spark, n_videos=20)  # hub capped away
    at2 = video_frame_near_dup_pairs(media, min_shared_frames=2).collect()
    assert [(r.media_id_a, r.media_id_b) for r in at2] == [(0, 1)]
    assert (
        video_frame_near_dup_pairs(media, min_shared_frames=3).count() == 0
    )


def _onehot(v):
    """16x16 frame whose ahash is exactly 1 << v (one bright 2x2 block
    on one pixel-center sample)."""
    f = np.full((16, 16), 1, np.uint8)
    r, c = divmod(v, 8)
    f[2 * r : 2 * r + 2, 2 * c : 2 * c + 2] = 255
    return f


def test_video_sequence_runs_are_order_aware(spark):
    """Run semantics pinned on hand-built clips: a contiguous trim
    pairs at its overlap length; a splice breaks the run at the edit
    point (two runs, neither bridging); scrambled frame ORDER kills the
    pair entirely even though the frame SET is identical."""
    from etl_pipeline_challenge_aladia_spark.operators.codecs import (
        encode_y4m,
    )
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        video_sequence_near_dup_pairs,
    )

    A, B, C, D, E, Q = (_onehot(v) for v in range(6))
    clips = {
        0: [A, B, C, D, E],        # the original
        1: [B, C, D],              # trim -> run 3 with clip 0
        2: [A, B, Q, D, E],        # splice -> runs 2 and 2 with clip 0
        3: [E, C, A, D, B],        # same frame SET, scrambled order
    }
    media = spark.createDataFrame(
        [
            (k, "video", bytearray(encode_y4m(np.stack(fs), 25)))
            for k, fs in clips.items()
        ],
        "media_id long, modality string, content binary",
    )

    at3 = {
        (r.media_id_a, r.media_id_b): (r.longest_run, r.n_runs)
        for r in video_sequence_near_dup_pairs(media, min_run=3).collect()
    }
    assert at3[(0, 1)] == (3, 1)
    assert (0, 2) not in at3  # the splice broke the 5-run
    assert (0, 3) not in at3  # identical set, wrong order -> no run

    at2 = {
        (r.media_id_a, r.media_id_b): (r.longest_run, r.n_runs)
        for r in video_sequence_near_dup_pairs(media, min_run=2).collect()
    }
    assert at2[(0, 2)] == (2, 2)  # both splice segments, not bridged
    assert (0, 3) not in at2


def test_bpe_apply_stored_is_decision_identical(spark):
    """The stored-merge apply path (train once, collect the k-row merge
    table, ONE composed replace projection) produces byte-identical
    output to the retrain-inline path — the decision-identity the split
    must preserve."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import (
        bpe_apply,
        bpe_apply_stored,
    )

    sf = "/root/testdata/sf0.001"
    a = bpe_apply(spark, sf).orderBy("doc_id").collect()
    b = bpe_apply_stored(spark, sf).orderBy("doc_id").collect()
    assert a == b
