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


def test_sniff_compressed_av_containers():
    """mp3 (ID3 tag or valid frame sync) and mp4 (ftyp box) are sniffed;
    near-miss headers (reserved MPEG version/layer, missing sync bits)
    and the stub corpus' hash payloads are not."""
    from etl_pipeline_challenge_aladia_spark.operators.codecs import sniff_format

    assert sniff_format(b"ID3\x04\x00" + b"\x00" * 16) == "mp3"
    assert sniff_format(b"\xff\xfb\x90\x00" + b"\x00" * 16) == "mp3"
    assert sniff_format(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 8) == "mp4"
    # invalid frame syncs: reserved version (bits 11..12 == 01), reserved
    # layer (00), missing sync bits
    assert sniff_format(b"\xff\xeb\x90\x00") is None
    assert sniff_format(b"\xff\xf9\x90\x00") is None
    assert sniff_format(b"\xff\x7b\x90\x00") is None
    # existing formats still win
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_format(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) == "png"


def test_compressed_av_kernels_stub_fallback_is_byte_stable():
    """Without the codec libs (this sandbox) — or on corrupt payloads
    behind a valid magic anywhere — the mp3/mp4 branches return exactly
    the deterministic stub: repeated calls agree, and agree with the
    stub itself."""
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        _stub_kernel,
        real_feature_kernel,
    )

    fake_mp3 = b"ID3\x04\x00" + b"not really audio" * 5
    fake_mp4 = b"\x00\x00\x00\x20ftypisom" + b"not really video" * 5
    for payload in (fake_mp3, fake_mp4):
        a = real_feature_kernel(payload)
        b = real_feature_kernel(payload)
        assert a == b == _stub_kernel(payload)
        assert all(0.0 <= v < 1.0 for v in a)  # stub-tagged by range


def test_stub_corpus_payloads_never_sniff_as_av():
    """The deterministic stub fixture's hash payloads must keep routing
    to the stub kernel — the conservative mp3 sync check exists so
    arbitrary high bytes don't get claimed by the audio branch."""
    from etl_pipeline_challenge_aladia_spark.operators.codecs import sniff_format
    import hashlib

    for i in range(64):
        payload = bytes(hashlib.sha256(str(i).encode()).digest() * (1 + i % 4))
        assert sniff_format(payload) is None


def test_real_mp3_decode_when_soundfile_installed():
    """Real MP3 decode parity (runs only where libsndfile>=1.1 with MP3
    support is installed — the production-cluster image)."""
    import io

    import pytest

    sf = pytest.importorskip("soundfile")
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        real_feature_kernel,
    )

    rate = 16000
    t = np.arange(rate) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    buf = io.BytesIO()
    try:
        sf.write(buf, x, rate, format="MP3")
    except Exception:
        pytest.skip("libsndfile lacks MP3 encode support")
    feats = real_feature_kernel(buf.getvalue())
    # real decode: sample count ~1s at 16kHz (encoder padding allowed),
    # rate exact, rms in the ballpark of the 0.5-amplitude sine
    assert feats[1] == rate
    assert rate * 0.9 <= feats[0] <= rate * 1.5
    assert 0.2 <= feats[3] <= 0.5


def test_real_mp4_decode_when_pyav_installed():
    """Real MP4 decode parity (runs only where PyAV/ffmpeg is installed
    — the production-cluster image)."""
    import io

    import pytest

    av = pytest.importorskip("av")
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        real_feature_kernel,
    )

    buf = io.BytesIO()
    try:
        with av.open(buf, mode="w", format="mp4") as container:
            stream = container.add_stream("h264", rate=10)
            stream.width, stream.height = 64, 48
            stream.pix_fmt = "yuv420p"
            for i in range(12):
                frame = av.VideoFrame.from_ndarray(
                    np.full((48, 64, 3), 20 * i, dtype=np.uint8), format="rgb24"
                )
                for packet in stream.encode(frame):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
    except Exception:
        pytest.skip("PyAV lacks an h264 encoder")
    feats = real_feature_kernel(buf.getvalue())
    assert feats[0] == 12 and feats[1] == 64 and feats[2] == 48
    assert feats[6] < feats[7]  # brightness ramp: first frame darker


def test_ahash_planted_duplicates(spark):
    """A near-copy (few flipped pixels) pairs with its source at small
    Hamming distance; a structurally different image does not. Also pins
    band coverage: a pair at distance exactly 3 MUST be found (pigeonhole
    over the 4x16-bit bands), and hash values are plain signed longs."""
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.codecs import encode_ppm
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ahash64,
        ahash_near_dup_pairs,
    )

    rng_y, rng_x = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    base = np.stack([(7 * rng_x + 3 * rng_y) % 256] * 3, axis=2).astype(
        np.uint8
    )
    near = base.copy()
    near[0:2, 0:2, :] = 255  # tiny corner blot -> few aHash cells move
    anti = np.stack([(255 - (7 * rng_x + 3 * rng_y) % 256)] * 3, axis=2).astype(
        np.uint8
    )  # inverted gradient -> complementary bit pattern
    rows = [
        (0, "image", "image/x-portable-pixmap", encode_ppm(base), (32, 32, None)),
        (1, "image", "image/x-portable-pixmap", encode_ppm(near), (32, 32, None)),
        (2, "image", "image/x-portable-pixmap", encode_ppm(anti), (32, 32, None)),
        (3, "audio", "audio/wav", b"not-an-image", (None, None, 10)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    # kernel-level ground truth
    h_base, h_near, h_anti = (
        ahash64(encode_ppm(img)) for img in (base, near, anti)
    )
    d_near = bin((h_base ^ h_near) & ((1 << 64) - 1)).count("1")
    d_anti = bin((h_base ^ h_anti) & ((1 << 64) - 1)).count("1")
    assert d_near <= 3 < d_anti
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == d_near
    assert not any(2 in pair or 3 in pair for pair in got)


def test_ahash_recall_is_exact_within_distance_three(spark):
    """Pigeonhole contract, swept: every planted variant whose KERNEL
    Hamming distance to the base is <= 3 MUST appear in the operator's
    output (4 disjoint 16-bit bands guarantee a clean shared band), and
    nothing farther than 3 may appear. The variants perturb sampled
    pixels directly, so several land at distances 2-3 across multiple
    bands."""
    import itertools

    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.codecs import encode_ppm
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ahash64,
        ahash_near_dup_pairs,
    )

    rng_y, rng_x = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    base = np.stack([(5 * rng_x + 11 * rng_y) % 256] * 3, axis=2).astype(
        np.uint8
    )
    # perturb 1-3 of the 8x8 grid's SAMPLED pixels (odd coordinates on a
    # 16x16 source) in rows that map to different bands (band = yy // 2)
    sampled = [(1, 1), (5, 1), (9, 1), (13, 1), (1, 9), (9, 9)]
    variants = []
    for k in (1, 2, 3):
        for combo in itertools.combinations(sampled, k):
            var = base.copy()
            for y, x in combo:
                var[y, x, :] = 255
            variants.append(var)
    imgs = [base] + variants
    hashes = [ahash64(encode_ppm(im)) for im in imgs]
    dist = {
        i: bin((hashes[0] ^ hashes[i]) & ((1 << 64) - 1)).count("1")
        for i in range(1, len(imgs))
    }
    assert any(d == 3 for d in dist.values())  # the sweep reaches d=3
    rows = [
        (i, "image", "image/x-portable-pixmap", encode_ppm(im), (16, 16, None))
        for i, im in enumerate(imgs)
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in ahash_near_dup_pairs(media, max_hamming=3).collect()
    }
    for i, d in dist.items():
        if d <= 3:
            assert got.get((0, i)) == d, f"variant {i} at d={d} missed"
        else:
            assert (0, i) not in got


def test_audio_ahash_planted_near_copy(spark):
    """A lightly-edited audio clip (a few samples nudged) pairs with its
    source at small Hamming distance; a structurally different clip
    (reversed loudness profile) does not; non-audio rows are ignored."""
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.codecs import (
        encode_wav_pcm16,
    )
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_ahash64,
        audio_ahash_near_dup_pairs,
    )

    j = np.arange(640)
    base = ((37 * j) % 3001 - 1500).astype(np.int16)
    near = base.copy()
    near[5:8] = 0  # tiny edit inside one window
    anti = base[::-1].copy()  # reversed profile
    rows = [
        (0, "audio", "audio/wav", encode_wav_pcm16(base), (None, None, 80)),
        (1, "audio", "audio/wav", encode_wav_pcm16(near), (None, None, 80)),
        (2, "audio", "audio/wav", encode_wav_pcm16(anti), (None, None, 80)),
        (3, "image", "image/x-portable-pixmap", b"P6 junk", (2, 2, None)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    h0 = audio_ahash64(encode_wav_pcm16(base))
    h1 = audio_ahash64(encode_wav_pcm16(near))
    d01 = bin((h0 ^ h1) & ((1 << 64) - 1)).count("1")
    assert d01 <= 6
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in audio_ahash_near_dup_pairs(media, max_hamming=6).collect()
    }
    assert got.get((0, 1)) == d01
    assert not any(3 in p for p in got)


def test_video_frame_near_dup_spliced_frame(spark):
    """Two videos that share one spliced-in identical frame pair with
    n_shared_frames = 1; videos with disjoint frames do not pair; the
    shared count is over DISTINCT hashes (a frame repeated inside one
    video counts once)."""
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.codecs import encode_y4m
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_frame_near_dup_pairs,
    )

    y, x = np.meshgrid(np.arange(12), np.arange(16), indexing="ij")

    def frame(k):
        return ((x * (k + 2) + 5 * y) % 256).astype(np.uint8)

    shared = frame(7)
    v0 = np.stack([frame(1), shared, shared])  # shared frame repeated
    v1 = np.stack([frame(3), shared])
    v2 = np.stack([frame(11), frame(13)])
    rows = [
        (0, "video", "video/x-yuv4mpeg", encode_y4m(v0), (16, 12, 120)),
        (1, "video", "video/x-yuv4mpeg", encode_y4m(v1), (16, 12, 80)),
        (2, "video", "video/x-yuv4mpeg", encode_y4m(v2), (16, 12, 80)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        (r["media_id_a"], r["media_id_b"]): r["n_shared_frames"]
        for r in video_frame_near_dup_pairs(media).collect()
    }
    assert got == {(0, 1): 1}


def test_distributed_media_build_matches_driver_build(spark, monkeypatch):
    """The mapInPandas generation branch above MEDIA_DRIVER_BUILD_MAX
    must emit byte-identical rows to the driver-side build — lower the
    gate so the distributed path runs at unit-test size instead of only
    on the 100x bench ladder (ADVICE r12)."""
    from etl_pipeline_challenge_aladia_spark.operators import multimodal as mm

    def rows(df):
        return sorted(
            (
                r["media_id"],
                r["modality"],
                r["mime_type"],
                bytes(r["content"]),
                (r["meta"]["width"], r["meta"]["height"], r["meta"]["duration_ms"]),
            )
            for r in df.collect()
        )

    n = 24
    driver = rows(mm.synthetic_media_real(spark, n=n))
    monkeypatch.setattr(mm, "MEDIA_DRIVER_BUILD_MAX", 4)
    distributed = rows(mm.synthetic_media_real(spark, n=n))
    assert distributed == driver
    assert len(driver) == n


def test_distributed_clip_build_matches_driver_build(spark, monkeypatch):
    from etl_pipeline_challenge_aladia_spark.operators import multimodal as mm

    def rows(df):
        return sorted(
            (r["media_id"], r["modality"], bytes(r["content"]))
            for r in df.collect()
        )

    n = 12
    driver = rows(mm.synthetic_video_clips(spark, n=n))
    monkeypatch.setattr(mm, "MEDIA_DRIVER_BUILD_MAX", 4)
    distributed = rows(mm.synthetic_video_clips(spark, n=n))
    assert distributed == driver
    assert len(driver) == n
