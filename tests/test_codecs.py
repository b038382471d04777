"""Pure-numpy media codec tests: container round trips, spec-shaped header
handling, nearest-neighbor resize geometry, real decode kernels, and the
Spark-side decode-audit operator over genuine PPM/WAV/Y4M payloads."""

from __future__ import annotations

import numpy as np
import pytest

from etl_pipeline_challenge_aladia_spark.operators.codecs import (
    decode_pnm,
    decode_wav,
    decode_y4m,
    encode_pgm,
    encode_ppm,
    encode_wav_pcm16,
    encode_y4m,
    resize_nearest,
    sniff_format,
)
from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
    decode_media_audit,
    real_feature_kernel,
    real_resize_kernel,
    resize_images,
    synthetic_media_real,
)


def test_ppm_pgm_round_trip_and_header_quirks():
    img = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    assert (decode_pnm(encode_ppm(img)) == img).all()
    gray = np.arange(12 * 16, dtype=np.uint8).reshape(12, 16)
    assert (decode_pnm(encode_pgm(gray)) == gray).all()
    # NetPBM allows comments and arbitrary whitespace inside the header
    quirky = b"P5\n# comment line\n 16\t12\n255\n" + gray.tobytes()
    assert (decode_pnm(quirky) == gray).all()
    with pytest.raises(ValueError):
        decode_pnm(b"P6\n4 4\n255\n" + b"\x00" * 5)  # truncated payload
    with pytest.raises(ValueError):
        decode_pnm(b"\x89PNG\r\n")  # compressed container, not a PNM


def test_wav_round_trip_and_chunk_walking():
    s = ((np.arange(500) * 31) % 4001 - 2000).astype(np.int16)
    data = encode_wav_pcm16(s, 8000)
    out, rate = decode_wav(data)
    assert rate == 8000 and (out == s).all()
    # a LIST chunk before data must be skipped (chunk walk, not fixed offset)
    import struct

    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    with_list = data[:12] + extra + data[12:]
    with_list = b"RIFF" + struct.pack("<I", len(with_list) - 8) + with_list[8:]
    out2, rate2 = decode_wav(with_list)
    assert rate2 == 8000 and (out2 == s).all()
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # missing fmt/data


def test_y4m_round_trip():
    frames = (np.arange(3 * 6 * 8, dtype=np.uint8)).reshape(3, 6, 8)
    data = encode_y4m(frames, 25)
    out, fps = decode_y4m(data)
    assert fps == 25 and (out == frames).all()
    with pytest.raises(ValueError):
        decode_y4m(data[:-1])  # truncated final frame


def test_resize_nearest_geometry_and_identity():
    img = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    assert resize_nearest(img, 8, 6).shape == (6, 8, 3)
    assert resize_nearest(img, 32, 24).shape == (24, 32, 3)
    # identity resize must be exact (pixel-center map hits every source px)
    assert (resize_nearest(img, 16, 12) == img).all()
    # 2x downscale picks every other pixel starting at offset 0 or 1
    small = resize_nearest(img, 8, 6)
    candidates = {tuple(img[y, x]) for y in (0, 1) for x in (0, 1)}
    assert tuple(small[0, 0]) in candidates


def test_sniff_format():
    assert sniff_format(b"P6\n1 1\n255\n\x00\x00\x00") == "ppm"
    assert sniff_format(b"P5\n1 1\n255\n\x00") == "pgm"
    assert sniff_format(encode_wav_pcm16(np.zeros(4, np.int16))) == "wav"
    assert sniff_format(b"YUV4MPEG2 W1 H1 F25:1\n") == "y4m"
    assert sniff_format(b"RIFFxxxxAVI ") is None  # RIFF but not WAVE
    # compressed images are sniffed (decode is PIL-import-guarded)
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_format(b"\x89PNG\r\n\x1a\n") == "png"


def test_real_feature_kernel_per_modality():
    img = np.full((10, 20, 3), 7, np.uint8)
    f = real_feature_kernel(encode_ppm(img))
    assert f[:3] == [20.0, 10.0, 3.0]
    assert f[3] == 7.0 and f[4] == 0.0  # mean/std of a constant image
    s = np.array([100, -100] * 50, np.int16)
    f = real_feature_kernel(encode_wav_pcm16(s, 16000))
    assert f[0] == 100.0 and f[1] == 16000.0
    assert f[3] == pytest.approx(100.0)  # RMS of a +/-100 square wave
    assert f[5] == pytest.approx(99 / 100)  # zcr: every adjacent pair flips
    frames = np.stack([np.full((4, 6), v, np.uint8) for v in (10, 30)])
    f = real_feature_kernel(encode_y4m(frames, 25))
    assert f[:4] == [2.0, 6.0, 4.0, 25.0]
    assert f[6] == 10.0 and f[7] == 30.0  # first/last frame means
    # unknown container falls back to the stub (values in [0, 1))
    f = real_feature_kernel(b"\xff\xd8\xffJPEG-ish")
    assert all(0.0 <= v < 1.0 for v in f)


def test_real_resize_kernel_reencodes_same_container():
    img = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    out = real_resize_kernel(encode_ppm(img), 16, 12, 8, 8)
    assert sniff_format(out) == "ppm"
    assert decode_pnm(out).shape == (8, 8, 3)
    gray = np.arange(12 * 16, dtype=np.uint8).reshape(12, 16)
    out = real_resize_kernel(encode_pgm(gray), 16, 12, 4, 4)
    assert sniff_format(out) == "pgm"
    assert decode_pnm(out).shape == (4, 4)


def test_decode_media_audit_matches_fixture_spec(spark):
    audit = {
        r["media_id"]: r
        for r in decode_media_audit(synthetic_media_real(spark, n=18)).collect()
    }
    assert len(audit) == 18
    for i, r in audit.items():
        if i % 3 == 0:
            w, h = 16 + i % 5, 12 + i % 7
            pix = sum(
                (3 * x + 7 * y + 11 * c + i) % 256
                for c in range(3)
                for y in range(h)
                for x in range(w)
            )
            assert (r["container"], r["width"], r["height"]) == ("ppm", w, h)
            assert r["pix_sum"] == pix
        elif i % 3 == 1:
            ns = 200 + 3 * i
            assert (r["container"], r["n_samples"], r["rate"]) == ("wav", ns, 8000)
            assert r["sample_sum"] == sum(
                (31 * j + 17 * i) % 4001 - 2000 for j in range(ns)
            )
        else:
            nf, w, h = 2 + i % 3, 8 + i % 4, 6 + i % 5
            assert (r["container"], r["width"], r["height"], r["n_frames"]) == (
                "y4m", w, h, nf,
            )


def test_resize_images_with_real_kernel_decodable_output(spark):
    media = synthetic_media_real(spark, n=9)
    out = resize_images(media, out_w=8, out_h=8, kernel=real_resize_kernel)
    rows = out.collect()
    assert rows  # the image third of the fixture
    for r in rows:
        img = decode_pnm(bytes(r["content"]))
        # aspect-fit within 8x8, geometry echoed in the typed columns
        assert img.shape[0] == r["out_height"] and img.shape[1] == r["out_width"]
        assert img.shape[0] <= 8 and img.shape[1] <= 8


def test_extract_frame_features_decodes_planned_frames(spark):
    """frame_sample_plan rows materialize into real per-frame decode: the
    frame index tracks the sample timestamp, geometry matches the
    container, and the luma mean equals the chosen frame's true mean;
    non-Y4M payloads yield NULL features, not failures."""
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.codecs import encode_y4m
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_frame_features,
    )

    frames = np.stack(
        [np.full((4, 6), v, np.uint8) for v in (10, 20, 30, 40, 50)]
    )
    payload = encode_y4m(frames, 1)  # 1 fps -> 5000 ms duration
    rows = [
        (1, "video", "video/x-yuv4mpeg", payload, (6, 4, 5000)),
        (2, "video", "video/mp4", b"\x00\x00\x01\xba...", (8, 8, 3000)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        (r["media_id"], r["frame_ts_ms"]): r
        for r in extract_frame_features(media, every_ms=1000).collect()
    }
    # video 1: frames at 0..4999 every 1000 ms -> 5 rows, frame i at i*1000
    for i in range(5):
        r = got[(1, i * 1000)]
        assert r["frame_index"] == i
        assert (r["width"], r["height"]) == (6, 4)
        assert r["luma_mean"] == float(frames[i].mean())
        assert r["luma_std"] == 0.0
    # compressed container: planned rows exist, features are NULL
    assert got[(2, 0)]["luma_mean"] is None
    assert len([k for k in got if k[0] == 2]) == 3


def test_extract_audio_windows_real_wav_decode(spark):
    """Windowed acoustic features from real PCM decode: a half-loud,
    half-quiet clip shows the level change exactly at the window
    boundary; sample counts cover the clip with no overlap."""
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.codecs import (
        encode_wav_pcm16,
    )
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_windows,
    )

    rate = 1000  # 1 kHz -> 500 samples per 500 ms window
    loud = np.array([1000, -1000] * 250, np.int16)  # 500 ms
    quiet = np.array([10, -10] * 250, np.int16)  # 500 ms
    payload = encode_wav_pcm16(np.concatenate([loud, quiet]), rate)
    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", payload, (None, None, 1000))],
        schema=MEDIA_SCHEMA,
    )
    got = {
        r["win_start_ms"]: r
        for r in extract_audio_windows(media, window_ms=500).collect()
    }
    assert set(got) == {0, 500}
    assert got[0]["n_samples"] == 500 and got[500]["n_samples"] == 500
    assert got[0]["rms"] == pytest.approx(1000.0)
    assert got[500]["rms"] == pytest.approx(10.0)
    assert got[0]["zcr"] == pytest.approx(499 / 500)


# ---- property tests (hypothesis): the codecs are total inverses ----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False

if _HAS_HYP:

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        gray=st.booleans(),
    )
    def test_prop_pnm_round_trip(w, h, seed, gray):
        rng = np.random.default_rng(seed)
        if gray:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            data = encode_pgm(img)
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            data = encode_ppm(img)
        out = decode_pnm(data)
        assert out.shape == img.shape and (out == img).all()

    @settings(max_examples=50, deadline=None)
    @given(
        n=st.integers(0, 3000),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_prop_wav_round_trip(n, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-(2**15), 2**15, n, dtype=np.int64).astype(np.int16)
        out, r = decode_wav(encode_wav_pcm16(s, rate))
        assert r == rate and out.shape == s.shape and (out == s).all()

    @settings(max_examples=30, deadline=None)
    @given(
        nf=st.integers(0, 6),
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        fps=st.integers(1, 60),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_prop_y4m_round_trip(nf, w, h, fps, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
        out, f = decode_y4m(encode_y4m(frames, fps))
        assert f == fps and out.shape == frames.shape and (out == frames).all()

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 30),
        h=st.integers(1, 30),
        ow=st.integers(1, 30),
        oh=st.integers(1, 30),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_prop_resize_shape_and_value_domain(w, h, ow, oh, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = resize_nearest(img, ow, oh)
        assert out.shape == (oh, ow, 3)
        # nearest-neighbor never invents values: every output pixel exists
        # somewhere in the source
        src = {tuple(p) for p in img.reshape(-1, 3)}
        assert {tuple(p) for p in out.reshape(-1, 3)} <= src


def test_extract_frame_features_zero_frame_y4m_yields_nulls(spark):
    """A structurally valid header-only Y4M (0 frames) must emit NULL
    features like any other undecodable row — not IndexError the whole
    Arrow batch via frames[-1]."""
    import numpy as np

    from etl_pipeline_challenge_aladia_spark.operators.codecs import encode_y4m
    from etl_pipeline_challenge_aladia_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_frame_features,
    )

    empty = encode_y4m(np.zeros((0, 4, 6), np.uint8), 1)
    frames = np.stack([np.full((4, 6), v, np.uint8) for v in (10, 20)])
    good = encode_y4m(frames, 1)
    media = spark.createDataFrame(
        [
            (1, "video", "video/x-yuv4mpeg", empty, (6, 4, 2000)),
            (2, "video", "video/x-yuv4mpeg", good, (6, 4, 2000)),
        ],
        schema=MEDIA_SCHEMA,
    )
    got = {
        (r["media_id"], r["frame_ts_ms"]): r
        for r in extract_frame_features(media, every_ms=1000).collect()
    }
    assert got[(1, 0)]["luma_mean"] is None and got[(1, 0)]["frame_index"] is None
    assert got[(2, 0)]["luma_mean"] == 10.0  # healthy rows unaffected


def test_compressed_image_sniff_and_guarded_fallback():
    """JPEG/PNG are sniffed by magic bytes; without PIL the feature kernel
    falls back to the deterministic stub (tagged: all values in [0,1)),
    and the resize kernel to the stub tag — a mixed corpus never errors."""
    from etl_pipeline_challenge_aladia_spark.operators.codecs import sniff_format
    from etl_pipeline_challenge_aladia_spark.operators import multimodal as mm

    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    assert sniff_format(jpeg) == "jpeg"
    assert sniff_format(png) == "png"
    assert sniff_format(b"garbage") is None

    if mm._pil_image() is None:
        for payload in (jpeg, png):
            feats = mm.real_feature_kernel(payload)
            assert feats == mm._stub_kernel(payload)
            assert all(0.0 <= v < 1.0 for v in feats)
            out = mm.real_resize_kernel(payload, 10, 10, 4, 4)
            assert out == mm._stub_resize_kernel(payload, 10, 10, 4, 4)


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="opt-in: Pillow not installed — the compressed-image decode "
    "path runs wherever PIL is available (the import-guard contract)",
)
def test_compressed_image_real_decode_with_pil():
    """With Pillow present the SAME kernels decode PNG for real: feature
    dims echo the image geometry (>= 1, distinguishing them from stub
    values in [0,1)) and resize emits a decodable PNG of the target
    geometry."""
    import io

    import numpy as np
    from PIL import Image

    from etl_pipeline_challenge_aladia_spark.operators import multimodal as mm

    img = np.zeros((12, 16, 3), np.uint8)
    img[:, :, 0] = 200
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    payload = buf.getvalue()

    feats = mm.real_feature_kernel(payload)
    assert feats[:3] == [16.0, 12.0, 3.0]
    assert abs(feats[3] - 200.0 / 3.0) < 1e-9  # mean over RGB

    out = mm.real_resize_kernel(payload, 16, 12, 8, 8)
    with Image.open(io.BytesIO(out)) as back:
        assert back.size == (8, 8)
