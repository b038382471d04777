"""Pure-numpy media codecs: real decode kernels for the multimodal path.

The sandbox has no PIL/ffmpeg/librosa, but three classic container formats
are simple enough to decode with numpy alone, which turns the multimodal
plumbing (operators/multimodal.py) from "stub kernel" into a REAL
decode -> feature pipeline, end-to-end testable:

- **PPM (P6) / PGM (P5)** — binary NetPBM images: ASCII header
  (magic, width, height, maxval) followed by raw interleaved samples.
- **WAV (RIFF, PCM16)** — canonical 44-byte-ish header chunks + raw
  little-endian int16 frames.
- **Y4M (YUV4MPEG2, C444/mono plane)** — plain-text stream header, then
  ``FRAME\\n`` + raw luma plane per frame. The uncompressed cousin of what
  ffmpeg pipes between filters.

These are the *uncompressed* members of each modality's format family —
exactly the formats a real pipeline uses between stages (ffmpeg's
``-f rawvideo``/y4m pipes, sox's ``.wav``, ImageMagick's ``ppm:-``). A
JPEG/H.264 decoder still needs native libs; the kernel dispatch
(`sniff_modality` in operators/multimodal.py) keeps that injection point
open while giving every uncompressed payload a real decode today.

Replaces the reference's implicit "payload is opaque" treatment
(reference consumer/DoFns carry only JSON payloads) with typed media
handling; no counterpart exists in the 418-LoC reference to copy.

Encoders exist so tests and the synthetic fixture can build REAL payloads
deterministically; decoders are the product surface.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# PPM / PGM (NetPBM binary)
# --------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6) bytes."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3, got {img.shape}")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def encode_pgm(img: np.ndarray) -> bytes:
    """HxW uint8 -> binary PGM (P5) bytes."""
    if img.ndim != 2:
        raise ValueError(f"expected HxW, got {img.shape}")
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def _pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary NetPBM header -> (magic, width, height, maxval,
    payload_offset). Handles ``#`` comments and arbitrary whitespace, per
    the NetPBM spec."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: magic {magic!r}")
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":  # comment to end of line
            while i < n and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated NetPBM header")
        fields.append(int(data[i:j]))
        i = j
    i += 1  # exactly one whitespace byte separates header and payload
    w, h, maxval = fields
    return magic, w, h, maxval, i


def decode_pnm(data: bytes) -> np.ndarray:
    """PPM (P6) -> HxWx3 uint8; PGM (P5) -> HxW uint8."""
    magic, w, h, maxval, off = _pnm_header(data)
    if maxval > 255:
        raise ValueError(f"16-bit NetPBM unsupported (maxval {maxval})")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    flat = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    if flat.size < need:
        raise ValueError(f"truncated NetPBM payload: {flat.size} < {need}")
    return flat.reshape((h, w, 3)) if channels == 3 else flat.reshape((h, w))


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index maps — pure fancy
    indexing, no interpolation libs. Matches the pixel-center convention
    (sample at (i + 0.5) * in/out) used by OpenCV's INTER_NEAREST."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[rows[:, None], cols[None, :]]


# --------------------------------------------------------------------------
# WAV (RIFF PCM16)
# --------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 mono samples -> canonical RIFF/WAVE bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono -> (int16 samples, sample_rate).

    Walks the chunk list (a real WAV may carry LIST/INFO chunks before
    ``data``), so this is a spec-shaped parser, not a fixed-offset slice.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i, n = 12, len(data)
    sample_rate, bits, channels = None, None, None
    samples = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1:
                raise ValueError(f"non-PCM WAV (fmt tag {fmt_tag})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"expected 16-bit mono, got {bits}-bit x{channels}")
    return samples, sample_rate


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2, mono luma plane)
# --------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """NxHxW uint8 luma frames -> YUV4MPEG2 bytes (Cmono colourspace)."""
    if frames.ndim != 3:
        raise ValueError(f"expected NxHxW, got {frames.shape}")
    _, h, w = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 Cmono\n" % (w, h, fps)]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 (Cmono) -> (NxHxW uint8 luma frames, fps)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    for tok in data[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = int(num) // max(1, int(den))
        elif tok[:1] == b"C" and tok != b"Cmono":
            raise ValueError(f"only Cmono supported, got {tok!r}")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    frame_bytes = w * h
    frames = []
    i = nl + 1
    n = len(data)
    while i < n:
        fl = data.find(b"\n", i)
        if fl < 0 or data[i : i + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {i}")
        start = fl + 1
        plane = np.frombuffer(data, dtype=np.uint8, count=frame_bytes, offset=start)
        if plane.size < frame_bytes:
            raise ValueError("truncated Y4M frame")
        frames.append(plane.reshape((h, w)))
        i = start + frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), fps or 0


# --------------------------------------------------------------------------
# Format sniffing
# --------------------------------------------------------------------------

#: magic-byte prefix -> container name; jpeg/png are sniffed so the
#: feature/resize kernels can route them to PIL when it is installed
#: (operators/multimodal.py) — no pure-numpy decoder exists for them here
_MAGICS = (
    (b"P6", "ppm"),
    (b"P5", "pgm"),
    (b"RIFF", "wav"),
    (b"YUV4MPEG2", "y4m"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"ID3", "mp3"),
)


def sniff_format(data: bytes) -> str | None:
    """Identify a payload's container from magic bytes, or None.

    Compressed A/V containers are sniffed too — mp3 by ID3 tag or a
    VALID frame-sync header (11 sync bits set, non-reserved version,
    non-zero layer — the standard check, so arbitrary 0xFF-leading
    bytes don't misfire), mp4 by the ISO-BMFF ``ftyp`` box at offset 4.
    No pure-numpy decoder exists for them; the feature kernels route
    them to librosa/soundfile/PyAV when installed
    (operators/multimodal.py) and to the deterministic stub otherwise."""
    for magic, name in _MAGICS:
        if data[: len(magic)] == magic:
            if name == "wav" and data[8:12] != b"WAVE":
                continue
            return name
    if len(data) >= 8 and data[4:8] == b"ftyp":
        return "mp4"
    if (
        len(data) >= 4
        and data[0] == 0xFF
        and (data[1] & 0xE0) == 0xE0
        and (data[1] >> 3) & 0x3 != 0x1  # MPEG version: reserved
        and (data[1] >> 1) & 0x3 != 0x0  # layer: reserved
    ):
        return "mp3"
    return None
