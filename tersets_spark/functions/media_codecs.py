"""Dependency-free decoders/encoders for PUBLIC media container formats
— the honest backing for ``decode_backend='real'`` in
operators/multimodal.py (the container ships no PIL/librosa/ffmpeg, so
the engine carries its own pure-numpy codecs for the simplest open
formats):

* WAV  — RIFF/WAVE with PCM 8- or 16-bit payloads (chunk-walking
  parser, tolerant of extra chunks in any order).
* PPM  — binary Portable Pixmap ``P6`` (whitespace/comment-tolerant
  header). Concatenated P6 frames are accepted as a video stream —
  the same self-delimiting convention ffmpeg's ``image2pipe`` uses.
* BMP  — Windows bitmap, ``BITMAPINFOHEADER``, uncompressed 24bpp
  (BI_RGB), bottom-up or top-down rows, 4-byte row padding.

All decoders validate structure and raise ``ValueError`` on corrupt
payloads (never crash batch-wide — the featurizer maps errors per row).
Encoders exist so tests and the synthetic media table can produce real
bytes end-to-end without external fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_MEDIA_PIXELS = 64_000_000  # 64 MP: corrupt-header allocation guard
_MAX_MEDIA_SAMPLES = 256_000_000


# --------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 little-endian WAV. ``samples``: (n,) mono or (n, ch)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    s = np.clip(np.round(s), -32768, 32767).astype("<i2")
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Returns (samples (n, ch) float64 in [-1, 1], sample_rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("corrupt WAV: missing RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("corrupt WAV: truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_format, ch, rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or ch < 1 or rate < 1:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) - (len(data) % (2 * ch))], dtype="<i2")
    else:  # 8-bit PCM is unsigned, midpoint 128
        raw = np.frombuffer(data[: len(data) - (len(data) % ch)], dtype=np.uint8)
    # bound BEFORE the float64 conversion 8x-es the footprint
    if raw.size > _MAX_MEDIA_SAMPLES:
        raise ValueError("implausible WAV sample count")
    if bits == 16:
        x = raw.astype(np.float64) / 32768.0
    else:
        x = (raw.astype(np.float64) - 128.0) / 128.0
    return x.reshape(-1, ch), int(rate)


# --------------------------------------------------------------------- PPM


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary P6 from an (h, w, 3) uint8 array."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _ppm_token(payload: bytes, pos: int) -> tuple[bytes, int]:
    n = len(payload)
    while pos < n:
        b = payload[pos : pos + 1]
        if b == b"#":  # comment to end of line
            while pos < n and payload[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif b.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not payload[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("corrupt PPM: truncated header")
    return payload[start:pos], pos


def decode_ppm(payload: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode one P6 frame starting at ``pos``; returns (img (h, w, 3)
    uint8, next_pos) so concatenated frames parse as a stream."""
    magic, pos = _ppm_token(payload, pos)
    if magic != b"P6":
        raise ValueError("corrupt PPM: bad magic")
    wtok, pos = _ppm_token(payload, pos)
    htok, pos = _ppm_token(payload, pos)
    mtok, pos = _ppm_token(payload, pos)
    try:
        w, h, maxval = int(wtok), int(htok), int(mtok)
    except ValueError as ex:
        raise ValueError("corrupt PPM: non-numeric header") from ex
    if w < 1 or h < 1 or maxval != 255 or w * h > _MAX_MEDIA_PIXELS:
        raise ValueError(f"unsupported PPM: {w}x{h} maxval={maxval}")
    pos += 1  # single whitespace byte after maxval
    need = w * h * 3
    raw = payload[pos : pos + need]
    if len(raw) < need:
        raise ValueError("corrupt PPM: truncated pixel data")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), pos + need


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Concatenated P6 frames (the ffmpeg image2pipe convention)."""
    frames = []
    pos = 0
    while pos < len(payload):
        img, pos = decode_ppm(payload, pos)
        frames.append(img)
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
    if not frames:
        raise ValueError("corrupt PPM stream: no frames")
    return frames


# --------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24bpp bottom-up BMP from (h, w, 3) uint8 RGB."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3
    bgr = a[::-1, :, ::-1]  # bottom-up rows, BGR order
    pad = (-(w * 3)) % 4
    rows = b"".join(
        bgr[r].tobytes() + b"\x00" * pad for r in range(h)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + rows


def decode_bmp(payload: bytes) -> np.ndarray:
    """Returns (h, w, 3) uint8 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("corrupt BMP: missing BM header")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: hdr={hdr_size} bpp={bpp} compression={compression}"
        )
    bottom_up = h > 0
    h = abs(h)
    if w < 1 or h < 1 or w * h > _MAX_MEDIA_PIXELS:
        raise ValueError(f"corrupt BMP: implausible dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raw = payload[offset : offset + need]
    if len(raw) < need:
        raise ValueError("corrupt BMP: truncated pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


# --------------------------------------------------------- featurization


def image_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Unit-norm grayscale thumbnail embedding: luma -> nearest-neighbor
    resample to an s*s grid (s*s == dim) -> mean-centered unit vector.
    The classic perceptual-hash front half, numpy only."""
    side = int(np.sqrt(dim))
    if side * side != dim:
        raise ValueError(f"image feature dim must be a perfect square, got {dim}")
    luma = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    )
    h, w = luma.shape
    ri = np.minimum((np.arange(side) + 0.5) * h / side, h - 1).astype(np.int64)
    ci = np.minimum((np.arange(side) + 0.5) * w / side, w - 1).astype(np.int64)
    v = luma[ri][:, ci].ravel().astype(np.float64)
    v = v - v.mean()
    n = np.linalg.norm(v)
    if n < 1e-12:
        v = np.zeros(dim)
        v[0] = 1.0
        return v.astype(np.float32)
    return (v / n).astype(np.float32)


def audio_features(samples: np.ndarray, dim: int = 64) -> np.ndarray:
    """Unit-norm magnitude-spectrum embedding: mono mean -> rfft ->
    ``dim`` linear frequency bands, band-averaged."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if mono.size == 0:
        v = np.zeros(dim)
        v[0] = 1.0
        return v.astype(np.float32)
    mag = np.abs(np.fft.rfft(mono))
    edges = np.linspace(0, mag.size, dim + 1).astype(np.int64)
    v = np.array(
        [mag[a:b].mean() if b > a else 0.0 for a, b in zip(edges[:-1], edges[1:])]
    )
    n = np.linalg.norm(v)
    if n < 1e-12:
        v = np.zeros(dim)
        v[0] = 1.0
        return v.astype(np.float32)
    return (v / n).astype(np.float32)


def real_features(payload: bytes, dim: int = 64) -> np.ndarray:
    """Sniff the container by magic bytes and featurize: WAV -> spectrum
    bands; PPM (single frame or stream) -> mean of per-frame thumbnail
    embeddings; BMP -> thumbnail embedding."""
    if payload[:4] == b"RIFF":
        return audio_features(decode_wav(payload)[0], dim)
    if payload[:2] == b"P6":
        frames = decode_ppm_stream(payload)
        acc = np.mean([image_features(f, dim) for f in frames], axis=0)
        n = np.linalg.norm(acc)
        if n < 1e-12:
            acc = np.zeros(dim)
            acc[0] = 1.0
            return acc.astype(np.float32)
        return (acc / n).astype(np.float32)
    if payload[:2] == b"BM":
        return image_features(decode_bmp(payload), dim)
    raise ValueError("unrecognized media container (want RIFF/P6/BM)")


def decode_frames(payload: bytes) -> list[np.ndarray]:
    """Sniff the container and return the list of RGB frames (uint8
    HxWx3): PPM single frame or concatenated stream, BMP single frame.
    Audio containers raise — frame ops do not apply to them."""
    if payload[:2] == b"P6":
        return decode_ppm_stream(payload)
    if payload[:2] == b"BM":
        return [decode_bmp(payload)]
    if payload[:4] == b"RIFF":
        raise ValueError("audio container has no frames to resize")
    raise ValueError("unrecognized media container (want P6/BM)")


def box_resize(img: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor box-average downsample of an RGB frame, returned
    as float64 (h/f, w/f, 3). The mean over all blocks of the result
    equals the mean of the input up to float64 summation rounding —
    the invariant the resize driver gate checks. Dims must divide."""
    h, w = img.shape[0], img.shape[1]
    if factor <= 0 or h % factor or w % factor:
        raise ValueError(f"dims {w}x{h} not divisible by factor {factor}")
    a = img.astype(np.float64).reshape(h // factor, factor, w // factor, factor, 3)
    return a.mean(axis=(1, 3))


def box_resample(samples: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor box-average decimation of (n, ch) audio samples,
    returned float64 (n/f, ch). Mean over windows preserves the global
    mean up to float64 summation rounding — the resample driver gate's
    invariant. Sample count must divide."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    n = s.shape[0]
    if factor <= 0 or n % factor:
        raise ValueError(f"{n} samples not divisible by factor {factor}")
    return s.reshape(n // factor, factor, s.shape[1]).mean(axis=1)
