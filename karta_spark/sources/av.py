"""Audio/video container codecs — pure python + numpy.

Closes the last two stubs in the multimodal surface without external
codec libraries:

- **WAV (RIFF PCM / IEEE-float)**: encode/decode of 8/16/32-bit integer
  PCM and 32-bit float, mono or multi-channel — the standard uncompressed
  audio interchange format.
- **MJPEG-in-AVI**: a RIFF AVI writer/reader whose video stream is
  Motion-JPEG — each frame is a baseline JPEG (sources/jpeg.py), so frame
  sampling decodes real lossy video end-to-end with zero dependencies.

Compressed audio (mp3/ogg) and inter-frame video codecs (h264 etc.)
remain out of scope — those genuinely need external decoders.
"""

from __future__ import annotations

import struct

import numpy as np

from karta_spark.sources.jpeg import decode_jpeg_baseline, encode_jpeg_baseline


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """PCM WAV: samples float in [-1, 1] (any shape (n,) or (n, ch)) or
    integer arrays passed through. bits: 8 (unsigned), 16/32 (signed int)
    or 'float32'."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if bits == "float32" or bits == 32.5:
        fmt_code, width = 3, 4
        data = s.astype("<f4").tobytes()
    else:
        fmt_code, width = 1, bits // 8
        if np.issubdtype(s.dtype, np.floating):
            full = float(2 ** (bits - 1) - 1)
            q = np.clip(np.round(s * full), -(2 ** (bits - 1)), 2 ** (bits - 1) - 1)
        else:
            q = s
        if bits == 8:
            data = (q.astype(np.int64) + 128).astype("<u1").tobytes()
        elif bits == 16:
            data = q.astype("<i2").tobytes()
        elif bits == 32:
            data = q.astype("<i4").tobytes()
        else:
            raise ValueError("bits must be 8, 16, 32 or 'float32'")
    byte_rate = sample_rate * ch * width
    block_align = ch * width
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sample_rate, byte_rate,
                      block_align, width * 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """-> (samples float64 (n, ch) scaled to [-1, 1], sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_code = ch = sr = bits = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            if fmt_code is None:
                raise ValueError("WAV data chunk before fmt chunk")
            if fmt_code == 3 and bits == 32:
                arr = np.frombuffer(body, dtype="<f4").astype(np.float64)
            elif fmt_code == 1 and bits == 8:
                arr = (np.frombuffer(body, dtype="<u1").astype(np.float64) - 128.0) / 127.0
            elif fmt_code == 1 and bits == 16:
                arr = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32767.0
            elif fmt_code == 1 and bits == 32:
                arr = np.frombuffer(body, dtype="<i4").astype(np.float64) / 2147483647.0
            else:
                raise NotImplementedError(
                    f"WAV format code {fmt_code} / {bits}-bit not supported "
                    "(PCM 8/16/32 and float32 are)")
            samples = arr.reshape(-1, ch)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None:
        raise ValueError("WAV stream has no data chunk")
    return samples, int(sr)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_mjpeg_avi(frames, fps: int = 30, quality: int = 95) -> bytes:
    """Encode uint8 RGB/gray frames (equal shapes) as a Motion-JPEG AVI."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg_baseline(f, quality) for f in frames]
    n = len(jpegs)
    us_per_frame = int(1_000_000 / fps)
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack("<IIIIIIIIIIIIII", us_per_frame, max_bytes * fps, 0,
                       0x10, n, 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
            1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0, 0)
            + struct.pack("<HHHH", 0, 0, w, h))
    # BITMAPINFOHEADER
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_body = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_body)

    # idx1 index (offsets relative to the start of 'movi' kind tag)
    idx = b""
    off = 4
    for j in jpegs:
        size = len(j)
        idx += b"00dc" + struct.pack("<III", 0x10, off, size)
        off += 8 + size + (size & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_mjpeg_frames(data: bytes):
    """Yield decoded (frame_idx, np.ndarray) from an MJPEG AVI stream."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    # find the movi LIST
    pos = 12
    movi_start = movi_end = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if tag == b"LIST" and data[pos + 8:pos + 12] == b"movi":
            movi_start = pos + 12
            movi_end = pos + 8 + size
            break
        pos += 8 + size + (size & 1)
    if movi_start is None:
        raise ValueError("AVI stream has no movi list")
    p = movi_start
    idx = 0
    while p + 8 <= movi_end:
        tag = data[p:p + 4]
        (size,) = struct.unpack("<I", data[p + 4:p + 8])
        if tag.endswith(b"dc") or tag.endswith(b"db"):
            payload = data[p + 8:p + 8 + size]
            if payload[:2] == b"\xff\xd8":
                yield idx, decode_jpeg_baseline(payload)
            idx += 1
        p += 8 + size + (size & 1)
