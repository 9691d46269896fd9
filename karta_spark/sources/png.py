"""Full PNG (RFC 2083 / ISO 15948) codec — every legal IHDR shape.

The fast path for the synthetic benchmark corpus lives in
``sources/images.py`` (8-bit gray/RGB, filter-0, non-interlaced — one
reshape).  Real web corpora are messier: paletted thumbnails, RGBA
sprites with alpha, 16-bit scientific captures, 1/2/4-bit scans, and
Adam7-interlaced progressive images.  This module decodes all of them
from scratch (zlib is in the stdlib; everything else is numpy), and
``images.decode_png`` falls back here whenever the header is not the
fast-path shape.

Coverage (PNG spec §11.2.2 table):

=========== ==================== =====================
color type  bit depths           output
=========== ==================== =====================
0 gray      1, 2, 4, 8, 16       HxW u8 (raw samples) / u16
2 RGB       8, 16                HxWx3 u8 / u16
3 palette   1, 2, 4, 8           HxWx3 u8 (HxWx4 with tRNS)
4 gray+A    8, 16                HxWx2 u8 / u16
6 RGBA      8, 16                HxWx4 u8 / u16
=========== ==================== =====================

Sub-8-bit grayscale returns RAW sample values (0..2^d-1), not display-
scaled — callers that need 0..255 scale by 255/(2^d-1) themselves.
tRNS on color types 0/2 appends an alpha plane (0 where the sample
matches the chroma-key, full otherwise).  Adam7 (interlace 1) is
reassembled from the seven independently-filtered passes.

The reference reads PNGs through GDAL/Pillow (karta _gdal.py:114-188
delegates all raster formats); this codec replicates the decoded-array
semantics without those libraries.  Encoder supports the same shapes
for fixture generation (deterministic, no external imaging libs in the
container) and exercises all five filter types.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7: (x0, y0, dx, dy) per pass (spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


# ---------------------------------------------------------------------------
# chunk plumbing
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _iter_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        yield tag, data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IEND":
            break


# ---------------------------------------------------------------------------
# filtering (spec §9) — byte-level, bpp = bytes per complete pixel (>=1)
# ---------------------------------------------------------------------------

def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering for one (sub)image -> (h, stride) u8."""
    if h == 0 or stride == 0:
        return np.zeros((h, stride), dtype=np.uint8)
    buf = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1))
    buf = buf.reshape(h, stride + 1)
    filters = buf[:, 0]
    if not filters.any():
        return buf[:, 1:].copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    pad = (-stride) % bpp  # lane-pad so Sub can cumsum lane-wise
    for i in range(h):
        f = int(filters[i])
        row = buf[i, 1:].astype(np.int32)
        prev = out[i - 1].astype(np.int32) if i else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 1:        # Sub: recon[j] = raw[j] + recon[j-bpp]
            lanes = np.concatenate([row, np.zeros(pad, np.int32)])
            lanes = lanes.reshape(-1, bpp)
            row = (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF) \
                .astype(np.int32).reshape(-1)[:stride]
        elif f == 2:        # Up
            row = (row + prev) & 0xFF
        elif f == 3:        # Average: floor((left + up) / 2)
            for j in range(stride):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif f == 4:        # Paeth
            for j in range(stride):
                a = int(row[j - bpp]) if j >= bpp else 0
                b = int(prev[j])
                c = int(out[i - 1, j - bpp]) if (i and j >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {f} invalid")
        out[i] = row.astype(np.uint8)
    return out


def _filter_rows(img: np.ndarray, bpp: int, filter_types) -> bytes:
    """Forward-filter (h, stride) u8 rows; filter_types is int or per-row."""
    h, stride = img.shape
    if isinstance(filter_types, int):
        filter_types = [filter_types] * h
    out = bytearray()
    for i in range(h):
        f = int(filter_types[i % len(filter_types)]) if h else 0
        row = img[i].astype(np.int32)
        prev = img[i - 1].astype(np.int32) if i else np.zeros(stride, np.int32)
        if f == 0:
            enc = row
        elif f == 1:
            left = np.zeros(stride, np.int32)
            left[bpp:] = row[:-bpp] if stride > bpp else 0
            enc = (row - left) & 0xFF
        elif f == 2:
            enc = (row - prev) & 0xFF
        elif f == 3:
            left = np.zeros(stride, np.int32)
            if stride > bpp:
                left[bpp:] = row[:-bpp]
            enc = (row - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            enc = np.zeros(stride, np.int32)
            for j in range(stride):
                a = int(row[j - bpp]) if j >= bpp else 0
                b = int(prev[j])
                c = int(img[i - 1, j - bpp]) if (i and j >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[j] = (row[j] - pred) & 0xFF
        else:
            raise ValueError(f"filter {f}")
        out.append(f)
        out += enc.astype(np.uint8).tobytes()
    return bytes(out)


# ---------------------------------------------------------------------------
# sample packing
# ---------------------------------------------------------------------------

def _unpack_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, stride) u8 scanline bytes -> (h, w*ch) samples (u8 or u16)."""
    h = rows.shape[0]
    n = w * ch
    if depth == 8:
        return rows[:, :n]
    if depth == 16:
        pairs = rows[:, :2 * n].reshape(h, n, 2).astype(np.uint16)
        return pairs[:, :, 0] * 256 + pairs[:, :, 1]
    # 1/2/4-bit: big-endian packing within each byte (spec §7.2) —
    # regroup the MSB-first bitstream into depth-wide fields
    bits = np.unpackbits(rows, axis=1)  # (h, stride*8), MSB first
    fields = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (fields * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :n]


def _pack_samples(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w*ch) samples -> (h, stride) u8 scanline bytes."""
    h, n = samples.shape
    if depth == 8:
        return samples.astype(np.uint8)
    if depth == 16:
        s = samples.astype(np.uint16)
        out = np.zeros((h, 2 * n), dtype=np.uint8)
        out[:, 0::2] = (s >> 8).astype(np.uint8)
        out[:, 1::2] = (s & 0xFF).astype(np.uint8)
        return out
    per = 8 // depth
    pad = (-n) % per
    s = np.concatenate(
        [samples.astype(np.uint8),
         np.zeros((h, pad), np.uint8)], axis=1)
    fields = np.zeros((h, s.shape[1], depth), dtype=np.uint8)
    for k in range(depth):
        fields[:, :, k] = (s >> (depth - 1 - k)) & 1
    return np.packbits(fields.reshape(h, -1), axis=1)


def _stride(w: int, ch: int, depth: int) -> int:
    return (w * ch * depth + 7) // 8


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_png_full(data: bytes) -> np.ndarray:
    """Decode any legal PNG.  See module docstring for output shapes."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    w = h = depth = ctype = interlace = 0
    idat, plte, trns = b"", None, None
    for tag, body in _iter_chunks(data):
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body[:13])
            if comp != 0 or filt != 0:
                raise ValueError("unknown compression/filter method")
            if ctype not in _VALID_DEPTHS or depth not in _VALID_DEPTHS[ctype]:
                raise ValueError(f"illegal color type {ctype}/depth {depth}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = body
    ch = _CHANNELS[ctype]
    bpp = max(1, (ch * depth) // 8)
    raw = zlib.decompress(idat)

    dt = np.uint16 if depth == 16 else np.uint8
    samples = np.zeros((h, w * ch), dtype=dt)
    if interlace == 0:
        rows = _unfilter(raw, h, _stride(w, ch, depth), bpp)
        samples = _unpack_samples(rows, w, ch, depth).astype(dt)
    elif interlace == 1:
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass contributes NO bytes (spec §8.2)
            st = _stride(pw, ch, depth)
            rows = _unfilter(raw[pos:], ph, st, bpp)
            pos += ph * (st + 1)
            sub = _unpack_samples(rows, pw, ch, depth).astype(dt)
            sub = sub.reshape(ph, pw, ch)
            full = samples.reshape(h, w, ch)
            full[y0::dy, x0::dx, :] = sub
    else:
        raise ValueError(f"interlace method {interlace}")

    img = samples.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            a = np.frombuffer(trns, dtype=np.uint8)
            alpha[:len(a)] = a
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if trns is not None and ctype == 0:
        (key,) = struct.unpack(">H", trns[:2])
        full = np.iinfo(dt).max if depth in (8, 16) else (1 << depth) - 1
        alpha = np.where(img[:, :, 0] == key, 0, full).astype(dt)
        return np.dstack([img[:, :, 0], alpha])
    if trns is not None and ctype == 2:
        kr, kg, kb = struct.unpack(">HHH", trns[:6])
        m = ((img[:, :, 0] == kr) & (img[:, :, 1] == kg)
             & (img[:, :, 2] == kb))
        alpha = np.where(m, 0, np.iinfo(dt).max).astype(dt)
        return np.dstack([img, alpha])
    return img[:, :, 0] if ch == 1 else img


# ---------------------------------------------------------------------------
# encode (fixture generation — deterministic, no imaging libs needed)
# ---------------------------------------------------------------------------

def encode_png_full(arr: np.ndarray, *, color_type: int | None = None,
                    bit_depth: int | None = None,
                    palette: np.ndarray | None = None,
                    trns: bytes | None = None,
                    interlace: int = 0,
                    filter_types=0) -> bytes:
    """Encode samples to PNG.

    ``arr``: gray HxW, or HxWxC with C in (2, 3, 4); for
    ``color_type=3`` pass palette INDICES as HxW plus ``palette``
    (Nx3 u8).  dtype u8 (depths 1..8 — values must fit) or u16
    (depth 16).  ``filter_types`` is an int or a per-row cycle,
    e.g. ``(0, 1, 2, 3, 4)`` to exercise every unfilter path.
    """
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if bit_depth is None:
        bit_depth = 16 if arr.dtype == np.uint16 else 8
    if color_type == 3 and palette is None:
        raise ValueError("color_type 3 needs a palette")
    if _CHANNELS[color_type] != ch:
        raise ValueError(f"color type {color_type} expects "
                         f"{_CHANNELS[color_type]} channels, got {ch}")
    if bit_depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(f"depth {bit_depth} illegal for type {color_type}")
    bpp = max(1, (ch * bit_depth) // 8)

    def pass_bytes(sub: np.ndarray) -> bytes:
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            return b""
        rows = _pack_samples(sub.reshape(ph, pw * ch), bit_depth)
        return _filter_rows(rows, bpp, filter_types)

    if interlace == 0:
        raw = pass_bytes(arr)
    else:
        raw = b"".join(
            pass_bytes(arr[y0::dy, x0::dx]) for (x0, y0, dx, dy) in _ADAM7)

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
                       interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE",
                      np.ascontiguousarray(palette, np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")
    return out


# ---------------------------------------------------------------------------
# deterministic variant corpus (gate-query + test fixtures)
# ---------------------------------------------------------------------------

VARIANTS = ("gray8", "rgb8_adam7", "pal4", "gray16", "rgba8", "gray1_adam7")


def variant_image(d: int, h: int = 12, w: int = 16):
    """Closed-form image for id ``d`` covering the IHDR matrix.

    Returns ``(expected_decoded_array, encode_kwargs, variant_name)``.
    Every formula is integer-exact and restated verbatim in the q77
    oracle SQL, so DuckDB regenerates the per-variant sample sums
    without running any codec.
    """
    v = d % 6
    ii, jj = np.mgrid[0:h, 0:w]
    if v == 0:
        arr = ((d * 7 + ii * 13 + jj * 29) % 256).astype(np.uint8)
        return arr, dict(color_type=0, bit_depth=8,
                         filter_types=(0, 1, 2, 3, 4)), VARIANTS[0]
    if v == 1:
        cc = np.arange(3)[None, None, :]
        arr = ((d * 7 + ii[:, :, None] * 13 + jj[:, :, None] * 29
                + 71 * cc) % 256).astype(np.uint8)
        return arr, dict(color_type=2, bit_depth=8, interlace=1,
                         filter_types=(2, 4)), VARIANTS[1]
    if v == 2:
        k = np.arange(16)
        pal = np.stack([(37 * k + 11) % 256, (59 * k + 3) % 256,
                        (83 * k + 7) % 256], axis=1).astype(np.uint8)
        idx = ((d + 3 * ii + 5 * jj) % 16).astype(np.uint8)
        return pal[idx], dict(color_type=3, bit_depth=4, palette=pal,
                              filter_types=(0, 1)), VARIANTS[2]
    if v == 3:
        arr = ((d * 2654435761 + ii * 65537 + jj * 12345)
               % 65536).astype(np.uint16)
        return arr, dict(color_type=0, bit_depth=16,
                         filter_types=(0, 2, 1)), VARIANTS[3]
    if v == 4:
        cc = np.arange(4)[None, None, :]
        arr = ((d + ii[:, :, None] * 2 + jj[:, :, None] * 3
                + 50 * cc) % 256).astype(np.uint8)
        arr[:, :, 3] = (d + ii + jj) % 256
        return arr, dict(color_type=6, bit_depth=8,
                         filter_types=(4,)), VARIANTS[4]
    arr = (((31 * ii + 17 * jj + d) % 5 != 0)).astype(np.uint8)
    return arr, dict(color_type=0, bit_depth=1, interlace=1), VARIANTS[5]


def variant_census_row(d: int, h: int = 12, w: int = 16):
    """Encode + decode id ``d``'s variant; return
    ``(variant, got_sum, n_px_match)`` where got_sum is the integer sum
    of every decoded sample and n_px_match counts pixel positions whose
    full channel vector matches the regenerated closed form."""
    expect, kwargs, name = variant_image(d, h, w)
    src = expect
    if kwargs.get("color_type") == 3:
        # encoder takes palette INDICES
        ii, jj = np.mgrid[0:h, 0:w]
        src = ((d + 3 * ii + 5 * jj) % 16).astype(np.uint8)
    got = decode_png_full(encode_png_full(src, **kwargs))
    got_sum = int(got.astype(np.int64).sum())
    if got.shape != expect.shape or got.dtype != expect.dtype:
        return name, got_sum, 0
    eq = (got == expect)
    n_match = int(eq.all(axis=2).sum() if eq.ndim == 3 else eq.sum())
    return name, got_sum, n_match


# ---------------------------------------------------------------------------
# APNG (animated PNG) — acTL/fcTL/fdAT on top of the core codec.
# Sticker/emoji corpora ship APNG heavily; frame sampling mirrors the
# GIF and MJPEG-AVI paths (gif.sample_frames / av.iter_mjpeg_frames).
# ---------------------------------------------------------------------------

def decode_apng(data: bytes):
    """Decode an APNG to composited full-canvas RGBA frames.

    Returns ``(frames (n, h, w, 4) uint8, delays (num, den) list)``.
    Honors dispose_op 0 none / 1 background (clear rect to fully
    transparent) / 2 previous, and blend_op 0 source / 1 over
    (straight-alpha compositing, integer math).  A plain PNG decodes
    as a single frame.  The default image (IDAT without a preceding
    fcTL) is not part of the animation per the spec."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    w = h = depth = ctype = interlace = 0
    plte = trns = None
    frames_meta = []   # per frame: (fctl dict, [raw chunks])
    idat_fctl = None
    idat = b""
    seen_actl = False
    for tag, body in _iter_chunks(data):
        if tag == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = \
                struct.unpack(">IIBBBBB", body[:13])
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"acTL":
            seen_actl = True
        elif tag == b"fcTL":
            fm = dict(zip(
                ("seq", "fw", "fh", "x", "y", "dnum", "dden",
                 "dispose", "blend"),
                struct.unpack(">IIIIIHHBB", body[:26])))
            frames_meta.append((fm, []))
        elif tag == b"IDAT":
            if frames_meta and not frames_meta[-1][1] and idat == b"" \
                    and len(frames_meta) == 1:
                idat_fctl = frames_meta[-1][0]
            idat += body
        elif tag == b"fdAT":
            if not frames_meta:
                raise ValueError("fdAT before any fcTL")
            frames_meta[-1][1].append(body[4:])  # drop sequence number

    def decode_sub(raw_idat: bytes, fw: int, fh: int) -> np.ndarray:
        # rebuild a standalone PNG for the sub-frame and reuse the core
        # decoder (same IHDR shape, sub-frame geometry)
        ihdr = struct.pack(">IIBBBBB", fw, fh, depth, ctype, 0, 0,
                           interlace)
        png = _SIG + _chunk(b"IHDR", ihdr)
        if plte is not None:
            png += _chunk(b"PLTE", plte)
        if trns is not None:
            png += _chunk(b"tRNS", trns)
        png += _chunk(b"IDAT", raw_idat) + _chunk(b"IEND", b"")
        return _to_rgba(decode_png_full(png))

    if not seen_actl or not frames_meta:
        return _to_rgba(decode_png_full(data))[None, ...], [(0, 100)]

    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    out, delays = [], []
    first = True
    for fm, chunks in frames_meta:
        if first and idat_fctl is fm:
            sub = decode_sub(idat, fm["fw"], fm["fh"])
        else:
            sub = decode_sub(b"".join(chunks), fm["fw"], fm["fh"])
        first = False
        before = canvas.copy()
        y, x, fh2, fw2 = fm["y"], fm["x"], fm["fh"], fm["fw"]
        rect = canvas[y:y + fh2, x:x + fw2]
        if fm["blend"] == 0:
            rect[:] = sub
        else:  # over: straight alpha, integer math per spec
            sa = sub[:, :, 3:4].astype(np.uint32)
            da = rect[:, :, 3:4].astype(np.uint32)
            oa = sa * 255 + da * (255 - sa)          # alpha * 255^2
            num = (sub[:, :, :3].astype(np.uint32) * sa * 255
                   + rect[:, :, :3].astype(np.uint32) * da * (255 - sa))
            rgb = np.where(oa > 0, num // np.maximum(oa, 1), 0)
            rect[:, :, :3] = rgb.astype(np.uint8)
            # oa = 255^2 * out_alpha  ->  byte alpha = oa / 255
            rect[:, :, 3] = (oa // 255).astype(np.uint8)[:, :, 0]
        out.append(canvas.copy())
        delays.append((fm["dnum"], fm["dden"] or 100))
        if fm["dispose"] == 1:
            canvas[y:y + fh2, x:x + fw2] = 0
        elif fm["dispose"] == 2:
            canvas = before
    return np.stack(out), delays


def _to_rgba(img: np.ndarray) -> np.ndarray:
    """Core-decoder output (any shape/depth) -> 8-bit RGBA."""
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    if img.ndim == 2:
        img = np.dstack([img] * 3)
    if img.shape[2] == 2:  # gray + alpha
        g, a = img[:, :, 0], img[:, :, 1]
        return np.dstack([g, g, g, a])
    if img.shape[2] == 3:
        return np.dstack([img,
                          np.full(img.shape[:2], 255, np.uint8)])
    return img


def encode_apng(frames, *, delays=(1, 10), offsets=None,
                dispose: int = 0, blend: int = 0) -> bytes:
    """Write an APNG from RGBA uint8 frames (list of (h,w,4) arrays;
    later frames may be smaller rects placed via ``offsets``).  Frame 0
    doubles as the default image (fcTL before IDAT)."""
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0

    def per(v, i):
        return v[i] if isinstance(v, list) else v

    def raw_zlib(fr):
        fh, fw = fr.shape[:2]
        rows = np.zeros((fh, fw * 4 + 1), np.uint8)
        rows[:, 1:] = fr.reshape(fh, fw * 4)
        return zlib.compress(rows.tobytes(), 6)

    for i, fr in enumerate(frames):
        fh, fw = fr.shape[:2]
        x, y = (offsets[i] if offsets else (0, 0)) if i else (0, 0)
        dn, dd = per(delays, i) if isinstance(delays, list) else delays
        fctl = struct.pack(">IIIIIHHBB", seq, fw, fh, x, y, dn, dd,
                           per(dispose, i), per(blend, i))
        seq += 1
        out += _chunk(b"fcTL", fctl)
        z = raw_zlib(fr)
        if i == 0:
            out += _chunk(b"IDAT", z)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    return out + _chunk(b"IEND", b"")
