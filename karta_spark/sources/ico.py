"""ICO (favicon) codec — every site ships one; crawls collect millions.

Implements the Windows ICO container: ICONDIR + ICONDIRENTRY table,
entries holding either an embedded PNG (modern 256px favicons; decoded
by sources/png.py) or a BMP DIB — a BITMAPINFOHEADER with DOUBLED
height covering the bottom-up XOR bitmap (32/24/8/4/1 bpp, palettized
below 16bpp) plus the 1-bit AND transparency mask, rows padded to
32-bit boundaries.  Output is RGBA per entry.

The reference reads icons via PIL/GDAL (beyond-reference at this
layer).  Writer emits PNG entries and 32bpp DIB entries for fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


def _decode_dib(data: bytes) -> np.ndarray:
    (hsz, w, h2, _planes, bpp) = struct.unpack_from("<IiiHH", data, 0)
    h = h2 // 2  # XOR + AND masks share the doubled height
    comp = struct.unpack_from("<I", data, 16)[0]
    if comp != 0:
        raise NotImplementedError(f"ICO DIB compression {comp}")
    pos = hsz
    pal = None
    if bpp <= 8:
        ncol = struct.unpack_from("<I", data, 32)[0] or (1 << bpp)
        pal = np.frombuffer(data, np.uint8, ncol * 4, pos) \
            .reshape(ncol, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        pos += ncol * 4
    row_bytes = (w * bpp + 31) // 32 * 4
    xor = np.frombuffer(data, np.uint8, row_bytes * h, pos) \
        .reshape(h, row_bytes)[::-1]  # bottom-up
    pos += row_bytes * h
    and_row = (w + 31) // 32 * 4
    if pos + and_row * h <= len(data):
        bits = np.unpackbits(
            np.frombuffer(data, np.uint8, and_row * h, pos)
            .reshape(h, and_row), axis=1)[:, :w][::-1]
        alpha_mask = np.where(bits == 1, 0, 255).astype(np.uint8)
    else:
        alpha_mask = np.full((h, w), 255, np.uint8)
    out = np.zeros((h, w, 4), np.uint8)
    if bpp == 32:
        px = xor[:, :4 * w].reshape(h, w, 4)
        out[:, :, 0] = px[:, :, 2]
        out[:, :, 1] = px[:, :, 1]
        out[:, :, 2] = px[:, :, 0]
        out[:, :, 3] = px[:, :, 3]
        if not out[:, :, 3].any():  # legacy 32bpp with empty alpha
            out[:, :, 3] = alpha_mask
        return out
    if bpp == 24:
        px = xor[:, :3 * w].reshape(h, w, 3)
        out[:, :, :3] = px[:, :, ::-1]
        out[:, :, 3] = alpha_mask
        return out
    if bpp in (1, 4, 8):
        if bpp == 8:
            idx = xor[:, :w]
        else:
            bits = np.unpackbits(xor, axis=1)
            fields = bits.reshape(h, -1, bpp)
            weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
            idx = (fields * weights).sum(axis=2)[:, :w]
        out[:, :, :3] = pal[np.clip(idx, 0, len(pal) - 1)]
        out[:, :, 3] = alpha_mask
        return out
    raise NotImplementedError(f"ICO DIB bpp {bpp}")


def decode_ico(data: bytes) -> list[dict]:
    """Parse an ICO/CUR file -> one dict per entry:
    ``dict(w, h, rgba (h,w,4) uint8)``, directory order."""
    rsv, typ, count = struct.unpack_from("<HHH", data, 0)
    if rsv != 0 or typ not in (1, 2):
        raise ValueError("not an ICO/CUR file")
    out = []
    for k in range(count):
        (bw, bh, _nc, _r, _p, _bpp, size, off) = struct.unpack_from(
            "<BBBBHHII", data, 6 + 16 * k)
        blob = data[off:off + size]
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            from karta_spark.sources.png import decode_png_full
            img = decode_png_full(blob)
            if img.ndim == 2:
                img = np.dstack([img] * 3)
            if img.shape[2] == 3:
                img = np.dstack([img, np.full(img.shape[:2], 255,
                                              np.uint8)])
            rgba = img
        else:
            rgba = _decode_dib(blob)
        out.append(dict(w=rgba.shape[1], h=rgba.shape[0], rgba=rgba))
    return out


def encode_ico(images: list[np.ndarray], *, as_png: bool = False) -> bytes:
    """Write RGBA uint8 arrays as an ICO (32bpp DIB entries, or PNG
    entries when ``as_png`` — the modern 256px layout)."""
    blobs = []
    for img in images:
        img = np.ascontiguousarray(img, np.uint8)
        h, w = img.shape[:2]
        if as_png:
            from karta_spark.sources.png import encode_png_full
            blobs.append(encode_png_full(img, color_type=6))
            continue
        hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0,
                          w * h * 4, 0, 0, 0, 0)
        px = np.zeros((h, w, 4), np.uint8)
        px[:, :, 0] = img[:, :, 2]
        px[:, :, 1] = img[:, :, 1]
        px[:, :, 2] = img[:, :, 0]
        px[:, :, 3] = img[:, :, 3]
        and_row = (w + 31) // 32 * 4
        blobs.append(hdr + px[::-1].tobytes()
                     + b"\x00" * (and_row * h))
    out = struct.pack("<HHH", 0, 1, len(images))
    off = 6 + 16 * len(images)
    for img, blob in zip(images, blobs):
        h, w = img.shape[:2]
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                           len(blob), off)
        off += len(blob)
    return out + b"".join(blobs)
