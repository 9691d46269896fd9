"""GIF87a/89a codec from scratch — web corpora's animation workhorse.

Crawl-scale image pipelines meet GIFs constantly (memes, stickers,
UI sprites); the multimodal ingest path needs to decode them and sample
animation frames exactly like ``sources/av.py`` samples MJPEG-AVI
video.  The reference delegates all raster decoding to GDAL/Pillow
(karta _gdal.py:114-188); this module replicates decoded-frame
semantics with stdlib + numpy only.

Coverage:

- GIF87a and GIF89a, global and per-frame local color tables
- LZW decompression (LSB-first packing, variable 3..12-bit codes,
  deferred-clear tolerant) and a real LZW compressor for writing
- 4-pass row interlacing
- Graphic Control Extension: per-frame delay, transparency index, and
  disposal methods 0/1 (leave), 2 (restore background), 3 (restore
  previous) — composited exactly when reassembling full frames
- application / comment / plain-text extension blocks skipped per spec

API: ``decode_gif`` returns raw per-frame index rects + palettes;
``gif_frames`` composites to full-canvas RGB frames + delays (the
training-pipeline shape: ``sample_frames`` picks every k-th like the
AVI path); ``encode_gif`` writes animations for fixture generation.
"""

from __future__ import annotations

import struct

import numpy as np

# 4-pass interlace row schedule (spec appendix E)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF flavor: LSB-first bit packing, late code-width change)
# ---------------------------------------------------------------------------

def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Decode a GIF LZW stream to ``n_pixels`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # table as prefix links: entry -> (prefix_code, last_symbol, first, len)
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    first = np.zeros(4096, dtype=np.uint8)
    length = np.zeros(4096, dtype=np.int32)
    for c in range(clear):
        last[c] = first[c] = c
        length[c] = 1
    next_code = eoi + 1

    out = np.zeros(n_pixels, dtype=np.uint8)
    pos = 0
    bitbuf = bitcnt = 0
    prev = -1
    i = 0
    n = len(data)

    def emit(code: int, at: int) -> int:
        ln = int(length[code])
        c = code
        for k in range(ln - 1, -1, -1):
            if at + k < n_pixels:
                out[at + k] = last[c]
            c = int(prefix[c])
        return min(ln, n_pixels - at)

    while i < n or bitcnt >= width:
        while bitcnt < width and i < n:
            bitbuf |= data[i] << bitcnt
            bitcnt += 8
            i += 1
        if bitcnt < width:
            break
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            out[pos] = last[code]
            pos += 1
            prev = code
        else:
            if code < next_code:
                pos += emit(code, pos)
                if next_code < 4096:
                    prefix[next_code] = prev
                    last[next_code] = first[code]
                    first[next_code] = first[prev]
                    length[next_code] = length[prev] + 1
                    next_code += 1
            elif code == next_code and next_code < 4096:
                # KwKwK case: prev + first(prev)
                prefix[next_code] = prev
                last[next_code] = first[prev]
                first[next_code] = first[prev]
                length[next_code] = length[prev] + 1
                next_code += 1
                pos += emit(code, pos)
            else:
                raise ValueError(f"corrupt LZW code {code} (next {next_code})")
            prev = code
            if next_code == (1 << width) and width < 12:
                width += 1
        if pos >= n_pixels:
            break
    if pos < n_pixels:
        raise ValueError(f"LZW stream short: {pos}/{n_pixels} pixels")
    return out


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW compressor (dict-based, clear-on-full)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def put(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    width = min_code_size + 1
    table: dict[tuple, int] = {(c,): c for c in range(clear)}
    next_code = eoi + 1
    put(clear, width)
    seq: tuple = ()
    for s in np.asarray(indices, dtype=np.uint8).ravel():
        s = int(s)
        cand = seq + (s,)
        if cand in table:
            seq = cand
            continue
        # width for THIS emit: grows only after the table entry whose
        # index filled the current width was added (late change)
        if next_code > (1 << width):
            width += 1
        put(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            if 4096 > (1 << width):
                width += 1
            put(clear, width)
            table = {(c,): c for c in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (s,)
    if seq:
        if next_code > (1 << width):
            width += 1
        put(table[seq], width)
    if next_code + 1 > (1 << width) and width < 12:
        width += 1
    put(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _sub_blocks(data: bytes, pos: int):
    """Collect data sub-blocks; return (payload, new_pos)."""
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos:pos + n])
        pos += n
    return b"".join(chunks), pos


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = []
    for start, step in _INTERLACE:
        order.extend(range(start, h, step))
    out = np.zeros_like(idx)
    out[order] = idx
    return out


def decode_gif(data: bytes) -> dict:
    """Parse a GIF; returns dict with ``w h bg gct frames``, each frame
    ``dict(left, top, indices (fh,fw) u8, palette (N,3) u8, delay_cs,
    transparent, disposal)``."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    delay_cs, transparent, disposal = 0, None, 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # GCE
                packed, delay_cs, tidx = struct.unpack("<BHB", payload[:4])
                disposal = (packed >> 2) & 7
                transparent = tidx if (packed & 1) else None
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        left, top, fw, fh, fflags = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        pal = gct
        if fflags & 0x80:
            n = 2 << (fflags & 7)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        payload, pos = _sub_blocks(data, pos)
        idx = lzw_decode(payload, min_code, fw * fh).reshape(fh, fw)
        if fflags & 0x40:
            idx = _deinterlace(idx)
        frames.append(dict(left=left, top=top, indices=idx, palette=pal,
                           delay_cs=delay_cs, transparent=transparent,
                           disposal=disposal))
        delay_cs, transparent, disposal = 0, None, 0
    return dict(w=w, h=h, bg=bg, gct=gct, frames=frames)


def gif_frames(data: bytes):
    """Composite to full-canvas RGB frames.

    Returns ``(frames (n,h,w,3) u8, delays_cs list[int])`` with disposal
    methods honored: 0/1 leave the canvas, 2 restores the frame rect to
    the background color, 3 restores the pre-frame canvas.
    """
    g = decode_gif(data)
    w, h = g["w"], g["h"]
    # Wild GIFs routinely carry a background index >= GCT size; fall back
    # to black rather than breaking the uniform ValueError contract with
    # an IndexError.
    bg_rgb = (g["gct"][g["bg"]]
              if g["gct"] is not None and 0 <= g["bg"] < len(g["gct"])
              else np.zeros(3, np.uint8))
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    out, delays = [], []
    for fr in g["frames"]:
        before = canvas.copy()
        t, l = fr["top"], fr["left"]
        fh, fw = fr["indices"].shape
        rect = canvas[t:t + fh, l:l + fw]
        rgb = fr["palette"][fr["indices"]]
        if fr["transparent"] is not None:
            m = fr["indices"] != fr["transparent"]
            rect[m] = rgb[m]
        else:
            rect[:] = rgb
        out.append(canvas.copy())
        delays.append(fr["delay_cs"])
        d = fr["disposal"]
        if d == 2:
            canvas[t:t + fh, l:l + fw] = bg_rgb
        elif d == 3:
            canvas = before
    return (np.stack(out) if out else np.zeros((0, h, w, 3), np.uint8),
            delays)


def sample_frames(data: bytes, every: int = 1, limit: int | None = None):
    """Every ``every``-th composited frame (the AVI-path shape,
    av.py:150): returns ``(frame_ids, frames (k,h,w,3))``."""
    frames, _ = gif_frames(data)
    ids = np.arange(0, len(frames), every)
    if limit is not None:
        ids = ids[:limit]
    return ids, frames[ids]


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_gif(frames, palette=None, *, delays_cs=0, transparent=None,
               disposal=0, interlace=False, local_palettes=None,
               bg: int = 0, loop: bool = False) -> bytes:
    """Write a GIF89a (or an animation).

    ``frames``: list of HxW u8 palette-index arrays (or a single array).
    ``palette``: global (N,3) u8; ``local_palettes`` optionally a list
    of per-frame tables (None entries use the global).  ``delays_cs``/
    ``transparent``/``disposal`` may be scalars or per-frame lists.
    """
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    n_fr = len(frames)

    def per(v, i):
        return v[i] if isinstance(v, (list, tuple)) else v

    h, w = frames[0].shape
    out = bytearray(b"GIF89a")

    def pal_bits(p):
        n = len(p)
        bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
        return bits

    if palette is not None:
        bits = pal_bits(palette)
        out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4)
                           | (bits - 1), bg, 0)
        full = np.zeros((1 << bits, 3), np.uint8)
        full[:len(palette)] = palette
        out += full.tobytes()
    else:
        out += struct.pack("<HHBBB", w, h, 0, bg, 0)
    if loop:
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i, fr in enumerate(frames):
        fr = np.asarray(fr, dtype=np.uint8)
        fh, fw = fr.shape
        tr = per(transparent, i)
        dl = per(delays_cs, i)
        dp = per(disposal, i)
        if tr is not None or dl or dp:
            packed = ((dp & 7) << 2) | (1 if tr is not None else 0)
            out += b"\x21\xF9\x04" + struct.pack(
                "<BHB", packed, int(dl), int(tr or 0)) + b"\x00"
        lp = local_palettes[i] if local_palettes else None
        fflags = 0x40 if interlace else 0
        if lp is not None:
            bits = pal_bits(lp)
            fflags |= 0x80 | (bits - 1)
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, fw, fh, fflags)
        if lp is not None:
            full = np.zeros((1 << bits, 3), np.uint8)
            full[:len(lp)] = lp
            out += full.tobytes()
        use_pal = lp if lp is not None else palette
        min_code = max(2, pal_bits(use_pal))
        body = fr
        if interlace:
            order = []
            for start, step in _INTERLACE:
                order.extend(range(start, fh, step))
            body = fr[order]
        out.append(min_code)
        payload = lzw_encode(body, min_code)
        for k in range(0, len(payload), 255):
            chunk = payload[k:k + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# deterministic animated corpus (gate-query + test fixtures)
# ---------------------------------------------------------------------------

def animated_variant(d: int, h: int = 10, w: int = 12):
    """Closed-form 4-frame animation for id ``d``.

    Frame k's indices are ``(d + 7k + 3i + 5j) % 16``; frames 1..3 mark
    index 0 transparent (disposal 1, so it shows through to the last
    opaque layer); odd ids are interlaced; ids divisible by 3 give
    frame 2 a LOCAL palette.  Every formula is restated in the q78
    oracle SQL.  Returns ``(gif_bytes, expected_frames (4,h,w,3))``.
    """
    ii, jj = np.mgrid[0:h, 0:w]
    k16 = np.arange(16)
    pal = np.stack([(23 * k16 + 5) % 256, (47 * k16 + 9) % 256,
                    (71 * k16 + 2) % 256], axis=1).astype(np.uint8)
    lp = np.stack([(91 * k16 + 13) % 256, (29 * k16 + 41) % 256,
                   (53 * k16 + 17) % 256], axis=1).astype(np.uint8)
    use_local = (d % 3 == 0)
    frames = [((d + 7 * k + 3 * ii + 5 * jj) % 16).astype(np.uint8)
              for k in range(4)]
    pals = [pal, pal, lp if use_local else pal, pal]
    gif = encode_gif(
        frames, pal, transparent=[None, 0, 0, 0], disposal=1,
        interlace=bool(d % 2),
        local_palettes=[None, None, lp, None] if use_local else None,
        delays_cs=[4, 4, 4, 4])
    canvas = pals[0][frames[0]]
    expected = [canvas.copy()]
    for k in range(1, 4):
        m = frames[k] != 0
        canvas[m] = pals[k][frames[k][m]]
        expected.append(canvas.copy())
    return gif, np.stack(expected)


def gif_census_row(d: int, h: int = 10, w: int = 12):
    """Encode + decode id ``d``'s animation, sample frame ``d % 4``;
    returns ``(frame_sampled, sum_rgb, n_px_match)``."""
    gif, expected = animated_variant(d, h, w)
    frames, _ = gif_frames(gif)
    s = d % 4
    got = frames[s]
    sum_rgb = int(got.astype(np.int64).sum())
    n_match = int((got == expected[s]).all(axis=2).sum())
    return s, sum_rgb, n_match
