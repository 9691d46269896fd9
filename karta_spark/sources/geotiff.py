"""GeoTIFF read/write — pure python/numpy (the reference delegates to GDAL,
absent here; this covers classic little/big-endian TIFF plus BigTIFF
with the GeoTIFF georeferencing tags, enough for raster interchange).

Supported:
- read: uncompressed, Deflate/zlib (codes 8 and 32946), LZW (5, TIFF
  early-change variant) and PackBits (32773), in STRIP (tags 273/278/279)
  or TILE organization (tags 322-325, the cloud-optimized layout GDAL
  writes for large rasters — edge-tile padding dropped); horizontal-
  differencing predictor (tag 317 = 2) for integer data and the
  floating-point byte predictor (317 = 3, TIFF TechNote 3 — GDAL's
  default pairing for float COGs); WebP compression (50001, the modern
  COG codec — lossless VP8L via sources/webp.py, gray or RGB(A));
  single- or multi-band, chunky (PlanarConfiguration 1) or planar
  (PlanarConfiguration 2, plane-major chunk arrays) interleave;
  uint8/16/32, int16/32, float32/64.
- read/write: ZSTD (50000, GDAL COMPRESS=ZSTD — via pyarrow's bundled
  zstd) and LZMA (34925, libtiff tif_lzma.c xz streams — stdlib lzma).
- write: single-band, optional compress="deflate" | "packbits" | "lzw"
  | "zstd" | "lzma"
  | "webp" (uint8, lossless VP8L) (the analog of the reference's
  compression write option, grid.py:1066-1076), predictor=3 for float
  data, optional tiled=<edge> tile organization, optional
  overviews=[f...] chained-IFD pyramids, GDAL_NODATA tag for non-NaN
  nodata.
- lazy: TiffMeta (IFD-only parse), read_geotiff_window,
  read_geotiff_distributed, overview selection on every reader,
  big-endian (MM) files, BigTIFF (version 43), new-style JPEG-in-TIFF
  (compression 7 incl. the shared-JPEGTables abbreviated form; write
  with compress="jpeg").

Follows the reference's convention flip (raster/read.py:27-62, _gdal.py):
TIFF stores rows top-down with an upper-left tiepoint; the tile table uses
a lower-left-corner transform with positive dy — rows reverse on read and
on write.
"""

from __future__ import annotations

import lzma
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from karta_spark.raster.tiles import TILE_SCHEMA, df_to_grid, grid_to_df

_DTYPES = {
    (8, 1): np.uint8, (16, 1): np.uint16, (32, 1): np.uint32,
    (16, 2): np.int16, (32, 2): np.int32,
    (32, 3): np.float32, (64, 3): np.float64,
    # 12-bit unsigned (JPEG-compressed aerial/medical TIFFs): samples
    # decode into the low 12 bits of a uint16
    (12, 1): np.uint16,
    # 64-bit integers (GDAL >= 3.5 Int64/UInt64 rasters)
    (64, 1): np.uint64, (64, 2): np.int64,
    # complex rasters (SAR interferometry).  SampleFormat 5 is complex
    # INT (CInt16/CInt32 int pairs) — surfaced as complex64, matching the
    # reference's GDAL dtype map (reference _gdal.py:75-76 maps CInt16
    # and CInt32 both to complex64); SampleFormat 6 is complex IEEE
    # float (CFloat32 -> complex64; CFloat64 -> complex128, wider than
    # the reference's complex64 narrowing at _gdal.py:78).
    (32, 5): np.complex64, (64, 5): np.complex64,
    (64, 6): np.complex64, (128, 6): np.complex128,
    # bilevel (scanned documents, CCITT fax compressions 2/3/4)
    (1, 1): np.uint8,
}

COMPRESSION_NONE = 1
COMPRESSION_CCITT_RLE = 2   # T.4 1D Modified Huffman, byte-aligned rows
COMPRESSION_CCITT_G3 = 3    # Group 3 (T.4), EOL-delimited rows
COMPRESSION_CCITT_G4 = 4    # Group 4 (T.6), pure 2D
COMPRESSION_LZW = 5
COMPRESSION_OJPEG = 6  # old-style JPEG-in-TIFF (TIFF 6.0 §22, deprecated)
COMPRESSION_JPEG = 7  # new-style JPEG-in-TIFF (TTN2)
COMPRESSION_DEFLATE_ADOBE = 8
COMPRESSION_PACKBITS = 32773
COMPRESSION_DEFLATE_OLD = 32946
COMPRESSION_LZMA = 34925    # libtiff tif_lzma.c: xz-container LZMA2 stream
COMPRESSION_ZSTD = 50000    # GDAL/libtiff COMPRESS=ZSTD (modern COG codec)
COMPRESSION_WEBP = 50001    # modern COG codec (GDAL WEBP-in-TIFF)


def lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first variable-width codes starting
    at 9 bits, ClearCode=256, EOI=257, and the TIFF 'early change' — the
    code width bumps one code EARLIER than in standard LZW."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # clear + eoi placeholders

    reset()
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == EOI:
                return bytes(out)
            if code == CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            # TIFF early change: the decoder widens ONE code earlier than
            # plain LZW would require, matching the encoder's schedule
            # (the famous off-by-one of spec §13 / libtiff)
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if expected is not None and len(out) >= expected:
                return bytes(out)
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (early-change, MSB-first), for tests and
    small writes."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w = w + c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        # early change: the DECODER widens when its table reaches
        # (1<<width)-1, so the encoder must widen at the same point
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == (1 << 12) - 1:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF spec §9): runs of 2..128 identical bytes ->
    (257-n, byte); literal spans of 1..128 -> (n-1, bytes)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal span: until the next >=3 run (2-runs inside literals are
        # cheaper left literal) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int | None = None) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and (expected is None or len(out) < expected):
        b = data[i]
        i += 1
        if b < 128:         # literal of b+1 bytes
            out.extend(data[i:i + b + 1])
            i += b + 1
        elif b > 128:       # run of 257-b copies
            out.extend(data[i:i + 1] * (257 - b))
            i += 1
        # b == 128: no-op
    return bytes(out)


def _entry(tag, ftype, count, value):
    return struct.pack("<HHI4s", tag, ftype, count, value)


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-average by integer factors, edge-padding to multiples."""
    h, w = plane.shape
    ph, pw = (-h) % fy, (-w) % fx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return plane.reshape(H // fy, fy, W // fx, fx).mean(axis=(1, 3))


def _compress_chunk(raw: bytes, compress: str | None) -> tuple[int, bytes]:
    if compress is None:
        return COMPRESSION_NONE, raw
    if compress == "deflate":
        return COMPRESSION_DEFLATE_ADOBE, zlib.compress(raw, 6)
    if compress == "packbits":
        return COMPRESSION_PACKBITS, packbits_encode(raw)
    if compress == "lzw":
        return COMPRESSION_LZW, lzw_encode(raw)
    if compress == "zstd":
        import pyarrow as pa  # bundled zstd — no external lib needed
        return COMPRESSION_ZSTD, bytes(pa.Codec("zstd").compress(raw))
    if compress == "lzma":
        # libtiff's tif_lzma.c emits an xz-container LZMA2 stream with
        # no integrity check — match it so GDAL can read what we write
        return COMPRESSION_LZMA, lzma.compress(
            raw, format=lzma.FORMAT_XZ, check=lzma.CHECK_NONE)
    raise ValueError(f"unknown compress option {compress!r}")


def _fp_predict_bytes(a: np.ndarray) -> bytes:
    """Forward predictor 3 for a little-endian float chunk: per row,
    rearrange value bytes MSB-plane-major and byte-diff (stride 1 —
    the writer is single-band)."""
    it = a.dtype.itemsize
    rows, wc = a.shape
    le = np.ascontiguousarray(a.astype("<" + a.dtype.str[1:]))
    arr = np.frombuffer(le.tobytes(), dtype=np.uint8).reshape(rows, wc * it)
    out = np.zeros_like(arr)
    for r in range(rows):
        vals = arr[r].reshape(wc, it)
        planes = np.stack([vals[:, it - 1 - b] for b in range(it)])
        flat = planes.reshape(-1).astype(np.int16)
        d = flat.copy()
        d[1:] = (flat[1:] - flat[:-1]) & 0xFF
        out[r] = d.astype(np.uint8)
    return out.tobytes()


def _build_tiff_section(arr: np.ndarray, x0: float, y_top: float,
                        dx: float, dy: float, compress: str | None,
                        tiled: int | None, base_off: int,
                        next_ifd: int, nodata: float | None = None,
                        predictor: int | None = None) -> bytes:
    """One complete IFD section (IFD + external values + chunk data) for
    a TOP-DOWN array, with absolute offsets starting at *base_off* and
    the next-IFD pointer set to *next_ifd* (0 terminates the chain)."""
    ny, nx = arr.shape
    if compress in ("jpeg", "webp") and arr.dtype != np.uint8:
        raise ValueError(f"compress={compress!r} requires uint8 samples")
    if predictor not in (None, 3):
        raise ValueError("writer supports predictor=3 (float) only")
    if predictor == 3 and not np.issubdtype(arr.dtype, np.floating):
        raise ValueError("predictor=3 requires float samples")

    def one_chunk(a: np.ndarray) -> tuple[int, bytes]:
        if compress == "jpeg":  # new-style JPEG-in-TIFF (compression 7)
            from karta_spark.sources.jpeg import encode_jpeg_baseline
            return COMPRESSION_JPEG, encode_jpeg_baseline(a, 95)
        if compress == "webp":  # modern COG codec (lossless VP8L)
            from karta_spark.sources.webp import encode_webp
            return COMPRESSION_WEBP, encode_webp(a)
        raw = (_fp_predict_bytes(a) if predictor == 3
               else np.ascontiguousarray(a).tobytes())
        return _compress_chunk(raw, compress)

    chunks: list[bytes] = []
    if tiled is None:
        comp_code, data = one_chunk(arr)
        chunks.append(data)
    else:
        if tiled % 16 != 0 or tiled <= 0:
            raise ValueError("TIFF tile size must be a positive multiple of 16")
        ntx = (nx + tiled - 1) // tiled
        nty = (ny + tiled - 1) // tiled
        padded = np.zeros((nty * tiled, ntx * tiled), dtype=arr.dtype)
        padded[:ny, :nx] = arr
        comp_code = COMPRESSION_NONE
        for ty in range(nty):
            for tx in range(ntx):
                t = padded[ty * tiled:(ty + 1) * tiled,
                           tx * tiled:(tx + 1) * tiled]
                comp_code, data = one_chunk(t)
                chunks.append(data)

    bits = arr.dtype.itemsize * 8
    fmt = {np.dtype(np.uint8): 1, np.dtype(np.uint16): 1, np.dtype(np.uint32): 1,
           np.dtype(np.uint64): 1,
           np.dtype(np.int16): 2, np.dtype(np.int32): 2, np.dtype(np.int64): 2,
           np.dtype(np.float32): 3, np.dtype(np.float64): 3,
           # complex written as IEEE pairs (SampleFormat 6), the form
           # GDAL emits for CFloat32/CFloat64
           np.dtype(np.complex64): 6, np.dtype(np.complex128): 6}[arr.dtype]

    def val_long(v):
        return struct.pack("<I", v)

    def val_short(v):
        return struct.pack("<HH", v, 0)

    # layout: IFD + external values + chunk data, all offsets absolute
    nchunks = len(chunks)
    nodata_bytes = b""
    if nodata is not None:
        nodata_bytes = f"{nodata:g}".encode("ascii") + b"\x00"
    n_entries = (12 if tiled is None else 13) + (1 if nodata_bytes else 0) \
        + (1 if predictor else 0)
    ifd_size = 2 + n_entries * 12 + 4
    ext_off = base_off + ifd_size
    scale_bytes = struct.pack("<3d", dx, dy, 0.0)
    # tiepoint: raster (0,0) [upper-left corner] -> world (x0, y_top)
    tie_bytes = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y_top, 0.0)
    scale_off = ext_off
    tie_off = scale_off + len(scale_bytes)
    nodata_off = tie_off + len(tie_bytes)
    arrays_off = nodata_off + (len(nodata_bytes) if len(nodata_bytes) > 4
                               else 0)
    # offset/count arrays go external when nchunks > 1 (4-byte LONGs)
    if nchunks > 1:
        offsets_off = arrays_off
        counts_off = offsets_off + 4 * nchunks
        data_off = counts_off + 4 * nchunks
    else:
        offsets_off = counts_off = 0
        data_off = arrays_off
    chunk_offsets = []
    pos = data_off
    for c in chunks:
        chunk_offsets.append(pos)
        pos += len(c)

    def chunk_arrays(off_tag, cnt_tag):
        if nchunks == 1:
            return [_entry(off_tag, 4, 1, val_long(chunk_offsets[0])),
                    _entry(cnt_tag, 4, 1, val_long(len(chunks[0])))]
        return [_entry(off_tag, 4, nchunks, val_long(offsets_off)),
                _entry(cnt_tag, 4, nchunks, val_long(counts_off))]

    entries = [
        _entry(256, 4, 1, val_long(nx)),           # ImageWidth
        _entry(257, 4, 1, val_long(ny)),           # ImageLength
        _entry(258, 3, 1, val_short(bits)),        # BitsPerSample
        _entry(259, 3, 1, val_short(comp_code)),   # Compression
        _entry(262, 3, 1, val_short(1)),           # Photometric: BlackIsZero
        _entry(277, 3, 1, val_short(1)),           # SamplesPerPixel
        _entry(339, 3, 1, val_short(fmt)),         # SampleFormat
        _entry(33550, 12, 3, val_long(scale_off)),  # ModelPixelScale
        _entry(33922, 12, 6, val_long(tie_off)),    # ModelTiepoint
    ]
    if predictor:
        entries += [_entry(317, 3, 1, val_short(predictor))]
    if nodata_bytes:  # GDAL_NODATA (tag 42113, ASCII)
        if len(nodata_bytes) <= 4:
            entries += [_entry(42113, 2, len(nodata_bytes),
                               nodata_bytes.ljust(4, b"\x00"))]
        else:
            entries += [_entry(42113, 2, len(nodata_bytes),
                               val_long(nodata_off))]
    if tiled is None:
        entries += [_entry(278, 4, 1, val_long(ny))]  # RowsPerStrip
        entries += chunk_arrays(273, 279)             # Strip offsets/counts
    else:
        entries += [_entry(322, 4, 1, val_long(tiled)),   # TileWidth
                    _entry(323, 4, 1, val_long(tiled))]   # TileLength
        entries += chunk_arrays(324, 325)                 # Tile offsets/counts
    entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])
    assert len(entries) == n_entries
    out = bytearray()
    out += struct.pack("<H", n_entries) + b"".join(entries)
    out += struct.pack("<I", next_ifd)
    out += scale_bytes + tie_bytes
    if len(nodata_bytes) > 4:
        out += nodata_bytes
    if nchunks > 1:
        out += struct.pack(f"<{nchunks}I", *chunk_offsets)
        out += struct.pack(f"<{nchunks}I", *[len(c) for c in chunks])
    for c in chunks:
        out += c
    return bytes(out)


def write_geotiff(path: str, tiles: DataFrame, dtype=np.float64,
                  compress: str | None = None, tiled: int | None = None,
                  overviews: list[int] | None = None):
    """Write a (small) single-band tile table to a GeoTIFF.

    compress: None | "deflate" | "packbits" | "lzw".
    tiled: tile edge in pixels (multiple of 16, TIFF spec §15) — emits a
    tile-organized file (tags 322-325, the cloud-optimized layout GDAL
    writes for large rasters) instead of one strip; each tile is
    compressed independently (edge tiles zero-padded to full size).
    overviews: decimation factors (e.g. [2, 4]) — appends one chained
    IFD per factor holding the box-averaged overview, anchored at the
    same upper-left tiepoint with scale*factor (the COG overview
    layout); read them back with ``overview=`` on the readers."""
    values, transform, nodata = df_to_grid(tiles)
    x0, y0, dx, dy, sx, sy = transform
    if sx != 0 or sy != 0:
        raise ValueError("GeoTIFF writer supports unskewed grids only")
    ny, nx = values.shape
    arr = np.asarray(values, dtype=dtype)[::-1]  # LL-row-first -> top-down
    y_top = y0 + ny * dy
    nodata_tag = None if (nodata is None or np.isnan(nodata)) else float(nodata)
    write_geotiff_array(path, arr, x0, y_top, dx, dy, compress=compress,
                        tiled=tiled, overviews=overviews, nodata=nodata_tag)


def write_geotiff_array(path: str, arr: np.ndarray, x0: float, y_top: float,
                        dx: float, dy: float, compress: str | None = None,
                        tiled: int | None = None,
                        overviews: list[int] | None = None,
                        nodata: float | None = None,
                        predictor: int | None = None):
    """Array-level GeoTIFF writer: *arr* is TOP-DOWN, any dtype in the
    codec map — including int64/uint64 and complex64/complex128 (written
    as SampleFormat 6 IEEE pairs), which the float64 tile-table path
    cannot carry.  ``write_geotiff`` delegates here after assembling the
    grid from its tile table."""
    nodata_tag = nodata
    acc = np.complex128 if np.iscomplexobj(arr) else np.float64
    levels = [(arr, dx, dy)]
    for fct in overviews or []:
        if fct < 2:
            raise ValueError("overview factors must be >= 2")
        ov = _box_downsample(arr.astype(acc), fct, fct)
        levels.append((ov.astype(arr.dtype), dx * fct, dy * fct))

    sections = []
    base = 8
    for li, (lv, ldx, ldy) in enumerate(levels):
        # next-IFD pointer needs the NEXT section's base — build twice:
        # sizes are offset-independent, so a dry run sizes the section
        dry = _build_tiff_section(lv, x0, y_top, ldx, ldy, compress,
                                  tiled, base, 0, nodata_tag, predictor)
        nxt = base + len(dry) if li + 1 < len(levels) else 0
        sections.append(_build_tiff_section(lv, x0, y_top, ldx, ldy,
                                            compress, tiled, base, nxt,
                                            nodata_tag, predictor))
        base += len(dry)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        for s in sections:
            f.write(s)


def write_bilevel_geotiff(path: str, bitmap: np.ndarray, x0: float,
                          y_top: float, dx: float, dy: float,
                          compress: str = "g4",
                          rows_per_strip: int | None = None,
                          photometric: int = 0):
    """Write a 1-bit scanned-document-style GeoTIFF.  *bitmap* is a
    TOP-DOWN uint8/bool is-black array (1 = black ink).  ``compress``:
    'g4' (CCITT T.6, compression 4 — the archive standard), 'rle'
    (compression 2), or None (packed bits).  *photometric* 0 stores
    black as 1 (WhiteIsZero, the fax convention every scanner emits);
    1 flips it.  Strip-organized so the lazy-window reader can skip
    strips."""
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        f.write(_build_bilevel_section(bitmap, x0, y_top, dx, dy,
                                       compress, rows_per_strip,
                                       photometric, 8, 0))


def write_multipage_bilevel(path: str, bitmaps: list, x0: float = 0.0,
                            y_top: float | None = None, dx: float = 1.0,
                            dy: float = 1.0, compress: str = "g4",
                            rows_per_strip: int | None = None,
                            photometric: int = 0):
    """Multi-page scanned document: one chained IFD per page (the
    layout fax archives and scanners emit — libtiff 'directories',
    GDAL subdatasets).  Pages may differ in size."""
    sections = []
    base = 8
    for li, bm in enumerate(bitmaps):
        yt = y_top if y_top is not None else float(np.asarray(bm).shape[0])
        dry = _build_bilevel_section(bm, x0, yt, dx, dy, compress,
                                     rows_per_strip, photometric, base, 0)
        nxt = base + len(dry) if li + 1 < len(bitmaps) else 0
        sections.append(_build_bilevel_section(
            bm, x0, yt, dx, dy, compress, rows_per_strip, photometric,
            base, nxt))
        base += len(dry)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        for s in sections:
            f.write(s)


def tiff_pages(f) -> list:
    """All IFDs of a multi-page TIFF as TiffMeta objects (follows the
    next-IFD chain — pages, not overviews, for scanned documents)."""
    pages = [TiffMeta(f)]
    while pages[-1].next_ifd:
        pages.append(TiffMeta(f, pages[-1].next_ifd))
    return pages


def _build_bilevel_section(bitmap: np.ndarray, x0: float, y_top: float,
                           dx: float, dy: float, compress: str,
                           rows_per_strip: int | None, photometric: int,
                           base_off: int, next_ifd: int) -> bytes:
    from karta_spark.sources import ccitt
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    ny, nx = bm.shape
    rps = rows_per_strip or ny
    chunks = []
    for r0 in range(0, ny, rps):
        rows = bm[r0:r0 + rps]
        if compress == "g4":
            comp_code, data = COMPRESSION_CCITT_G4, ccitt.encode_g4(rows)
        elif compress == "rle":
            comp_code, data = COMPRESSION_CCITT_RLE, ccitt.encode_mh_rle(rows)
        elif compress is None:
            comp_code = COMPRESSION_NONE
            data = np.packbits(rows, axis=1).tobytes()
        else:
            raise ValueError(f"bilevel compress must be g4/rle/None, "
                             f"got {compress!r}")
        # stored bits follow photometric: 0 -> black=1 (as encoded)
        if compress is None and photometric == 1:
            data = np.packbits(1 - rows, axis=1).tobytes()
        chunks.append(data)

    def val_long(v):
        return struct.pack("<I", v)

    def val_short(v):
        return struct.pack("<HH", v, 0)

    nchunks = len(chunks)
    n_entries = 12  # 10 fixed tags + strip offsets/counts
    ifd_size = 2 + n_entries * 12 + 4
    ext_off = base_off + ifd_size
    scale_bytes = struct.pack("<3d", dx, dy, 0.0)
    tie_bytes = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y_top, 0.0)
    scale_off, tie_off = ext_off, ext_off + len(scale_bytes)
    arrays_off = tie_off + len(tie_bytes)
    if nchunks > 1:
        offsets_off = arrays_off
        counts_off = offsets_off + 4 * nchunks
        data_off = counts_off + 4 * nchunks
    else:
        offsets_off = counts_off = 0
        data_off = arrays_off
    chunk_offsets, pos = [], data_off
    for c in chunks:
        chunk_offsets.append(pos)
        pos += len(c)
    if nchunks == 1:
        chunk_entries = [_entry(273, 4, 1, val_long(chunk_offsets[0])),
                         _entry(279, 4, 1, val_long(len(chunks[0])))]
    else:
        chunk_entries = [_entry(273, 4, nchunks, val_long(offsets_off)),
                         _entry(279, 4, nchunks, val_long(counts_off))]
    entries = sorted([
        _entry(256, 4, 1, val_long(nx)),
        _entry(257, 4, 1, val_long(ny)),
        _entry(258, 3, 1, val_short(1)),              # BitsPerSample = 1
        _entry(259, 3, 1, val_short(comp_code)),
        _entry(262, 3, 1, val_short(photometric)),
        _entry(277, 3, 1, val_short(1)),
        _entry(278, 4, 1, val_long(rps)),
        _entry(339, 3, 1, val_short(1)),
        _entry(33550, 12, 3, val_long(scale_off)),
        _entry(33922, 12, 6, val_long(tie_off)),
    ] + chunk_entries, key=lambda e: struct.unpack_from("<H", e)[0])
    assert len(entries) == n_entries
    out = bytearray()
    out += struct.pack("<H", n_entries) + b"".join(entries)
    out += struct.pack("<I", next_ifd)
    out += scale_bytes + tie_bytes
    if nchunks > 1:
        out += struct.pack(f"<{nchunks}I", *chunk_offsets)
        out += struct.pack(f"<{nchunks}I", *[len(c) for c in chunks])
    for c in chunks:
        out += c
    return bytes(out)


class TiffMeta:
    """Parsed IFD of a baseline GeoTIFF — all metadata, NO pixel data.
    Reads the header, IFD and external tag arrays with seeks (a few KB
    regardless of file size), so windowed and distributed scans can plan
    byte ranges without touching the raster — the lazy-band analog of the
    reference's GdalFileBand (_gdal.py:17-57, which reads strips on
    demand through GDAL)."""

    def __init__(self, f, ifd_offset: int | None = None):
        f.seek(0)
        head = f.read(16)
        if head[:2] == b"II":
            e = "<"
        elif head[:2] == b"MM":
            e = ">"  # big-endian — common in the wild (round 4)
        else:
            raise ValueError("not a classic TIFF (II*\\0 / MM\\0*)")
        (version,) = struct.unpack_from(e + "H", head, 2)
        if version == 42:
            big = False
        elif version == 43:
            # BigTIFF: 8-byte offsets/counts — rasters beyond 4 GB, the
            # shape large production sidecars actually take (round 4)
            big = True
            bytesize, zero = struct.unpack_from(e + "HH", head, 4)
            if bytesize != 8 or zero != 0:
                raise ValueError("malformed BigTIFF header")
        else:
            raise ValueError("not a classic TIFF (II*\\0 / MM\\0*)")
        self.endian = e
        self.bigtiff = big
        off_code = "Q" if big else "I"      # value/offset width
        entry_sz = 20 if big else 12
        inline = 8 if big else 4
        if ifd_offset is None:
            (ifd_offset,) = struct.unpack_from(
                e + off_code, head, 8 if big else 4)
        f.seek(ifd_offset)
        if big:
            (n,) = struct.unpack(e + "Q", f.read(8))
        else:
            (n,) = struct.unpack(e + "H", f.read(2))
        body = f.read(n * entry_sz + inline)
        # IFDs chain (COG overview layout): 0 terminates
        (self.next_ifd,) = struct.unpack_from(e + off_code, body, n * entry_sz)
        tags = {}
        for i in range(n):
            tag, ftype = struct.unpack_from(e + "HH", body, i * entry_sz)
            (count,) = struct.unpack_from(e + off_code, body,
                                          i * entry_sz + 4)
            raw = body[i * entry_sz + 4 + (8 if big else 4):
                       (i + 1) * entry_sz]
            tags[tag] = (ftype, count, raw)

        # LONG8 (16) appears in BigTIFF offset/count arrays
        _SIZES = {3: 2, 4: 4, 16: 8}
        _CODES = {3: "H", 4: "I", 16: "Q"}

        def tag_ints(tag, default=None):
            if tag not in tags:
                if default is not None:
                    return default
                raise KeyError(f"missing TIFF tag {tag}")
            ftype, count, raw = tags[tag]
            size = _SIZES[ftype]
            code = _CODES[ftype]
            if count * size <= inline:
                return list(struct.unpack_from(f"{e}{count}{code}", raw))
            (off,) = struct.unpack(e + off_code, raw)
            f.seek(off)
            return list(struct.unpack(f"{e}{count}{code}",
                                      f.read(count * size)))

        def tag_doubles(tag):
            _, count, raw = tags[tag]
            if count * 8 <= inline:
                return list(struct.unpack_from(f"{e}{count}d", raw))
            (off,) = struct.unpack(e + off_code, raw)
            f.seek(off)
            return list(struct.unpack(f"{e}{count}d", f.read(count * 8)))

        def tag_ascii(tag):
            if tag not in tags:
                return None
            _, count, raw = tags[tag]
            if count <= inline:
                data = raw[:count]
            else:
                (off,) = struct.unpack(e + off_code, raw)
                f.seek(off)
                data = f.read(count)
            return data.split(b"\x00")[0].decode("ascii", "ignore")

        def tag_bytes(tag):
            if tag not in tags:
                return None
            _, count, raw = tags[tag]
            if count <= inline:
                return raw[:count]
            (off,) = struct.unpack(e + off_code, raw)
            f.seek(off)
            return f.read(count)

        # GDAL_NODATA (tag 42113, ASCII) — the wild-standard nodata marker
        nod = tag_ascii(42113)
        self.nodata = float(nod) if nod not in (None, "") else None
        # JPEGTables (tag 347): shared abbreviated stream for new-style
        # JPEG-in-TIFF chunks (TTN2)
        self.jpeg_tables = tag_bytes(347)
        self.photometric = tag_ints(262, default=[1])[0]
        # old-style JPEG (compression 6) tags — TIFF 6.0 §22; the
        # reference reads these archives through GDAL (_gdal.py:114-188)
        jif = tag_ints(513, default=[])         # JPEGInterchangeFormat
        jifl = tag_ints(514, default=[])        # ...FormatLength
        self.jif_offset = jif[0] if jif else None
        self.jif_length = jifl[0] if jifl else None
        self.ojpeg_qtables = tag_ints(519, default=[])     # per-comp ptrs
        self.ojpeg_dctables = tag_ints(520, default=[])
        self.ojpeg_actables = tag_ints(521, default=[])
        self.ojpeg_proc = tag_ints(512, default=[1])[0]
        self.ojpeg_restart = tag_ints(515, default=[0])[0]
        self.ycbcr_subsampling = tuple(tag_ints(530, default=[2, 2]))
        self._ojpeg_full = None  # lazily decoded interchange stream

        self.nx = tag_ints(256)[0]
        self.ny = tag_ints(257)[0]
        self.spp = tag_ints(277, default=[1])[0]
        bits_l = tag_ints(258, default=[1])  # TIFF default: bilevel
        if len(set(bits_l)) != 1:
            raise NotImplementedError("per-band BitsPerSample must be uniform")
        self.comp = tag_ints(259, default=[1])[0]
        planar = tag_ints(284, default=[1])[0]
        if planar not in (1, 2):
            raise NotImplementedError(f"PlanarConfiguration={planar}")
        # planar=2: each chunk holds ONE band; offset/count arrays are
        # plane-major (all of band 0's chunks, then band 1's, ...)
        self.planar = planar
        self.predictor = tag_ints(317, default=[1])[0]
        fmt = tag_ints(339, default=[1])[0]
        self.bits = bits_l[0]
        # T4Options (tag 292) bit 0 selects 2D coding for compression 3
        self.t4_options = tag_ints(292, default=[0])[0]
        self.dtype = np.dtype(_DTYPES[(bits_l[0], fmt)])
        # SampleFormat 5 (complex int): file bytes are (re, im) int16 or
        # int32 pairs; surfaced as complex64 per the reference dtype map
        self._cint = (np.dtype(np.int16 if bits_l[0] == 32 else np.int32)
                      if fmt == 5 else None)
        self.tiled = 322 in tags
        if self.tiled:  # tile-organized (TIFF §15: tags 322-325)
            self.tw = tag_ints(322)[0]
            self.th = tag_ints(323)[0]
            self.offsets = tag_ints(324)
            self.counts = tag_ints(325)
            self.ntx = (self.nx + self.tw - 1) // self.tw
            self.nty = (self.ny + self.th - 1) // self.th
            self.chunks_per_plane = self.ntx * self.nty
        else:
            self.offsets = tag_ints(273)
            self.counts = tag_ints(279)
            self.rows_per_strip = tag_ints(278, default=[self.ny])[0]
            self.chunks_per_plane = ((self.ny + self.rows_per_strip - 1)
                                     // self.rows_per_strip)
        want_chunks = self.chunks_per_plane * (self.spp if self.planar == 2
                                               else 1)
        if len(self.offsets) != want_chunks:
            raise ValueError(
                f"chunk count mismatch: {len(self.offsets)} offsets for "
                f"{want_chunks} expected (multi-IFD chunk layout?)")
        # plain (non-geo) TIFFs — e.g. scanned documents — carry no
        # ModelPixelScale/Tiepoint: default to a unit pixel grid with
        # the top-left corner at (0, ny) so y0 lands at 0
        if 33550 in tags:
            dxs = tag_doubles(33550)
            tie = tag_doubles(33922)
        else:
            dxs = [1.0, 1.0]
            tie = [0.0, 0.0, 0.0, 0.0, float(self.ny), 0.0]
        self.dx, self.dy = dxs[0], dxs[1]
        self.x0 = tie[3]
        y_top = tie[4]
        self.y0 = y_top - self.ny * self.dy  # UL tiepoint -> LL corner
        self.transform = (self.x0, self.y0, self.dx, self.dy, 0.0, 0.0)

    def _decompress(self, raw, expected):
        comp = self.comp
        if comp == COMPRESSION_NONE:
            return raw
        if comp in (COMPRESSION_DEFLATE_ADOBE, COMPRESSION_DEFLATE_OLD):
            return zlib.decompress(raw)
        if comp == COMPRESSION_PACKBITS:
            return packbits_decode(raw, expected)
        if comp == COMPRESSION_LZW:
            return lzw_decode(raw, expected)
        if comp == COMPRESSION_ZSTD:
            import pyarrow as pa
            # zstd needs the exact decompressed size; TIFF chunks are
            # written exact (tiles always padded, last strip short)
            return bytes(pa.Codec("zstd").decompress(bytes(raw), expected))
        if comp == COMPRESSION_LZMA:
            return lzma.decompress(raw)  # auto-detects xz / lzma-alone
        raise NotImplementedError(f"TIFF compression {comp} not supported "
                                  "(none/deflate/lzw/packbits/zstd/lzma are)")

    def _decode_bilevel_chunk(self, raw, rows, cols, nch):
        """Bilevel (1-bit) chunk: CCITT fax compressions 2/3/4 (scanned-
        document archives; the reference reads them via GDAL/libtiff,
        _gdal.py:114-188) or packed rows under any byte codec.  CCITT
        decodes to is-black bits (T.4 colour convention) which map to
        sample values via PhotometricInterpretation: photometric 0
        (WhiteIsZero) stores black as 1, photometric 1 (BlackIsZero)
        as 0.  Packed-bit rows are surfaced as stored."""
        from karta_spark.sources import ccitt
        if nch != 1:
            raise NotImplementedError("bilevel TIFF needs SamplesPerPixel=1")
        if self.comp == COMPRESSION_CCITT_G4:
            black = ccitt.decode_g4(raw, cols, rows)
        elif self.comp == COMPRESSION_CCITT_G3:
            black = ccitt.decode_g3(raw, cols, rows,
                                    two_d=bool(self.t4_options & 1))
        elif self.comp == COMPRESSION_CCITT_RLE:
            black = ccitt.decode_mh_rle(raw, cols, rows)
        else:
            rb = (cols + 7) // 8  # packed MSB-first, rows byte-aligned
            data = self._decompress(raw, rows * rb)
            bits = np.unpackbits(
                np.frombuffer(data[:rows * rb], dtype=np.uint8)
                .reshape(rows, rb), axis=1)[:, :cols]
            return bits.reshape(rows, cols, 1)
        sample = black if self.photometric == 0 else (1 ^ black)
        return sample.reshape(rows, cols, 1)

    def _undo_predictor(self, chunk):
        if self.predictor == 2:
            if not np.issubdtype(self.dtype, np.integer):
                raise NotImplementedError("predictor=2 on float samples")
            return np.cumsum(chunk, axis=1, dtype=self.dtype)
        return chunk

    def _undo_fp_predictor(self, data: bytes, rows: int, cols: int,
                           nch: int) -> bytes:
        """Predictor 3 (floating-point horizontal differencing, TIFF
        TechNote 3 / libtiff fpAcc): per scanline the stored bytes are
        MSB-plane-major and byte-wise diffed with stride=spp; undo =
        lane cumsum mod 256, then regather value bytes in the file's
        endianness."""
        it = self.dtype.itemsize
        wc = cols * nch
        arr = np.frombuffer(data, dtype=np.uint8,
                            count=rows * wc * it).reshape(rows, wc * it)
        stride = nch
        out = np.zeros_like(arr)
        for r in range(rows):
            row = arr[r].astype(np.int64)
            pad = (-len(row)) % stride
            lanes = np.concatenate([row, np.zeros(pad, np.int64)]) \
                .reshape(-1, stride)
            acc = (np.cumsum(lanes, axis=0) & 0xFF) \
                .reshape(-1)[:len(row)].astype(np.uint8)
            planes = acc.reshape(it, wc)
            vals = np.zeros((wc, it), np.uint8)
            for b in range(it):  # plane 0 holds each value's MSB
                if self.endian == "<":
                    vals[:, it - 1 - b] = planes[b]
                else:
                    vals[:, b] = planes[b]
            out[r] = vals.reshape(-1)
        return out.tobytes()

    def _decode_webp_chunk(self, raw: bytes, rows: int, cols: int,
                           nch: int) -> np.ndarray:
        """WebP-compressed chunk (compression 50001, the modern COG
        codec — GDAL pairs it with photometric 2, spp 3/4 uint8; our
        writer also emits single-band gray).  The chunk is a complete
        RIFF WebP; lossless VP8L decodes bit-exact."""
        from karta_spark.sources.webp import decode_webp
        rgba = decode_webp(raw)
        if rgba.shape[0] < rows or rgba.shape[1] < cols:
            raise ValueError("WebP chunk smaller than tile geometry")
        if nch == 1:
            out = rgba[:rows, :cols, 0:1]
        else:
            out = rgba[:rows, :cols, :nch]
        return out.astype(self.dtype)

    def read_chunk(self, f, k, plane: int = 0) -> np.ndarray:
        """Decode chunk *k* (of *plane*, for PlanarConfiguration=2) by
        seeking to its byte range: (rows, cols, nch) top-down, tiles
        padded to (th, tw), strips sized to their rows."""
        nch = 1 if self.planar == 2 else self.spp
        idx = plane * self.chunks_per_plane + k if self.planar == 2 else k
        f.seek(self.offsets[idx])
        raw = f.read(self.counts[idx])
        if self.tiled:
            rows, cols = self.th, self.tw
        else:
            rows = min(self.rows_per_strip,
                       self.ny - k * self.rows_per_strip)
            cols = self.nx
        if self.comp == COMPRESSION_JPEG:
            return self._decode_jpeg_chunk(raw, rows, cols, nch)
        if self.comp == COMPRESSION_OJPEG:
            return self._decode_ojpeg_chunk(f, raw, rows, cols, nch, k)
        if self.comp == COMPRESSION_WEBP:
            return self._decode_webp_chunk(raw, rows, cols, nch)
        if self.bits == 1:
            return self._decode_bilevel_chunk(raw, rows, cols, nch)
        if self._cint is not None:  # complex-int pairs (SampleFormat 5)
            expected = rows * cols * nch * 2 * self._cint.itemsize
            data = self._decompress(raw, expected)
            pairs = np.frombuffer(data[:expected],
                                  dtype=self.endian + self._cint.str[1:])
            pairs = pairs.reshape(rows, cols, nch, 2).astype(np.float32)
            return (pairs[..., 0] + 1j * pairs[..., 1]).astype(self.dtype)
        expected = rows * cols * nch * self.dtype.itemsize
        data = self._decompress(raw, expected)
        if self.predictor == 3:
            if not np.issubdtype(self.dtype, np.floating):
                raise NotImplementedError("predictor=3 needs float samples")
            data = self._undo_fp_predictor(data, rows, cols, nch)
        chunk = np.frombuffer(data[:expected],
                              dtype=self.endian + self.dtype.str[1:])
        return self._undo_predictor(chunk.reshape(rows, cols, nch))

    def _decode_jpeg_chunk(self, raw: bytes, rows: int, cols: int,
                           nch: int | None = None) -> np.ndarray:
        """New-style JPEG-in-TIFF chunk (compression 7, TTN2): the chunk
        is a JPEG stream, optionally 'abbreviated' with its DQT/DHT
        living in the shared JPEGTables tag (347) — splice tables between
        the chunk's SOI and its first marker.  Photometric 6 (YCbCr)
        decodes to RGB (what GDAL surfaces by default); grayscale stays
        single-band."""
        from karta_spark.sources.jpeg import decode_jpeg_baseline
        stream = raw
        t = self.jpeg_tables
        if t is not None and len(t) > 4:
            # tables stream is SOI + segments + EOI; chunk is SOI + data
            stream = b"\xFF\xD8" + t[2:-2] + raw[2:]
        if nch is None:
            nch = self.spp
        pix = decode_jpeg_baseline(stream)
        return self._shape_jpeg_pixels(pix, rows, cols, nch)

    def _shape_jpeg_pixels(self, pix: np.ndarray, rows: int, cols: int,
                           nch: int) -> np.ndarray:
        if pix.ndim == 2:
            pix = pix[:, :, None]
        if pix.shape[2] != nch:
            raise ValueError(
                f"JPEG chunk has {pix.shape[2]} bands, TIFF says {nch}")
        out = np.zeros((rows, cols, nch), dtype=self.dtype)
        rr = min(rows, pix.shape[0])
        cc = min(cols, pix.shape[1])
        out[:rr, :cc] = pix[:rr, :cc]
        return out

    def _decode_ojpeg_chunk(self, f, raw: bytes, rows: int, cols: int,
                            nch: int, k: int) -> np.ndarray:
        """Old-style JPEG-in-TIFF (compression 6, TIFF 6.0 §22 — the
        deprecated pre-TTN2 form still found in aerial/scanner archives;
        the reference reads it via GDAL, _gdal.py:114-188).  Three wild
        layouts, in the order real files exhibit them:

        1. the strip itself is a complete SOI..EOI stream;
        2. tag 513/514 point at ONE whole-image interchange stream
           (strips alias into it) — decode once, cache, slice rows;
        3. strips are bare (entropy data, possibly SOS-prefixed) with
           tables at the JPEGQTables/DCTables/ACTables pointer tags —
           synthesize a standard header and feed the normal decoder."""
        from karta_spark.sources.jpeg import decode_jpeg_baseline
        if self.ojpeg_proc not in (1, 14):
            raise NotImplementedError(
                f"old-style JPEGProc={self.ojpeg_proc} "
                "(1=baseline and 14=lossless supported)")
        if self.jif_offset is not None:
            # whole-image interchange stream takes precedence: strip
            # offsets usually alias INTO it, so strip-local probing would
            # misread them
            if self._ojpeg_full is None:
                f.seek(self.jif_offset)
                self._ojpeg_full = decode_jpeg_baseline(
                    f.read(self.jif_length))
            full = self._ojpeg_full
            if self.tiled:
                raise NotImplementedError(
                    "old-style JPEG interchange stream with tiles")
            rstart = k * self.rows_per_strip
            pix = full[rstart:rstart + rows]
        elif raw[:2] == b"\xff\xd8":
            pix = decode_jpeg_baseline(raw)
        elif self.ojpeg_qtables:
            if self.ojpeg_proc == 14:
                raise NotImplementedError(
                    "old-style lossless JPEG with bare table-pointer "
                    "strips (lossless needs SOF3 in the stream)")
            header = self._ojpeg_synth_header(f, rows, cols, nch)
            body = raw if raw[:2] == b"\xff\xda" else \
                self._ojpeg_sos_segment(nch) + raw
            pix = decode_jpeg_baseline(header + body + b"\xff\xd9")
        else:
            raise NotImplementedError(
                "old-style JPEG strip without SOI, interchange stream, "
                "or table pointers")
        return self._shape_jpeg_pixels(pix, rows, cols, nch)

    def _ojpeg_synth_header(self, f, rows: int, cols: int,
                            nch: int) -> bytes:
        """SOI + DQT + SOF0 + DHT (+DRI) built from the old-style table
        pointer tags: JPEGQTables entries are 64 raw bytes each,
        DC/ACTables entries are 16 count bytes + symbol values (DHT
        payloads without the marker)."""
        parts = [b"\xff\xd8"]
        qts = self.ojpeg_qtables
        for i in range(nch):
            ptr = qts[min(i, len(qts) - 1)]
            f.seek(ptr)
            tbl = f.read(64)
            parts.append(b"\xff\xdb" + struct.pack(">H", 67)
                         + bytes([i]) + tbl)
        # SOF0: luma gets the YCbCrSubSampling factors for 3-channel
        # photometric-YCbCr data, everything else 1x1
        sub = self.ycbcr_subsampling if (nch == 3
                                         and self.photometric == 6) \
            else (1, 1)
        comps = []
        for i in range(nch):
            hv = (sub[0] << 4) | sub[1] if i == 0 else 0x11
            comps.append(bytes([i + 1, hv, i]))
        sof = bytes([8]) + struct.pack(">HH", rows, cols) \
            + bytes([nch]) + b"".join(comps)
        parts.append(b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof)
        for cls, ptrs in ((0, self.ojpeg_dctables),
                          (1, self.ojpeg_actables)):
            if not ptrs:
                raise NotImplementedError(
                    "old-style JPEG without Huffman table pointers")
            for i in range(nch):
                ptr = ptrs[min(i, len(ptrs) - 1)]
                f.seek(ptr)
                counts = f.read(16)
                nvals = sum(counts)
                vals = f.read(nvals)
                payload = bytes([(cls << 4) | i]) + counts + vals
                parts.append(b"\xff\xc4"
                             + struct.pack(">H", 2 + len(payload))
                             + payload)
        if self.ojpeg_restart:
            parts.append(b"\xff\xdd"
                         + struct.pack(">HH", 4, self.ojpeg_restart))
        return b"".join(parts)

    def _ojpeg_sos_segment(self, nch: int) -> bytes:
        body = bytes([nch]) + b"".join(
            bytes([i + 1, (i << 4) | i]) for i in range(nch)) \
            + bytes([0, 63, 0])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def read_window(self, f, r0: int, r1: int, c0: int, c1: int) -> np.ndarray:
        """(r1-r0, c1-c0, spp) top-down window decoded from ONLY the
        chunks it intersects (all planes assembled for planar files)."""
        if not (0 <= r0 <= r1 <= self.ny and 0 <= c0 <= c1 <= self.nx):
            raise ValueError("window out of raster bounds")
        if self.planar == 2:
            return np.concatenate(
                [self._window_plane(f, r0, r1, c0, c1, p, 1)
                 for p in range(self.spp)], axis=2)
        return self._window_plane(f, r0, r1, c0, c1, 0, self.spp)

    def _window_plane(self, f, r0, r1, c0, c1, plane, nch) -> np.ndarray:
        out = np.zeros((r1 - r0, c1 - c0, nch), dtype=self.dtype)
        if self.tiled:
            for ty in range(r0 // self.th, (max(r1, r0 + 1) - 1) // self.th + 1):
                for tx in range(c0 // self.tw,
                                (max(c1, c0 + 1) - 1) // self.tw + 1):
                    chunk = self.read_chunk(f, ty * self.ntx + tx, plane)
                    tr0, tc0 = ty * self.th, tx * self.tw
                    rr0, rr1 = max(r0, tr0), min(r1, tr0 + self.th)
                    cc0, cc1 = max(c0, tc0), min(c1, tc0 + self.tw)
                    if rr0 >= rr1 or cc0 >= cc1:
                        continue
                    out[rr0 - r0:rr1 - r0, cc0 - c0:cc1 - c0] = \
                        chunk[rr0 - tr0:rr1 - tr0, cc0 - tc0:cc1 - tc0]
        else:
            rps = self.rows_per_strip
            for k in range(r0 // rps, (max(r1, r0 + 1) - 1) // rps + 1):
                chunk = self.read_chunk(f, k, plane)
                sr0 = k * rps
                rr0, rr1 = max(r0, sr0), min(r1, sr0 + chunk.shape[0])
                if rr0 >= rr1:
                    continue
                out[rr0 - r0:rr1 - r0, :] = \
                    chunk[rr0 - sr0:rr1 - sr0, c0:c1]
        return out


def tiff_overview_metas(f) -> list:
    """All chained IFDs of a TIFF as TiffMeta objects — index 0 is the
    base resolution, the rest are overview levels (the COG layout)."""
    metas = [TiffMeta(f)]
    while metas[-1].next_ifd:
        metas.append(TiffMeta(f, metas[-1].next_ifd))
    return metas


def _overview_meta(f, overview: int) -> "TiffMeta":
    m = TiffMeta(f)
    for _ in range(overview):
        if not m.next_ifd:
            raise ValueError(f"overview {overview} not present "
                             "(IFD chain exhausted)")
        m = TiffMeta(f, m.next_ifd)
    return m


def _read_geotiff_arrays(path: str, overview: int = 0):
    """Parse a GeoTIFF into (bands: list[np.ndarray LL-row-first float64],
    transform). Pure python/numpy."""
    with open(path, "rb") as f:
        m = _overview_meta(f, overview)
        arr = m.read_window(f, 0, m.ny, 0, m.nx)
    bands = [arr[::-1, :, b].astype(np.float64) for b in range(m.spp)]
    return bands, m.transform


def read_geotiff_window(path: str, i0: int, j0: int, ny: int, nx: int,
                        band: int = 0, overview: int = 0):
    """Read ONLY the strips/tiles covering a window of a (possibly huge)
    GeoTIFF — the lazy disk-backed band path (reference GdalFileBand,
    _gdal.py:17-57).  Window in the tile-table grid convention: (i0, j0)
    = lower-left corner in LL-row-first pixel coordinates.  Returns
    (values LL-row-first float64, window transform).  ``overview``
    selects a chained-IFD overview level (0 = base resolution)."""
    with open(path, "rb") as f:
        m = _overview_meta(f, overview)
        r1 = m.ny - i0          # top-down row range covering the window
        r0 = m.ny - (i0 + ny)
        arr = m.read_window(f, r0, r1, j0, j0 + nx)
    vals = arr[::-1, :, band].astype(np.float64)
    t = (m.x0 + j0 * m.dx, m.y0 + i0 * m.dy, m.dx, m.dy, 0.0, 0.0)
    return vals, t


def read_geotiff(spark: SparkSession, path: str, grid_id: str = "gtiff",
                 tile: int = 256, nodata: float | None = None,
                 ibands: list[int] | None = None,
                 overview: int = 0) -> DataFrame:
    """Parse a GeoTIFF into a tile table (one band column value per band,
    mirroring the reference's read_geotiff ibands selection,
    raster/read.py:27-62).  Driver-side decode — fine for reference
    layers; use :func:`read_geotiff_distributed` for big rasters.
    ``overview`` selects a chained-IFD overview level.  ``nodata=None``
    (default) takes the file's GDAL_NODATA tag (42113) when present,
    NaN otherwise; an explicit value wins."""
    if nodata is None:
        with open(path, "rb") as f:
            nodata = TiffMeta(f).nodata
        if nodata is None:
            nodata = float("nan")
    bands, transform = _read_geotiff_arrays(path, overview)
    sel = ibands if ibands is not None else range(len(bands))
    out = None
    for b in sel:
        df = grid_to_df(spark, grid_id, bands[b], transform,
                        nodata=nodata, band=int(b), tile=tile)
        out = df if out is None else out.unionByName(df)
    return out


def read_geotiff_distributed(spark: SparkSession, path: str,
                             grid_id: str = "gtiff", tile: int = 256,
                             nodata: float | None = None, band: int = 0,
                             halo: int = 1, overview: int = 0) -> DataFrame:
    """Distributed lazy GeoTIFF scan: the DRIVER parses only the IFD (a
    few KB); each Spark task then opens the file and seeks to exactly the
    strip/tile byte ranges its output tiles need (TiffMeta.read_window).
    Nothing driver-side scales with raster size — the Spark-shaped
    replacement for the reference's on-demand GdalFileBand strip reads
    (_gdal.py:17-57).  The path must be visible to executors (shared FS /
    object store — the standard cluster layout for raster sidecars).

    Output is the standard halo'd tile table (TILE_SCHEMA), so stencil /
    sampling / mask operators run on it unchanged.  ``overview``
    selects a chained-IFD overview level (COG pyramids) — reading a
    decimated level costs only that level's byte ranges.  ``nodata=None``
    takes the file's GDAL_NODATA tag when present, NaN otherwise."""
    with open(path, "rb") as f:
        m = _overview_meta(f, overview)
    if nodata is None:
        nodata = m.nodata if m.nodata is not None else float("nan")
    gny, gnx = m.ny, m.nx
    transform = m.transform
    specs = []
    for i0 in range(0, gny, tile):
        for j0 in range(0, gnx, tile):
            specs.append((i0 // tile, j0 // tile, i0, j0,
                          min(tile, gny - i0), min(tile, gnx - j0)))
    spec_df = spark.createDataFrame(
        specs, "tile_i int, tile_j int, i0 int, j0 int, ny int, nx int")
    spec_df = spec_df.repartition(min(len(specs), 64))
    t = {"x0": transform[0], "y0": transform[1], "dx": transform[2],
         "dy": transform[3], "sx": 0.0, "sy": 0.0}
    cols = [f.split(" ")[0] for f in TILE_SCHEMA.split(", ")]

    def gen(batches):
        with open(path, "rb") as fh:
            meta = _overview_meta(fh, overview)
            for pdf in batches:
                rows = []
                for ti, tj, i0, j0, ny, nx in zip(
                        pdf["tile_i"], pdf["tile_j"], pdf["i0"], pdf["j0"],
                        pdf["ny"], pdf["nx"]):
                    ti, tj, i0, j0, ny, nx = (int(ti), int(tj), int(i0),
                                              int(j0), int(ny), int(nx))
                    ilo, ihi = max(i0 - halo, 0), min(i0 + ny + halo, gny)
                    jlo, jhi = max(j0 - halo, 0), min(j0 + nx + halo, gnx)
                    r1 = gny - ilo          # LL rows -> top-down rows
                    r0 = gny - ihi
                    win = meta.read_window(fh, r0, r1, jlo, jhi)
                    vals = win[::-1, :, band].astype(np.float64)
                    blk = np.full((ny + 2 * halo, nx + 2 * halo), np.nan)
                    blk[halo - (i0 - ilo): halo - (i0 - ilo) + (ihi - ilo),
                        halo - (j0 - jlo): halo - (j0 - jlo) + (jhi - jlo)] = vals
                    rows.append((grid_id, band, ti, tj, i0, j0, ny, nx, halo,
                                 blk.ravel().tolist(), t, float(nodata),
                                 gny, gnx))
                yield pd.DataFrame(rows, columns=cols)

    return spec_df.mapInPandas(gen, TILE_SCHEMA)
