"""GeoTIFF read/write — pure python/numpy (the reference delegates to GDAL,
absent here; this covers baseline little-endian TIFF with the GeoTIFF
georeferencing tags, enough for raster interchange).

Supported:
- read: uncompressed, Deflate/zlib (codes 8 and 32946), LZW (5, TIFF
  early-change variant) and PackBits (32773), in STRIP (tags 273/278/279)
  or TILE organization (tags 322-325, the cloud-optimized layout GDAL
  writes for large rasters — edge-tile padding dropped); horizontal-
  differencing predictor (tag 317 = 2) for integer data;
  single- or multi-band chunky interleave (SamplesPerPixel tag 277,
  PlanarConfiguration 284 = 1); uint8/16/32, int16/32, float32/64.
- write: single-band, optional compress="deflate" | "packbits" | "lzw"
  (the analog of the reference's compression write option,
  grid.py:1066-1076) and optional tiled=<edge> tile organization.

Follows the reference's convention flip (raster/read.py:27-62, _gdal.py):
TIFF stores rows top-down with an upper-left tiepoint; the tile table uses
a lower-left-corner transform with positive dy — rows reverse on read and
on write.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from karta_spark.raster.tiles import df_to_grid, grid_to_df

_DTYPES = {
    (8, 1): np.uint8, (16, 1): np.uint16, (32, 1): np.uint32,
    (16, 2): np.int16, (32, 2): np.int32,
    (32, 3): np.float32, (64, 3): np.float64,
}

COMPRESSION_NONE = 1
COMPRESSION_LZW = 5
COMPRESSION_DEFLATE_ADOBE = 8
COMPRESSION_PACKBITS = 32773
COMPRESSION_DEFLATE_OLD = 32946


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


def _compress_chunk(raw: bytes, compress: str | None) -> tuple[int, bytes]:
    if compress is None:
        return COMPRESSION_NONE, raw
    if compress == "deflate":
        return COMPRESSION_DEFLATE_ADOBE, zlib.compress(raw, 6)
    if compress == "packbits":
        return COMPRESSION_PACKBITS, packbits_encode(raw)
    if compress == "lzw":
        return COMPRESSION_LZW, lzw_encode(raw)
    raise ValueError(f"unknown compress option {compress!r}")


def write_geotiff(path: str, tiles: DataFrame, dtype=np.float64,
                  compress: str | None = None, tiled: int | None = None):
    """Write a (small) single-band tile table to a GeoTIFF.

    compress: None | "deflate" | "packbits" | "lzw".
    tiled: tile edge in pixels (multiple of 16, TIFF spec §15) — emits a
    tile-organized file (tags 322-325, the cloud-optimized layout GDAL
    writes for large rasters) instead of one strip; each tile is
    compressed independently (edge tiles zero-padded to full size)."""
    values, transform, nodata = df_to_grid(tiles)
    x0, y0, dx, dy, sx, sy = transform
    if sx != 0 or sy != 0:
        raise ValueError("GeoTIFF writer supports unskewed grids only")
    ny, nx = values.shape
    arr = np.asarray(values, dtype=dtype)[::-1]  # LL-row-first -> top-down

    chunks: list[bytes] = []
    if tiled is None:
        comp_code, data = _compress_chunk(arr.tobytes(), compress)
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
                comp_code, data = _compress_chunk(
                    np.ascontiguousarray(t).tobytes(), compress)
                chunks.append(data)

    bits = arr.dtype.itemsize * 8
    fmt = {np.dtype(np.uint8): 1, np.dtype(np.uint16): 1, np.dtype(np.uint32): 1,
           np.dtype(np.int16): 2, np.dtype(np.int32): 2,
           np.dtype(np.float32): 3, np.dtype(np.float64): 3}[arr.dtype]

    def val_long(v):
        return struct.pack("<I", v)

    def val_short(v):
        return struct.pack("<HH", v, 0)

    # layout: header(8) + IFD + external values + chunk data
    nchunks = len(chunks)
    n_entries = 12 if tiled is None else 13
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    ext_off = ifd_off + ifd_size
    scale_bytes = struct.pack("<3d", dx, dy, 0.0)
    # tiepoint: raster (0,0) [upper-left corner] -> world (x0, y_top)
    y_top = y0 + ny * dy
    tie_bytes = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y_top, 0.0)
    scale_off = ext_off
    tie_off = scale_off + len(scale_bytes)
    arrays_off = tie_off + len(tie_bytes)
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
    if tiled is None:
        entries += [_entry(278, 4, 1, val_long(ny))]  # RowsPerStrip
        entries += chunk_arrays(273, 279)             # Strip offsets/counts
    else:
        entries += [_entry(322, 4, 1, val_long(tiled)),   # TileWidth
                    _entry(323, 4, 1, val_long(tiled))]   # TileLength
        entries += chunk_arrays(324, 325)                 # Tile offsets/counts
    entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])
    assert len(entries) == n_entries
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", ifd_off))
        f.write(struct.pack("<H", n_entries) + b"".join(entries)
                + struct.pack("<I", 0))
        f.write(scale_bytes + tie_bytes)
        if nchunks > 1:
            f.write(struct.pack(f"<{nchunks}I", *chunk_offsets))
            f.write(struct.pack(f"<{nchunks}I", *[len(c) for c in chunks]))
        for c in chunks:
            f.write(c)


def _read_geotiff_arrays(path: str):
    """Parse a GeoTIFF into (bands: list[np.ndarray LL-row-first float64],
    transform). Pure python/numpy."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] not in (b"II*\x00",):
        raise ValueError("only little-endian baseline TIFF supported")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(n):
        tag, ftype, count, raw = struct.unpack_from("<HHI4s", buf, ifd_off + 2 + i * 12)
        tags[tag] = (ftype, count, raw)

    def tag_ints(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise KeyError(f"missing TIFF tag {tag}")
        ftype, count, raw = tags[tag]
        size = {3: 2, 4: 4}[ftype]
        if count * size <= 4:
            vals = struct.unpack_from(f"<{count}{'H' if ftype == 3 else 'I'}", raw)
        else:
            (off,) = struct.unpack("<I", raw)
            vals = struct.unpack_from(f"<{count}{'H' if ftype == 3 else 'I'}", buf, off)
        return list(vals)

    def tag_doubles(tag):
        _, count, raw = tags[tag]
        (off,) = struct.unpack("<I", raw)
        return list(struct.unpack_from(f"<{count}d", buf, off))

    nx = tag_ints(256)[0]
    ny = tag_ints(257)[0]
    spp = tag_ints(277, default=[1])[0]
    bits_l = tag_ints(258)
    if len(set(bits_l)) != 1:
        raise NotImplementedError("per-band BitsPerSample must be uniform")
    bits = bits_l[0]
    comp = tag_ints(259, default=[1])[0]
    planar = tag_ints(284, default=[1])[0]
    predictor = tag_ints(317, default=[1])[0]
    if planar != 1:
        raise NotImplementedError("PlanarConfiguration=2 (planar) not supported")
    fmt = tag_ints(339, default=[1])[0]
    dtype = np.dtype(_DTYPES[(bits, fmt)])

    def decompress(raw, expected):
        if comp == COMPRESSION_NONE:
            return raw
        if comp in (COMPRESSION_DEFLATE_ADOBE, COMPRESSION_DEFLATE_OLD):
            return zlib.decompress(raw)
        if comp == COMPRESSION_PACKBITS:
            return packbits_decode(raw, expected)
        if comp == COMPRESSION_LZW:
            return lzw_decode(raw, expected)
        raise NotImplementedError(f"TIFF compression {comp} not supported "
                                  "(none/deflate/lzw/packbits are)")

    def undo_predictor(chunk):
        if predictor == 2:
            if not np.issubdtype(dtype, np.integer):
                raise NotImplementedError("predictor=2 on float samples")
            return np.cumsum(chunk, axis=1, dtype=dtype)
        return chunk

    if 322 in tags:  # tile-organized (TIFF §15: tags 322-325)
        tw = tag_ints(322)[0]
        th = tag_ints(323)[0]
        offsets = tag_ints(324)
        counts = tag_ints(325)
        ntx = (nx + tw - 1) // tw
        nty = (ny + th - 1) // th
        if len(offsets) != ntx * nty:
            raise ValueError("tile count mismatch (planar/multi-IFD tile "
                             "layout not supported)")
        expected = th * tw * spp * dtype.itemsize
        arr = np.zeros((nty * th, ntx * tw, spp), dtype=dtype)
        for k, (o, c) in enumerate(zip(offsets, counts)):
            data = decompress(buf[o:o + c], expected)
            t = np.frombuffer(data[:expected], dtype="<" + dtype.str[1:])
            t = undo_predictor(t.reshape(th, tw, spp))
            ty, tx = divmod(k, ntx)
            arr[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw] = t
        arr = arr[:ny, :nx]  # drop edge-tile padding
    else:
        offsets = tag_ints(273)
        counts = tag_ints(279)
        rows_per_strip = tag_ints(278, default=[ny])[0]
        row_bytes = nx * spp * dtype.itemsize
        chunks = []
        for k, (o, c) in enumerate(zip(offsets, counts)):
            strip_rows = min(rows_per_strip, ny - k * rows_per_strip)
            expected = strip_rows * row_bytes
            data = decompress(buf[o:o + c], expected)
            strip = np.frombuffer(data[:expected], dtype="<" + dtype.str[1:])
            strip = undo_predictor(strip.reshape(strip_rows, nx, spp))
            chunks.append(strip)
        arr = np.concatenate(chunks, axis=0)  # (ny, nx, spp) top-down

    dxs = tag_doubles(33550)
    tie = tag_doubles(33922)
    dx, dy = dxs[0], dxs[1]
    x0 = tie[3]
    y_top = tie[4]
    y0 = y_top - ny * dy  # UL tiepoint -> LL-corner convention
    transform = (x0, y0, dx, dy, 0.0, 0.0)
    bands = [arr[::-1, :, b].astype(np.float64) for b in range(spp)]
    return bands, transform


def read_geotiff(spark: SparkSession, path: str, grid_id: str = "gtiff",
                 tile: int = 256, nodata: float = float("nan"),
                 ibands: list[int] | None = None) -> DataFrame:
    """Parse a GeoTIFF into a tile table (one band column value per band,
    mirroring the reference's read_geotiff ibands selection,
    raster/read.py:27-62)."""
    bands, transform = _read_geotiff_arrays(path)
    sel = ibands if ibands is not None else range(len(bands))
    out = None
    for b in sel:
        df = grid_to_df(spark, grid_id, bands[b], transform,
                        nodata=nodata, band=int(b), tile=tile)
        out = df if out is None else out.unionByName(df)
    return out
