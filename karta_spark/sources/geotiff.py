"""Minimal GeoTIFF read/write — pure python/numpy (the reference delegates
to GDAL, absent here; this covers uncompressed baseline TIFF with the
GeoTIFF georeferencing tags, enough for raster fixture interchange).

Supported: single- or multi-band, uncompressed strips, uint8/16/32,
int16/32, float32/64; tags ModelPixelScale (33550) + ModelTiepoint (33922).
Follows the reference's convention flip (raster/read.py:27-62, _gdal.py):
TIFF stores rows top-down with an upper-left tiepoint; the tile table uses
a lower-left-corner transform with positive dy — rows reverse on read and
on write.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from karta_spark.raster.tiles import df_to_grid, grid_to_df

_DTYPES = {
    (8, 1): np.uint8, (16, 1): np.uint16, (32, 1): np.uint32,
    (16, 2): np.int16, (32, 2): np.int32,
    (32, 3): np.float32, (64, 3): np.float64,
}


def _entry(tag, ftype, count, value):
    return struct.pack("<HHI4s", tag, ftype, count, value)


def write_geotiff(path: str, tiles: DataFrame, dtype=np.float64):
    """Write a (small) single-band tile table to an uncompressed GeoTIFF."""
    values, transform, nodata = df_to_grid(tiles)
    x0, y0, dx, dy, sx, sy = transform
    if sx != 0 or sy != 0:
        raise ValueError("GeoTIFF writer supports unskewed grids only")
    ny, nx = values.shape
    arr = np.asarray(values, dtype=dtype)[::-1]  # LL-row-first -> top-down
    data = arr.tobytes()

    bits = arr.dtype.itemsize * 8
    fmt = {np.dtype(np.uint8): 1, np.dtype(np.uint16): 1, np.dtype(np.uint32): 1,
           np.dtype(np.int16): 2, np.dtype(np.int32): 2,
           np.dtype(np.float32): 3, np.dtype(np.float64): 3}[arr.dtype]

    # layout: header(8) + IFD + external values + pixel data
    n_entries = 11
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    ext_off = ifd_off + ifd_size
    scale_bytes = struct.pack("<3d", dx, dy, 0.0)
    # tiepoint: raster (0,0) [upper-left corner] -> world (x0, y_top)
    y_top = y0 + ny * dy
    tie_bytes = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y_top, 0.0)
    scale_off = ext_off
    tie_off = scale_off + len(scale_bytes)
    data_off = tie_off + len(tie_bytes)

    def val_long(v):
        return struct.pack("<I", v)

    def val_short(v):
        return struct.pack("<HH", v, 0)

    entries = [
        _entry(256, 4, 1, val_long(nx)),           # ImageWidth
        _entry(257, 4, 1, val_long(ny)),           # ImageLength
        _entry(258, 3, 1, val_short(bits)),        # BitsPerSample
        _entry(259, 3, 1, val_short(1)),           # Compression: none
        _entry(262, 3, 1, val_short(1)),           # Photometric: BlackIsZero
        _entry(273, 4, 1, val_long(data_off)),     # StripOffsets
        _entry(278, 4, 1, val_long(ny)),           # RowsPerStrip
        _entry(279, 4, 1, val_long(len(data))),    # StripByteCounts
        _entry(339, 3, 1, val_short(fmt)),         # SampleFormat
        _entry(33550, 12, 3, val_long(scale_off)),  # ModelPixelScale
        _entry(33922, 12, 6, val_long(tie_off)),    # ModelTiepoint
    ]
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", ifd_off))
        f.write(struct.pack("<H", n_entries) + b"".join(entries)
                + struct.pack("<I", 0))
        f.write(scale_bytes + tie_bytes + data)


def read_geotiff(spark: SparkSession, path: str, grid_id: str = "gtiff",
                 tile: int = 256, nodata: float = float("nan")) -> DataFrame:
    """Parse an uncompressed GeoTIFF into a tile table."""
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

    def tag_ints(tag):
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
    bits = tag_ints(258)[0]
    if tag_ints(259)[0] != 1:
        raise NotImplementedError("compressed TIFF not supported")
    fmt = tag_ints(339)[0] if 339 in tags else 1
    dtype = _DTYPES[(bits, fmt)]
    offsets = tag_ints(273)
    counts = tag_ints(279)
    rows_per_strip = tag_ints(278)[0] if 278 in tags else ny
    raw = b"".join(buf[o:o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw, dtype="<" + np.dtype(dtype).str[1:]).reshape(ny, nx)
    _ = rows_per_strip

    dxs = tag_doubles(33550)
    tie = tag_doubles(33922)
    dx, dy = dxs[0], dxs[1]
    x0 = tie[3]
    y_top = tie[4]
    y0 = y_top - ny * dy  # UL tiepoint -> LL-corner convention
    values = arr[::-1].astype(np.float64)  # top-down -> LL-row-first
    return grid_to_df(spark, grid_id, values, (x0, y0, dx, dy, 0.0, 0.0),
                      nodata=nodata, tile=tile)
