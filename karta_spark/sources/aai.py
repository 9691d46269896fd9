"""ESRI ASCII grid (.asc) read/write (reference raster/_aai.py:5-83,
grid.py:1084-1139). Test-fixture-scale ingest into the tile table model.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from karta_spark.raster.tiles import df_to_grid, grid_to_df


def read_aai(spark: SparkSession, path: str, grid_id: str = "aai",
             tile: int = 256) -> DataFrame:
    """Parse header + array; nodata -> NaN (reference read.py:9-21).

    Supports xllcorner/yllcorner and xllcenter/yllcenter conventions."""
    headers = {}
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            key = parts[0].lower()
            if key in ("ncols", "nrows", "xllcorner", "yllcorner",
                       "xllcenter", "yllcenter", "cellsize", "nodata_value"):
                headers[key] = float(parts[1])
            else:
                rows.append([float(v) for v in parts])
    nrows = int(headers["nrows"])
    ncols = int(headers["ncols"])
    cell = headers["cellsize"]
    values = np.array(rows, dtype=np.float64).reshape(nrows, ncols)
    # AAI stores top row first; our grid is bottom-up (LL-corner transform)
    values = values[::-1]
    nd = headers.get("nodata_value")
    if nd is not None:
        values = np.where(values == nd, np.nan, values)
    if "xllcorner" in headers:
        x0, y0 = headers["xllcorner"], headers["yllcorner"]
    else:
        x0 = headers["xllcenter"] - 0.5 * cell
        y0 = headers["yllcenter"] - 0.5 * cell
    transform = (x0, y0, cell, cell, 0.0, 0.0)
    return grid_to_df(spark, grid_id, values, transform, tile=tile)


def to_aai(tiles: DataFrame, path: str, nodata: float = -9999.0):
    """Write a (small, isometric) tile table to .asc (grid.py:1084-1139)."""
    values, transform, _ = df_to_grid(tiles)
    x0, y0, dx, dy, sx, sy = transform
    if sx != 0 or sy != 0 or dx != dy:
        raise ValueError("AAI requires isometric, unskewed grids")
    ny, nx = values.shape
    out = np.where(np.isnan(values), nodata, values)[::-1]
    with open(path, "w") as f:
        f.write(f"NCOLS {nx}\nNROWS {ny}\n")
        f.write(f"XLLCORNER {x0!r}\nYLLCORNER {y0!r}\nCELLSIZE {dx!r}\n")
        f.write(f"NODATA_VALUE {nodata!r}\n")
        for row in out:
            f.write(" ".join(repr(v) for v in row) + "\n")
