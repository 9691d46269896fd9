"""Distributed tile rendering: point tables -> z/x/y raster tiles.

The serving end of the tiling engine (SURVEY north star: spatial join
+ tiling at image scale): render a 10^12-point table into a slippy-map
pyramid of PNG heatmap tiles.

Scale shape — the heavy reduction is PURE CATALYST:

1. (lon, lat) -> global WebMercator pixel (the same ``c = 128/π·2^z``
   arithmetic as functions/cells.py tile_x/tile_y, so tiles and cells
   agree bit-for-bit) -> groupBy (tile_x, tile_y, px, py) COUNT.
   Map-side partial aggregation means shuffle volume is bounded by
   DISTINCT LIT PIXELS (≤ 65 536/tile · non-empty tiles), not points.
2. applyInPandas per tile: scatter the sparse pixel counts into a
   tile_px × tile_px array, tone-map, PNG-encode (sources/images
   encode_png — the from-scratch codec).  Each tile is independent —
   row-level parallelism, bounded memory per task.

The PNG payload is grayscale 8-bit: 255·count/max_count per lit pixel
(a deterministic tone map, so decode-side verification is exact).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_SCHEMA_RENDER = ("z int, tx long, ty long, png binary, "
                      "n_points long, n_pixels long, max_count long")


def global_pixel(lon, lat, zoom: int, tile_px: int = 256):
    """(gx, gy) global WebMercator pixel columns — floor of the same
    continuous pixel coordinate tile_x/tile_y floor at /256."""
    c = (tile_px / 2.0) / math.pi * float(2 ** zoom)
    gx = F.floor(c * (F.radians(lon) + math.pi)).cast("long")
    gy = F.floor(c * (math.pi - F.log(
        F.tan(math.pi / 4.0 + F.radians(lat) / 2.0)))).cast("long")
    return gx, gy


def render_point_tiles(points: DataFrame, lon_col: str, lat_col: str,
                       zoom: int, tile_px: int = 256) -> DataFrame:
    """-> one row per NON-EMPTY tile: (z, tx, ty, png, n_points,
    n_pixels, max_count).  Points outside the WebMercator latitude
    band are dropped (standard slippy-map behavior)."""
    n = 2 ** zoom
    lon, lat = F.col(lon_col), F.col(lat_col)
    gx, gy = global_pixel(lon, lat, zoom, tile_px)
    lit = (points
           .where((lat > -85.05112878) & (lat < 85.05112878)
                  & (lon >= -180.0) & (lon <= 180.0))
           .select(F.least(gx, F.lit(n * tile_px - 1)).alias("gx"),
                   F.least(gy, F.lit(n * tile_px - 1)).alias("gy"))
           .groupBy("gx", "gy").agg(F.count("*").alias("cnt"))
           .select(F.floor(F.col("gx") / tile_px).cast("long").alias("tx"),
                   F.floor(F.col("gy") / tile_px).cast("long").alias("ty"),
                   (F.col("gx") % tile_px).cast("int").alias("px"),
                   (F.col("gy") % tile_px).cast("int").alias("py"),
                   F.col("cnt")))

    def rasterize(key, pdf):
        from karta_spark.sources.images import encode_png
        tx, ty = int(key[0]), int(key[1])
        img = np.zeros((tile_px, tile_px), dtype=np.int64)
        img[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = \
            pdf["cnt"].to_numpy()
        mx = int(img.max())
        # deterministic tone map: 255*count//max (integer, exact)
        tone = (img * 255 // max(mx, 1)).astype(np.uint8)
        png = encode_png(np.repeat(tone[:, :, None], 3, axis=2))
        return pd.DataFrame([(zoom, tx, ty, bytearray(png),
                              int(pdf["cnt"].sum()), len(pdf), mx)],
                            columns=["z", "tx", "ty", "png", "n_points",
                                     "n_pixels", "max_count"])

    return lit.groupBy("tx", "ty").applyInPandas(rasterize,
                                                 TILE_SCHEMA_RENDER)
