"""Tile-table algebra: +/- on structure-equal grids, weighted mosaic, apply.

Reference semantics:
- grid +/- (grid.py:196-210): structure-equal only
- ``merge`` mosaic (grid.py:1141-1231): weighted average of overlapping
  grids on a common lattice (transforms must differ by integer translation)
- ``Grid.apply`` (grid.py:54-78): map a function over non-nodata cells

Distributed shape: every op is a cell-keyed hash join / aggregate on
(tile_i, tile_j) with array zip kernels inside — tiles never leave their
executor except through the one shuffle on the tile key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from karta_spark.raster.tiles import TILE_SCHEMA


def grid_add(a: DataFrame, b: DataFrame, out_grid_id: str = "sum") -> DataFrame:
    """Per-pixel a + b for structure-equal tile tables (zip_with — JVM)."""
    bb = b.select(
        "band", "tile_i", "tile_j", F.col("block").alias("block_b"))
    j = a.join(bb, ["band", "tile_i", "tile_j"])
    return j.withColumn(
        "block", F.zip_with("block", "block_b", lambda x, y: x + y)
    ).drop("block_b").withColumn("grid_id", F.lit(out_grid_id))


def grid_sub(a: DataFrame, b: DataFrame, out_grid_id: str = "diff") -> DataFrame:
    bb = b.select("band", "tile_i", "tile_j", F.col("block").alias("block_b"))
    j = a.join(bb, ["band", "tile_i", "tile_j"])
    return j.withColumn(
        "block", F.zip_with("block", "block_b", lambda x, y: x - y)
    ).drop("block_b").withColumn("grid_id", F.lit(out_grid_id))


def grid_apply(tiles: DataFrame, fn, out_grid_id: str | None = None) -> DataFrame:
    """Map a numpy vector function over non-nodata cells (grid.py:54-78)."""
    def run(pdf_iter):
        for pdf in pdf_iter:
            out = pdf.copy()
            blocks = []
            for _, r in pdf.iterrows():
                blk = np.asarray(r["block"], dtype=np.float64)
                nd = r["nodata"]
                mask = np.isnan(blk) if np.isnan(nd) else (blk == nd)
                res = blk.copy()
                res[~mask] = fn(blk[~mask])
                blocks.append(res.tolist())
            out["block"] = blocks
            if out_grid_id is not None:
                out["grid_id"] = out_grid_id
            yield out

    return tiles.mapInPandas(run, TILE_SCHEMA)


def mosaic(grids: DataFrame, weights: dict[str, float] | None = None,
           out_grid_id: str = "mosaic") -> DataFrame:
    """Weighted-average mosaic of co-aligned tile tables (union'd into one
    DataFrame, same transform lattice): groupBy tile key, weighted per-pixel
    mean ignoring nodata (grid.py:1141-1231 semantics on a common lattice).
    """
    w = weights or {}

    def combine(key, pdf: pd.DataFrame):
        r0 = pdf.iloc[0]
        nd = float(r0["nodata"])
        acc = None
        wsum = None
        for _, r in pdf.iterrows():
            blk = np.asarray(r["block"], dtype=np.float64)
            wt = float(w.get(r["grid_id"], 1.0))
            valid = ~np.isnan(blk) if np.isnan(nd) else (blk != nd)
            if acc is None:
                acc = np.zeros_like(blk)
                wsum = np.zeros_like(blk)
            acc[valid] += wt * blk[valid]
            wsum[valid] += wt
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(wsum > 0, acc / wsum, nd)
        row = r0.copy()
        row["block"] = out.tolist()
        row["grid_id"] = out_grid_id
        return pd.DataFrame([row])

    return grids.groupBy("band", "tile_i", "tile_j").applyInPandas(combine, TILE_SCHEMA)
