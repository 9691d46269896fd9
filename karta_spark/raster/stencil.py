"""3x3 neighborhood stencils over halo'd tiles (spatial window functions).

Reference karta/raster/misc.py: slope (:8-40), aspect (:43-71), gradient
(:74-103), divergence (:105-130), hillshade (:167-206) — all ESRI
neighborhood-method stencils.

Distributed form: tiles carry a 1-pixel halo (duplicated at write time,
tiles.py), so every stencil is **tile-local** — an embarrassingly parallel
mapInPandas with zero query-time shuffle.  Grid borders replicate the
reference's padding: slope pads with odd reflection (misc.py:16-17),
aspect/gradient with NaN (misc.py:51, 81).  Hillshade needs one global
reduction (the 2/98 percentile clip, misc.py:204) — done with an exact
distributed percentile over the valid cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from karta_spark.raster.tiles import TILE_SCHEMA


def _esri_derivs(D: np.ndarray, dx: float, dy: float):
    """Weighted 3x3 derivative (interior cells of D) — misc.py:12-16."""
    Ddx = ((2 * D[1:-1, 2:] + D[:-2, 2:] + D[2:, 2:])
           - (2 * D[1:-1, :-2] + D[:-2, :-2] + D[2:, :-2])) / (8.0 * dx)
    Ddy = ((2 * D[2:, 1:-1] + D[2:, 2:] + D[2:, :-2])
           - (2 * D[:-2, 1:-1] + D[:-2, :-2] + D[:-2, 2:])) / (8.0 * dy)
    return Ddx, Ddy


def _tile_stencil(tiles: DataFrame, fn, out_grid_id: str) -> DataFrame:
    """Apply fn(block_with_halo, dx, dy, border_info) -> core-sized array."""
    def run(pdf_iter):
        for pdf in pdf_iter:
            out = pdf.copy()
            blocks = []
            for _, r in pdf.iterrows():
                h, ny, nx = int(r["halo"]), int(r["ny"]), int(r["nx"])
                assert h >= 1, "stencils require halo >= 1 tiles"
                t = r["transform"]
                blk = np.asarray(r["block"], dtype=np.float64).reshape(
                    ny + 2 * h, nx + 2 * h)
                nd = float(r["nodata"])
                D = np.where(np.isnan(blk) if np.isnan(nd) else blk == nd,
                             np.nan, blk)
                core = fn(D, float(t["dx"]), float(t["dy"]),
                          (int(r["i0"]), int(r["j0"]), int(r["gny"]), int(r["gnx"]), h))
                res = np.full_like(blk, np.nan)
                res[h:h + ny, h:h + nx] = core
                blocks.append(res.ravel().tolist())
            out["block"] = blocks
            out["grid_id"] = out_grid_id
            out["nodata"] = float("nan")
            yield out

    return tiles.mapInPandas(run, TILE_SCHEMA)


def _with_border(core: np.ndarray, info, mode: str):
    """Replicate reference border padding on *grid* borders only.

    ``core`` covers the tile's core cells, already computed from halo'd
    data; interior tile borders are exact. Grid-border rows/cols get the
    reference's pad: NaN (aspect/gradient) or odd reflection (slope)."""
    i0, j0, gny, gnx, _ = info
    ny, nx = core.shape
    if mode == "nan":
        if i0 == 0:
            core[0, :] = np.nan
        if j0 == 0:
            core[:, 0] = np.nan
        if i0 + ny == gny:
            core[-1, :] = np.nan
        if j0 + nx == gnx:
            core[:, -1] = np.nan
    elif mode == "reflect_odd":
        # np.pad(..., "reflect", reflect_type="odd"): edge = 2*a[0]-a[1]
        if i0 == 0 and ny >= 3:
            core[0, :] = 2 * core[1, :] - core[2, :]
        if i0 + ny == gny and ny >= 3:
            core[-1, :] = 2 * core[-2, :] - core[-3, :]
        if j0 == 0 and nx >= 3:
            core[:, 0] = 2 * core[:, 1] - core[:, 2]
        if j0 + nx == gnx and nx >= 3:
            core[:, -1] = 2 * core[:, -2] - core[:, -3]
    return core


def slope(tiles: DataFrame, out_grid_id: str = "slope") -> DataFrame:
    """Scalar slope, ESRI neighborhood method (misc.py:8-40)."""
    def fn(D, dx, dy, info):
        Ddx, Ddy = _esri_derivs(D, dx, dy)
        return _with_border(np.sqrt(Ddx * Ddx + Ddy * Ddy), info, "reflect_odd")
    return _tile_stencil(tiles, fn, out_grid_id)


def aspect(tiles: DataFrame, out_grid_id: str = "aspect") -> DataFrame:
    """Slope aspect = atan2(Ddy, -Ddx) (misc.py:43-71)."""
    def fn(D, dx, dy, info):
        Ddx, Ddy = _esri_derivs(D, dx, dy)
        return _with_border(np.arctan2(Ddy, -Ddx), info, "nan")
    return _tile_stencil(tiles, fn, out_grid_id)


def gradient(tiles: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(d/dx, d/dy) grids (misc.py:74-103)."""
    def fx(D, dx, dy, info):
        return _with_border(_esri_derivs(D, dx, dy)[0], info, "nan")

    def fy(D, dx, dy, info):
        return _with_border(_esri_derivs(D, dx, dy)[1], info, "nan")

    return _tile_stencil(tiles, fx, "ddx"), _tile_stencil(tiles, fy, "ddy")


def divergence(u_tiles: DataFrame, v_tiles: DataFrame,
               out_grid_id: str = "div") -> DataFrame:
    """Divergence of a 2-band vector field (misc.py:105-130): central
    differences dU/dx + dV/dy; NaN on grid borders of each term."""
    def fu(U, dx, dy, info):
        d = (U[1:-1, 2:] - U[1:-1, :-2]) / (2.0 * dx)
        return _with_border_cols(d, info)

    def fv(V, dx, dy, info):
        d = (V[2:, 1:-1] - V[:-2, 1:-1]) / (2.0 * dy)
        return _with_border_rows(d, info)

    du = _tile_stencil(u_tiles, fu, out_grid_id)
    dv = _tile_stencil(v_tiles, fv, out_grid_id)
    from karta_spark.raster.algebra import grid_add
    return grid_add(du, dv, out_grid_id)


def _with_border_cols(core, info):
    i0, j0, gny, gnx, _ = info
    if j0 == 0:
        core[:, 0] = np.nan
    if j0 + core.shape[1] == gnx:
        core[:, -1] = np.nan
    return core


def _with_border_rows(core, info):
    i0, j0, gny, gnx, _ = info
    if i0 == 0:
        core[0, :] = np.nan
    if i0 + core.shape[0] == gny:
        core[-1, :] = np.nan
    return core


def hillshade(tiles: DataFrame, azimuth: float = 330.0, elevation: float = 60.0,
              out_grid_id: str = "hillshade") -> DataFrame:
    """Hill-shading (misc.py:167-206): unit normal from the gradient dotted
    with the light vector, clipped to the global [2, 98] percentiles.

    Two passes: per-tile dot product (no shuffle), then a distributed
    percentile and a cheap map to clip."""
    s = np.array([np.cos(np.radians(azimuth)), np.sin(np.radians(azimuth)),
                  np.sin(np.radians(elevation))])

    def fn(D, dx, dy, info):
        Ddx, Ddy = _esri_derivs(D, dx, dy)
        Ddx = _with_border(Ddx, info, "nan")
        Ddy = _with_border(Ddy, info, "nan")
        # normal = (dx,0,Ddx) x (0,dy,Ddy) = (-dy*Ddx, -dx*Ddy, dx*dy)
        wx, wy, wz = -dy * Ddx, -dx * Ddy, dx * dy * np.ones_like(Ddx)
        norm = np.sqrt(wx * wx + wy * wy + wz * wz)
        return (wx * s[0] + wy * s[1] + wz * s[2]) / norm

    dprod = _tile_stencil(tiles, fn, out_grid_id)

    def vals(pdf_iter):
        for pdf in pdf_iter:
            outs = []
            for _, r in pdf.iterrows():
                h, ny, nx = int(r["halo"]), int(r["ny"]), int(r["nx"])
                blk = np.asarray(r["block"], dtype=np.float64).reshape(
                    ny + 2 * h, nx + 2 * h)[h:h + ny, h:h + nx]
                v = blk[~np.isnan(blk)]
                if len(v):
                    outs.append(pd.DataFrame({"v": v}))
            if outs:
                yield pd.concat(outs)

    flat = dprod.mapInPandas(vals, "v double")
    qlo, qhi = flat.approxQuantile("v", [0.02, 0.98], 1e-4)

    def clip(pdf_iter):
        for pdf in pdf_iter:
            out = pdf.copy()
            out["block"] = [np.clip(np.asarray(b, dtype=np.float64), qlo, qhi).tolist()
                            for b in pdf["block"]]
            yield out

    return dprod.mapInPandas(clip, TILE_SCHEMA)
