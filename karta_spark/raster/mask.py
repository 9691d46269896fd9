"""mask_by_poly / zonal assignment.

Reference ``RegularGrid.mask_by_poly`` (grid.py:619-668 + scanline
``mask_poly`` grid.py:1304-1384): burn polygons into a boolean mask over
pixel centers, nodata outside.

Distributed form: per-tile kernel (each tile rasterizes the broadcast
polygon against its own pixel centers — embarrassingly parallel, no
shuffle); the vector->cell direction (which polygon does each pixel belong
to) is the zonal-assignment join used by the flagship pipeline.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from karta_spark.functions.kernels import winding_contains
from karta_spark.raster.tiles import TILE_SCHEMA


def mask_by_poly(tiles: DataFrame, polys: list, invert: bool = False) -> DataFrame:
    """Set cells outside all polygons to nodata (inside, when *invert*).

    *polys* — list of (outer_ring ndarray, holes list) or PolygonSpec."""
    rings = []
    for p in polys:
        if hasattr(p, "outer"):
            rings.append((np.asarray(p.outer, float), [np.asarray(h, float) for h in p.holes]))
        else:
            outer, holes = p
            rings.append((np.asarray(outer, float), [np.asarray(h, float) for h in holes]))

    def run(pdf_iter):
        for pdf in pdf_iter:
            out = pdf.copy()
            blocks = []
            for _, r in pdf.iterrows():
                h, ny, nx = int(r["halo"]), int(r["ny"]), int(r["nx"])
                t = r["transform"]
                blk = np.asarray(r["block"], dtype=np.float64).reshape(ny + 2 * h, nx + 2 * h)
                nd = float(r["nodata"])
                # global pixel-center coordinates of this tile's block
                ii = np.arange(int(r["i0"]) - h, int(r["i0"]) + ny + h)
                jj = np.arange(int(r["j0"]) - h, int(r["j0"]) + nx + h)
                JJ, II = np.meshgrid(jj, ii)
                cx = t["x0"] + (JJ + 0.5) * t["dx"] + (II + 0.5) * t["sx"]
                cy = t["y0"] + (II + 0.5) * t["dy"] + (JJ + 0.5) * t["sy"]
                mask = np.zeros(blk.shape, dtype=bool)
                for outer, holes in rings:
                    m = winding_contains(cx.ravel(), cy.ravel(), outer).reshape(blk.shape)
                    for hole in holes:
                        m &= ~winding_contains(cx.ravel(), cy.ravel(), hole).reshape(blk.shape)
                    mask |= m
                if invert:
                    mask = ~mask
                res = np.where(mask, blk, nd)
                blocks.append(res.ravel().tolist())
            out["block"] = blocks
            yield out

    return tiles.mapInPandas(run, TILE_SCHEMA)
