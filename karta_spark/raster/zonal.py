"""Zonal statistics: per-polygon aggregates over a raster tile table.

The reference expresses zonal workflows as ``mask_by_poly`` + grid reduce
(grid.py:619-668 with min/max, grid.py:26-48); at scale that materializes a
masked copy per polygon.  Here the two steps fuse into one pass over the
tile table: each tile computes cell-center membership per polygon with the
vectorized winding kernel (PIP over cell centers — the same semantics as
mask_by_poly's even-odd scanline over centers, kernels.mask_poly) and emits
per-(tile, polygon) partial aggregates; a tiny groupBy finalizes.  The big
table is scanned once regardless of polygon count, the shuffle carries only
O(tiles x polygons) partial rows, and nodata cells never count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from karta_spark.operators.pip_join import PolygonSpec


def zonal_stats(tiles: DataFrame, polys: list[PolygonSpec],
                round_values: int | None = None) -> DataFrame:
    """(poly_id, n_cells, mean, min, max) per polygon over non-nodata cells
    whose CENTER lies inside the polygon (boundary-inclusive, matching the
    reference's contains rule).

    round_values: optionally round each cell value before aggregating —
    used by the oracle gate so both engines aggregate identical inputs."""
    poly_list = list(polys)
    out_schema = ("poly_id string, n bigint, s double, mn double, mx double")

    def partials(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, r in pdf.iterrows():
                h = int(r["halo"])
                ny, nx = int(r["ny"]), int(r["nx"])
                blk = np.asarray(r["block"], dtype=np.float64).reshape(
                    ny + 2 * h, nx + 2 * h)[h:h + ny, h:h + nx]
                if round_values is not None:
                    blk = np.round(blk, round_values)
                t = r["transform"]
                x0, y0 = t["x0"], t["y0"]
                dx, dy, sx, sy = t["dx"], t["dy"], t["sx"], t["sy"]
                i0, j0 = int(r["i0"]), int(r["j0"])
                jj, ii = np.meshgrid(np.arange(nx) + j0, np.arange(ny) + i0)
                cx = x0 + (jj + 0.5) * dx + (ii + 0.5) * sx
                cy = y0 + (ii + 0.5) * dy + (jj + 0.5) * sy
                nod = float(r["nodata"])
                valid = ~np.isnan(blk)
                if not np.isnan(nod):
                    valid &= blk != nod
                fx, fy, fv = cx.ravel(), cy.ravel(), blk.ravel()
                fvalid = valid.ravel()
                for p in poly_list:
                    m = p.contains(fx, fy) & fvalid
                    if m.any():
                        v = fv[m]
                        rows.append((p.poly_id, int(m.sum()), float(v.sum()),
                                     float(v.min()), float(v.max())))
            yield pd.DataFrame(rows, columns=["poly_id", "n", "s", "mn", "mx"])

    part = tiles.mapInPandas(partials, out_schema)
    return (part.groupBy("poly_id")
            .agg(F.sum("n").alias("n_cells"),
                 (F.sum("s") / F.sum("n")).alias("mean"),
                 F.min("mn").alias("min"), F.max("mx").alias("max")))
