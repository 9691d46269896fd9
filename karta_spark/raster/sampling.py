"""Raster sampling as cell-keyed hash joins.

``RegularGrid.sample_nearest / sample_bilinear`` (reference grid.py:830-969)
become: compute fractional (i, j) for every point with *pure column
expressions* (the closed-form inverse affine of crfuncs.pyx:12-33, -0.5
convention), key each point by the tile containing its clamped floor index,
hash-join to the tile table, and run the exact numpy kernel per tile group.

The tile halo (tiles.py) makes bilinear tile-local — no neighbor exchange at
query time; validity is decided against *global* indices so boundary
semantics match the reference kernels bit-for-bit (nearest: round then
bounds-check, grid.py:830-892; bilinear: split-index bounds, crfuncs.pyx).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from karta_spark.functions.kernels import _split_index
from karta_spark.raster.tiles import DEFAULT_TILE


def position_exprs(transform, x: Column, y: Column):
    """Fractional (i, j) as Catalyst expressions (crfuncs.pyx:12-33)."""
    x0, y0, dx, dy, sx, sy = (float(v) for v in transform)
    denom = dx * dy - sx * sy
    j = (F.lit(dy) * x - dy * x0 + sx * y0 - F.lit(sx) * y) / denom
    i = (y - F.lit(y0) - j * sy) / dy
    return i - 0.5, j - 0.5


def sample_join(
    points: DataFrame, tiles: DataFrame, transform,
    method: str = "bilinear", px: str = "x", py: str = "y",
    tile: int | None = None, value_col: str = "value",
    point_crs=None, grid_crs=None,
) -> DataFrame:
    """Sample a (single-grid, single-band) tile table at point locations.

    Returns *points* plus ``value_col`` (nodata where outside the grid).
    The tile size is inferred from the table (max core extent) unless
    overridden.

    When *point_crs* differs from *grid_crs* the query coordinates are
    reprojected into the grid's CRS first — pure column math via
    functions.crs — mirroring the reference's ``sample`` CRS transform
    (grid.py:1018-1021: points are converted to the grid CRS before the
    inverse-affine positions lookup)."""
    if point_crs is not None and grid_crs is not None:
        from karta_spark.functions import crs as kcrs
        src = kcrs.lookup(point_crs)
        dst = kcrs.lookup(grid_crs)
        if src.name != dst.name:
            lon, lat = kcrs.inverse_exprs(src, F.col(px), F.col(py))
            gx, gy = kcrs.forward_exprs(dst, lon, lat)
            points = points.withColumns({"_gx": gx, "_gy": gy})
            out = sample_join(points, tiles, transform, method=method,
                              px="_gx", py="_gy", tile=tile, value_col=value_col)
            return out.drop("_gx", "_gy")
    meta = tiles.agg(
        F.first("gny").alias("gny"), F.first("gnx").alias("gnx"),
        F.first("nodata").alias("nodata"),
        F.max("ny").alias("tny"), F.max("nx").alias("tnx"),
        F.count("*").alias("n_tiles")).first()
    gny, gnx, nodata = int(meta["gny"]), int(meta["gnx"]), float(meta["nodata"])
    if tile is None:
        tile = max(int(meta["tny"]), int(meta["tnx"]))
    # broadcast only when the tile table is genuinely small: a continental
    # raster must shuffle-join on (_ti, _tj) instead of shipping every
    # block to every executor
    est_bytes = int(meta["n_tiles"]) * (int(meta["tny"]) + 2) * (int(meta["tnx"]) + 2) * 8
    small_enough = est_bytes < 256 * (1 << 20)

    i, j = position_exprs(transform, F.col(px), F.col(py))
    pts = points.withColumn("_i", i).withColumn("_j", j)
    clamp_i = F.greatest(F.lit(0), F.least(F.lit(gny - 1), F.floor("_i")))
    clamp_j = F.greatest(F.lit(0), F.least(F.lit(gnx - 1), F.floor("_j")))
    pts = pts.withColumn("_ti", (clamp_i / tile).cast("int")) \
             .withColumn("_tj", (clamp_j / tile).cast("int"))

    t = tiles.select(
        F.col("tile_i").alias("_ti"), F.col("tile_j").alias("_tj"),
        "i0", "j0", "ny", "nx", "halo", "block",
    )
    cand = pts.join(F.broadcast(t) if small_enough else t, ["_ti", "_tj"], "left")

    out_fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in points.schema.fields]
    out_schema = ", ".join(out_fields + [f"`{value_col}` double"])
    keep = [f.name for f in points.schema.fields]
    if method not in ("bilinear", "linear", "nearest"):
        raise ValueError(f"unknown sampling method {method!r}")
    use_bilinear = method in ("bilinear", "linear")  # reference names it 'linear'

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            vals = np.full(len(pdf), nodata, dtype=np.float64)
            has_tile = pdf["block"].notna().to_numpy()
            sub = pdf[has_tile]
            for (i0, j0), grp in sub.groupby(["i0", "j0"]):
                r0 = grp.iloc[0]
                h, ny, nx = int(r0["halo"]), int(r0["ny"]), int(r0["nx"])
                blk = np.asarray(r0["block"], dtype=np.float64).reshape(ny + 2 * h, nx + 2 * h)
                gi = grp["_i"].to_numpy(dtype=np.float64)
                gj = grp["_j"].to_numpy(dtype=np.float64)
                # round/split on GLOBAL indices (banker's rounding and the
                # integer split rule are not shift-invariant: a half-integer
                # shifted by the odd local offset i0-h rounds to the other
                # neighbor, and global 0 would split to local (0,1) =
                # global (-1,0) — the NaN halo row); only the final gather
                # maps global ints to the halo'd block
                off_i = int(i0) - h
                off_j = int(j0) - h
                m, n = blk.shape
                if use_bilinear:
                    gi0, gi1 = _split_index(gi)
                    gj0, gj1 = _split_index(gj)
                    ok = (gi0 >= 0) & (gi1 < gny) & (gj0 >= 0) & (gj1 < gnx)
                    i0c = np.clip(gi0 - off_i, 0, m - 1)
                    i1c = np.clip(gi1 - off_i, 0, m - 1)
                    j0c = np.clip(gj0 - off_j, 0, n - 1)
                    j1c = np.clip(gj1 - off_j, 0, n - 1)
                    got = (
                        blk[i0c, j0c] * (gi1 - gi) * (gj1 - gj)
                        + blk[i1c, j0c] * (gi - gi0) * (gj1 - gj)
                        + blk[i0c, j1c] * (gi1 - gi) * (gj - gj0)
                        + blk[i1c, j1c] * (gi - gi0) * (gj - gj0)
                    )
                else:
                    ri = np.round(gi).astype(np.int64)
                    rj = np.round(gj).astype(np.int64)
                    ok = (ri >= 0) & (ri < gny) & (rj >= 0) & (rj < gnx)
                    got = blk[np.clip(ri - off_i, 0, m - 1),
                              np.clip(rj - off_j, 0, n - 1)]
                vals[grp.index.to_numpy()] = np.where(ok, got, nodata)
            res = pdf[keep].copy()
            res[value_col] = vals
            yield res

    return cand.mapInPandas(kernel, out_schema)


def sample_join_multiband(
    points: DataFrame, tiles: DataFrame, transform,
    method: str = "bilinear", px: str = "x", py: str = "y",
    tile: int | None = None, value_prefix: str = "band",
) -> DataFrame:
    """Multiband sampling (reference returns a value per band,
    grid.py:830-969): one sampling join per band on the same point keys —
    each band's tiles broadcast independently, no cross-band shuffle."""
    bands = sorted(r["band"] for r in tiles.select("band").distinct().collect())
    out = points
    for b in bands:
        out = sample_join(out, tiles.where(F.col("band") == b), transform,
                          method=method, px=px, py=py, tile=tile,
                          value_col=f"{value_prefix}_{b}")
    return out


def profile(
    tiles: DataFrame, transform, line_vertices, spacing: float,
    method: str = "nearest",
) -> DataFrame:
    """Sample the grid along a line at fixed spacing — reference
    ``RegularGrid.profile`` (grid.py:1035-1064): resample the line with
    ``to_points`` then route through the sampling join."""
    from karta_spark.functions.geometry import to_points

    spark = tiles.sparkSession
    rows = [(0, i, float(x), float(y)) for i, (x, y) in enumerate(line_vertices)]
    line = spark.createDataFrame(rows, "geom_id long, idx long, x double, y double")
    pts = to_points(line, spacing).select("sample_idx", "x", "y")
    return sample_join(pts, tiles, transform, method=method).orderBy("sample_idx")


def resample(
    tiles: DataFrame, transform, shape: tuple, dx: float, dy: float,
    method: str = "nearest", tile: int = DEFAULT_TILE,
):
    """Resample a grid to spacing (dx, dy), origin preserved at cell edge —
    reference grid.py:724-760: new transform
    ``(xmin-0.5dx-0.5sx, ymin-0.5dy-0.5sy, dx, dy, sx, sy)`` and every
    target cell routed through the sampling join.

    Returns (sampled point DataFrame with target (ti, tj, x, y, value),
    new_transform, (new_ny, new_nx)).  Target-pixel generation is
    distributed (spark.range cross), not driver-side.
    """
    x0, y0, dxo, dyo, sx, sy = (float(v) for v in transform)
    gny, gnx = shape
    # extent('center') of the source grid (reference grid.py:342-387):
    # from the center LL reference, stepping (n-1) cells with sign-matched
    # skew accumulation
    xc = x0 + 0.5 * (dxo + sx)
    yc = y0 + 0.5 * (dyo + sy)
    sgn = lambda a: 0 if a == 0 else a / abs(a)  # noqa: E731
    if sgn(dxo) == sgn(sx):
        x1 = xc + dxo * (gnx - 1) + sx * (gny - 1)
    else:
        x1 = xc + dxo * (gnx - 1) - sx * (gny - 1)
    if sgn(dyo) == sgn(sy):
        y1 = yc + dyo * (gny - 1) + sy * (gnx - 1)
    else:
        y1 = yc + dyo * (gny - 1) - sy * (gnx - 1)
    xmin, xmax = min(xc, x1), max(xc, x1)
    ymin, ymax = min(yc, y1), max(yc, y1)
    ny = int((ymax - ymin) // dy) + 1
    nx = int((xmax - xmin) // dx) + 1
    tnew = (xmin - 0.5 * dx - 0.5 * sx, ymin - 0.5 * dy - 0.5 * sy, dx, dy, sx, sy)

    spark = tiles.sparkSession
    targets = (
        spark.range(ny).withColumnRenamed("id", "ti")
        .crossJoin(spark.range(nx).withColumnRenamed("id", "tj"))
        .select(
            F.col("ti").cast("int"), F.col("tj").cast("int"),
            (tnew[0] + (F.col("tj") + 0.5) * dx + (F.col("ti") + 0.5) * sx).alias("x"),
            (tnew[1] + (F.col("ti") + 0.5) * dy + (F.col("tj") + 0.5) * sy).alias("y"),
        )
    )
    sampled = sample_join(targets, tiles, transform, method=method, tile=tile)
    return sampled, tnew, (ny, nx)


def resample_transform(
    tiles: DataFrame, transform, shape: tuple, t_new,
    method: str = "nearest", tile: int = DEFAULT_TILE,
):
    """Resample the grid onto a NEW transform of the same shape (reference
    grid.py:670-694 _resample_transform): every target pixel center of
    *t_new* sampled from the source lattice through the distributed
    sampling join."""
    gny, gnx = shape
    t_new = tuple(float(v) for v in t_new)
    spark = tiles.sparkSession
    targets = (
        spark.range(gny).withColumnRenamed("id", "ti")
        .crossJoin(spark.range(gnx).withColumnRenamed("id", "tj"))
        .select(
            F.col("ti").cast("int"), F.col("tj").cast("int"),
            (t_new[0] + (F.col("tj") + 0.5) * t_new[2]
             + (F.col("ti") + 0.5) * t_new[4]).alias("x"),
            (t_new[1] + (F.col("ti") + 0.5) * t_new[3]
             + (F.col("tj") + 0.5) * t_new[5]).alias("y"),
        )
    )
    sampled = sample_join(targets, tiles, transform, method=method, tile=tile)
    return sampled, t_new, (gny, gnx)


def align_origin(
    tiles: DataFrame, transform, shape: tuple, x: float, y: float,
    method: str = "nearest", tile: int = DEFAULT_TILE,
):
    """Snap the transform anchor to an integer multiple of (x, y) and
    resample onto it (reference grid.py:696-722 _align_origin; python
    banker's round, as the reference uses)."""
    t = tuple(float(v) for v in transform)
    t_new = (x * round(t[0] / x), y * round(t[1] / y), t[2], t[3], t[4], t[5])
    return resample_transform(tiles, transform, shape, t_new,
                              method=method, tile=tile)
