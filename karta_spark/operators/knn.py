"""Nearest-vertex / kNN joins.

Reference semantics: ``nearest_vertex_to`` (geometry.py:576-591) is an exact
argmin over per-vertex distances with lowest-index tie-break (np.argmin).

Distributed plan (SURVEY §2.3): candidates from a cell-ring join (the
expanding-ring analogue of a quadtree descent), then
``Window.partitionBy(query).orderBy(dist, idx)`` top-k.  The ring join is
verified: a query's k-th neighbor distance must not exceed the guaranteed
covered radius of the ring, otherwise the ring is widened and the stragglers
re-run — so results are exact, not approximate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from karta_spark.functions import cells
from karta_spark.functions.geodesy import plane_distance, sphere_distance


def _sphere_dist_np(lon1, lat1, lon2, lat2, radius: float = 6370997.0):
    """numpy twin of geodesy.sphere_distance (two-branch rule,
    geodesy.py:96-108) — identical op sequence for float parity."""
    import numpy as np
    rlon1, rlat1 = np.radians(lon1), np.radians(lat1)
    rlon2, rlat2 = np.radians(lon2), np.radians(lat2)
    dx = np.abs(rlon1 - rlon2)
    dy = np.abs(rlat1 - rlat2)
    loc = np.arccos(np.clip(
        np.sin(rlat1) * np.sin(rlat2)
        + np.cos(rlat1) * np.cos(rlat2) * np.cos(dx), -1.0, 1.0))
    hav = 2.0 * np.arcsin(np.sqrt(
        np.sin(dy / 2) ** 2
        + np.cos(rlat1) * np.cos(rlat2) * np.sin(dx / 2) ** 2))
    return np.where((dx > 0.01) | (dy > 0.01), loc, hav) * radius


def _dist(qx, qy, px, py, spherical: bool):
    return sphere_distance(qx, qy, px, py) if spherical else plane_distance(qx, qy, px, py)


def knn_bruteforce(
    queries: DataFrame, points: DataFrame, k: int,
    query_id: str = "query_id", point_id: str = "point_id",
    qx: str = "qx", qy: str = "qy", px: str = "x", py: str = "y",
    spherical: bool = False,
) -> DataFrame:
    """Exact kNN by broadcast cross join + window top-k.  Correct at any
    scale of the *query* side when the point side is broadcast-small, or
    vice versa; the cell-ring variant below is the big-big path."""
    d = _dist(F.col(qx), F.col(qy), F.col(px), F.col(py), spherical)
    joined = queries.crossJoin(points).withColumn("dist", d)
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, point_id, "dist", "rank")
    )


def neighbor_cells(cell: F.Column, ring: int, zoom: int) -> F.Column:
    """Array of packed cell ids within Chebyshev distance *ring* of *cell*.

    Pure Catalyst (transform over a literal offset array) — no UDF."""
    z, x, y = cells.unpack_tile_id(cell)
    n = 2 ** zoom
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    cols = []
    for dx, dy in offsets:
        nx = (x + dx + n) % n  # wrap longitude
        ny = F.greatest(F.lit(0), F.least(F.lit(n - 1), y + dy))
        cols.append(z * (1 << 58) + nx * (1 << 29) + ny)
    return F.array_distinct(F.array(*cols))


def _covered_radius(qx_col, qy_col, ring: int, zoom: int, spherical: bool):
    """Lower bound on the distance from a query to any point OUTSIDE its
    ring-of-tiles cover — the exactness guarantee for the ring join.

    Mercator tile rows shrink (in latitude degrees) toward the poles, so a
    naive ``ring * lon_span`` overestimates poleward coverage (a zoom-3
    query at 66N covers ~13 deg north, not 45).  Instead we compute the
    true covered bbox from the ring's extreme tile rows/columns and take
    the min distance from the query to its four edges:

    - lon edges are exact (tiles are equal-angle in longitude);
    - lat edges use the inverse-Mercator latitude of the extreme row edge;
    - a direction clamped at the tile-grid pole edge is fully covered
      (no tiles — hence no points keyed there — exist beyond it);
    - spherical metric: meridian-plane distance R*asin(|sin dlon|*cos lat)
      lower-bounds distance past a lon edge; R*dlat is exact past a lat
      edge.  Every term lower-bounds the true distance to the uncovered
      region, so the guarantee never over-claims.
    """
    n = 2 ** zoom
    inf = F.lit(1e18)
    tx = cells.tile_x(qx_col, zoom)
    ty = cells.tile_y(qy_col, zoom)

    def row_edge_lat(y_row):
        # latitude of the TOP edge of tile row y_row (inverse web-mercator)
        return F.degrees(F.atan(F.sinh(
            math.pi * (1.0 - 2.0 * y_row.cast("double") / float(n)))))

    if 2 * ring + 1 >= n:
        d_w = inf
        d_e = inf
    else:
        lon_w = (tx - ring).cast("double") / float(n) * 360.0 - 180.0
        lon_e = (tx + ring + 1).cast("double") / float(n) * 360.0 - 180.0
        d_w = qx_col - lon_w   # westward angular gap, degrees (>= 0)
        d_e = lon_e - qx_col
    top = ty - ring
    bot = ty + ring
    d_n = F.when(top <= 0, inf).otherwise(row_edge_lat(top) - qy_col)
    d_s = F.when(bot >= n - 1, inf).otherwise(qy_col - row_edge_lat(bot + 1))

    if not spherical:
        return F.least(d_w, d_e, d_n, d_s)
    R = 6370997.0
    coslat = F.cos(F.radians(qy_col))

    def lon_term(d):
        s = F.least(F.abs(F.sin(F.radians(F.least(d, F.lit(1e3))))) * coslat,
                    F.lit(1.0))
        return F.when(d >= 1e17, F.lit(1e18)).otherwise(R * F.asin(s))

    def lat_term(d):
        return F.when(d >= 1e17, F.lit(1e18)).otherwise(R * F.radians(d))

    return F.least(lon_term(d_w), lon_term(d_e), lat_term(d_n), lat_term(d_s))


def auto_zoom(n_points: int, k: int, per_tile_factor: float = 128.0,
              lo: int = 1, hi: int = 12) -> int:
    """Density-derived tile zoom for the kNN ring join: choose z so the
    3x3 ring-1 cover holds ~per_tile_factor*k points on average
    (9 * n/4^z ~ f*k).  A fixed zoom is wrong at BOTH extremes: sparse
    tiles fail the DISTANCE guarantee (widening rounds + brute-force
    fallback — measured 6.8 s at sf0.001 where the auto choice takes
    1.2 s), over-fine tiles fail it too because Mercator rows shrink
    poleward (z6 at sf0.1 measured 4x slower than z4).  The generous
    factor (128) keeps ring-1 well above the expected k-NN distance at
    every populated latitude; candidate windows stay small because the
    window is per-query, not per-tile."""
    import math as _m
    if n_points <= 0:
        return lo
    z = int(_m.log(max(9.0 * n_points / (per_tile_factor * k), 1.0), 4.0))
    return max(lo, min(hi, z))


def knn_broadcast_kernel(
    queries: DataFrame, points: DataFrame, k: int,
    query_id: str = "query_id", point_id: str = "point_id",
    qx: str = "qx", qy: str = "qy", px: str = "x", py: str = "y",
    spherical: bool = False,
) -> DataFrame:
    """Exact kNN for a BROADCAST-SMALL point side: the points collect to
    the driver (bounded — the caller gates on count), ship in the UDF
    closure, and each Arrow batch of queries evaluates all distances as
    one numpy matrix + argpartition top-k.  No join, no window shuffle —
    one narrow pass over the query side, so the query side can be any
    size.  The small-side twin of the cell-ring join (same role the
    broadcast arm plays for point_in_polygon_join).

    Float parity: the planar kernel evaluates sqrt(dx*dx + dy*dy) —
    pure arithmetic, BIT-identical to the Catalyst expression (pinned by
    test).  The spherical kernel replicates sphere_distance's two-branch
    rule with the same op sequence, but numpy's libm trig can differ
    from the JVM's in the last ulp — ranks agree except on exact
    near-ties; knn_join therefore auto-dispatches here only for planar.

    Planar search: instead of a Q x N distance matrix, the points ship
    SORTED BY X and each query scans only the vertical strip
    |px - qx| <= r (two searchsorted calls), widening r until at least k
    in-disk candidates exist.  Exactness: a point outside the strip has
    |dx| > r, hence dist > r; once >= k candidates satisfy dist <= r, the
    k-th distance is <= r, so every point at or under it — including the
    whole tie group at the boundary — is inside the strip and the mask.
    The strip bounds are widened one ulp (nextafter) so the subtraction's
    rounding can never exclude a point at exactly dist == r.  Per-query
    cost is O(local density), not O(N): a 150k-point side drops from a
    1.5e9-cell matrix to ~1k distance evals per query."""
    import numpy as np
    import pandas as pd

    # Arrow-path collection: toPandas moves the three columns as columnar
    # batches instead of per-row java objects (guide §6 "Arrow for driver
    # transfers") — at the 10^6-point end of the dispatch range the row
    # path is the slow part of the whole operator.
    pdf = points.select(point_id, px, py).toPandas()
    pids = pdf[point_id].to_numpy()
    pxs = pdf[px].to_numpy(dtype=np.float64)
    pys = pdf[py].to_numpy(dtype=np.float64)
    if spherical:
        order0 = np.argsort(pids, kind="stable")  # pre-sort for tie-breaks
    else:
        order0 = np.argsort(pxs, kind="stable")   # strip search order
    pids, pxs, pys = pids[order0], pxs[order0], pys[order0]
    n_p = len(pids)
    kk = min(k, n_p)
    # initial strip half-width from global density: the expected k-NN
    # disk radius (area * (k+1) / (pi * n)) doubled, so one widening
    # round is rare on roughly uniform data; any mis-estimate only costs
    # extra rounds, never exactness
    if n_p > 1:
        xspan = float(pxs[-1] - pxs[0]) if not spherical else \
            float(pxs.max() - pxs.min())
        yspan = float(pys.max() - pys.min())
        area = xspan * yspan
        if area > 0.0:
            r0 = 2.0 * math.sqrt(area * (kk + 1) / (math.pi * n_p))
        else:
            # collinear/identical point cloud: a density-derived radius
            # is meaningless and a near-zero start would need hundreds
            # of doubling rounds — start at the data extent instead
            r0 = max(xspan, yspan, 1.0)
    else:
        r0 = 1.0
    # torrent-broadcast the arrays once per executor instead of shipping
    # them in every task's pickled closure (guide §4.5)
    bc = points.sparkSession.sparkContext.broadcast((pids, pxs, pys))
    # Query-side spreading is conditional on the POINT count: per-query
    # strip cost grows ~sqrt(n_p) (strip width shrinks as 1/sqrt(n_p)
    # while density grows as n_p), so below ~250k points even a
    # single-partition query file finishes faster than one exchange plus
    # a wave of python-worker tasks (measured at 150k pts: 0.98 s as-is
    # vs 1.17 s at 32 / 1.50 s at 64 partitions), while above it the
    # exchange pays for itself (measured at 1.5M pts x 100k single-
    # partition queries: 4.79 s -> 1.43 s).
    if n_p > 250_000:
        from karta_spark.plans.layout import ensure_min_parallelism
        queries = ensure_min_parallelism(queries, factor=2)
    # chunk the query batch so the spherical distance matrix stays ~32 MB
    rows_per_chunk = max(1, 4_000_000 // max(n_p, 1))

    q_field = queries.schema[query_id]
    p_field = points.schema[point_id]
    schema = StructType([q_field, p_field,
                         StructField("dist", DoubleType()),
                         StructField("rank", IntegerType())])

    def run_planar(batches):
        spid, sx, sy = bc.value  # once per task, from the executor cache
        ninf, pinf = -np.inf, np.inf
        for pdf in batches:
            qxa = pdf[qx].to_numpy(dtype=np.float64)
            qya = pdf[qy].to_numpy(dtype=np.float64)
            qida = pdf[query_id].to_numpy()
            out_q, out_p, out_d, out_r = [], [], [], []
            if kk > 0:
                # round-0 strip bounds for the WHOLE batch in two
                # searchsorted calls — the per-query pair re-runs only on
                # the rare widening rounds (r8: two numpy calls per query
                # were ~25% of the kernel's single-task wall time)
                los = np.searchsorted(
                    sx, np.nextafter(qxa - r0, ninf), side="left")
                his = np.searchsorted(
                    sx, np.nextafter(qxa + r0, pinf), side="right")
                for i in range(len(qxa)):
                    qxv, qyv = qxa[i], qya[i]
                    r = r0
                    lo, hi = int(los[i]), int(his[i])
                    while True:
                        full = lo == 0 and hi == n_p
                        if hi - lo >= kk or full:
                            dxs = sx[lo:hi] - qxv
                            dys = sy[lo:hi] - qyv
                            d = np.sqrt(dxs * dxs + dys * dys)
                            if full:
                                cd, cpid = d, spid[lo:hi]
                                break
                            mask = d <= r
                            if int(np.count_nonzero(mask)) >= kk:
                                cd, cpid = d[mask], spid[lo:hi][mask]
                                break
                        r *= 2.0
                        lo = int(np.searchsorted(
                            sx, np.nextafter(qxv - r, ninf), side="left"))
                        hi = int(np.searchsorted(
                            sx, np.nextafter(qxv + r, pinf), side="right"))
                    # prune to the k-th-distance boundary (whole tie group
                    # included: every element == kth stays) before the
                    # exact (dist asc, point_id asc) row_number tie-break —
                    # a full lexsort of the ~1k-candidate strip was the
                    # other ~30% of the kernel time
                    if cd.size > max(kk, 64):
                        kth = np.partition(cd, kk - 1)[kk - 1]
                        keep = cd <= kth
                        cd, cpid = cd[keep], cpid[keep]
                    order = np.lexsort((cpid, cd))[:kk]
                    out_q.extend([qida[i]] * kk)
                    out_p.extend(cpid[order].tolist())
                    out_d.extend(cd[order].tolist())
                    out_r.extend(range(1, kk + 1))
            yield pd.DataFrame({query_id: out_q, point_id: out_p,
                                "dist": out_d, "rank": out_r})

    def run_spherical(batches):
        pids, pxs, pys = bc.value  # once per task, from the executor cache
        for pdf in batches:
            qxa = pdf[qx].to_numpy(dtype=np.float64)
            qya = pdf[qy].to_numpy(dtype=np.float64)
            qida = pdf[query_id].to_numpy()
            out_q, out_p, out_d, out_r = [], [], [], []
            for s0 in range(0, len(qxa), rows_per_chunk):
                cqx = qxa[s0:s0 + rows_per_chunk, None]
                cqy = qya[s0:s0 + rows_per_chunk, None]
                d = _sphere_dist_np(cqx, cqy, pxs[None, :], pys[None, :])
                if kk < n_p:
                    # partition ONE extra element so each row can detect a
                    # tie group straddling the k-th rank (argpartition's
                    # pick inside a tied group is arbitrary)
                    part = np.argpartition(d, kk, axis=1)[:, :kk + 1]
                else:
                    part = np.broadcast_to(np.arange(n_p), (d.shape[0], n_p))
                for r in range(d.shape[0]):
                    # (dist asc, point_id asc): indices follow pid order
                    # (arrays pre-sorted by pid), so sorting the selected
                    # indices then a STABLE sort on distance yields the
                    # exact row_number() tie-break of the ring path
                    sel = np.sort(part[r])
                    dsel = d[r, sel]
                    order = np.argsort(dsel, kind="stable")
                    if kk < n_p and dsel[order[kk]] == dsel[order[kk - 1]]:
                        # the (k+1)-th smallest equals the k-th: points
                        # outside the partition may tie the boundary, and
                        # which tied members argpartition kept is
                        # arbitrary — widen to EVERY point at or under
                        # the boundary distance so (dist, pid) order
                        # decides, matching the ring path's row_number
                        sel = np.nonzero(d[r] <= dsel[order[kk - 1]])[0]
                        order = np.argsort(d[r, sel], kind="stable")
                    o = sel[order][:kk]
                    out_q.extend([qida[s0 + r]] * kk)
                    out_p.extend(pids[o].tolist())
                    out_d.extend(d[r, o].tolist())
                    out_r.extend(range(1, kk + 1))
            yield pd.DataFrame({query_id: out_q, point_id: out_p,
                                "dist": out_d, "rank": out_r})

    return queries.mapInPandas(run_spherical if spherical else run_planar,
                               schema)


def knn_join(
    queries: DataFrame, points: DataFrame, k: int, zoom: int | None = 6, ring: int = 1,
    query_id: str = "query_id", point_id: str = "point_id",
    qx: str = "qx", qy: str = "qy", px: str = "x", py: str = "y",
    spherical: bool = False, max_widen: int = 3,
    small_points_threshold: int = 2_000_000,
) -> DataFrame:
    """Exact distributed kNN: cell-ring candidate join + top-k window +
    guarantee check with iterative widening for unsatisfied queries.
    ``zoom=None`` derives the tile zoom from the point count (auto_zoom).

    The guarantee: if the k-th candidate distance <= the ring cover's true
    covered radius (min distance from the query to the cover's bbox edges,
    Mercator row shrink accounted for — see _covered_radius), no closer
    point can live outside the ring.  Queries failing the guarantee (or
    with < k candidates) re-run with a doubled ring; after ``max_widen``
    rounds the remainder falls back to brute force (rare: empty regions).

    ``zoom=None`` also enables the small-side dispatch: when the point
    count (already needed for auto_zoom) is at most
    ``small_points_threshold``, the whole ring machinery — its multiple
    actions, persists and shuffles — costs more than the problem, and the
    broadcast numpy kernel (knn_broadcast_kernel: one narrow pass over
    queries, no join, no window) answers exactly; the query side may be
    any size either way.  Same dispatch philosophy as the PIP join's
    small_table_threshold.

    Threshold sizing: 2x10^6 points is three ~16 MB broadcast arrays
    (the order of spark.sql.autoBroadcastJoinThreshold) and tens of
    microseconds of strip-search per query — measured 33x cheaper than
    the ring join at 1.5M points x 100k queries (1.4 s vs 47 s: the
    ring's candidate set at the density-derived zoom carries ~800
    candidates per query through a window sort).  For a huge query side
    over a mid-sized point table, pass an explicit ``zoom`` to force
    the ring plan instead."""
    if zoom is None:
        n_points = points.count()
        # planar only: the planar kernel is pure arithmetic and therefore
        # BIT-identical to the Catalyst expression; the spherical kernel's
        # trig can drift a last ulp from the JVM's (Math.sin vs libm), so
        # the spherical route keeps the ring plan (call the kernel
        # explicitly if ulp-level drift is acceptable)
        if n_points <= small_points_threshold and not spherical:
            return knn_broadcast_kernel(queries, points, k, query_id,
                                        point_id, qx, qy, px, py, spherical)
        zoom = auto_zoom(n_points, k)
    from karta_spark.plans.layout import ensure_min_parallelism

    # The candidate join broadcasts the (exploded) query side and probes
    # the POINT side, so the join output inherits the point scan's
    # partitioning; an unsplittable point file would serialize the
    # downstream map-side sort + WindowGroupLimit of the whole candidate
    # set into one task (measured 28 s for an 18.6M-row candidate set at
    # one partition vs ~2 s spread).  No-op when points are already
    # parallel, i.e. at any production scale.
    points = ensure_min_parallelism(points)
    pts = points.withColumn("_cell", cells.tile_id_clamped(px, py, zoom))
    remaining = queries
    results = []
    to_unpersist = []
    cur_ring = ring
    # one cheap count up front lets every round decide "all satisfied?"
    # from ok_ids.count() alone — the common single-round case then skips
    # the remaining-side anti-join materialization entirely
    n_remaining = remaining.count()
    for _ in range(max_widen):
        if n_remaining == 0:
            break
        q = remaining.withColumn("_cell", cells.tile_id_clamped(qx, qy, zoom))
        q = q.withColumn("_probe", F.explode(neighbor_cells(F.col("_cell"), cur_ring, zoom)))
        cand = q.join(pts.withColumnRenamed("_cell", "_probe"), "_probe")
        d = _dist(F.col(qx), F.col(qy), F.col(px), F.col(py), spherical)
        cand = cand.withColumn("dist", d)
        w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
        # persist: topk feeds both the guarantee check and the result set,
        # and `remaining` would otherwise re-run the whole previous round
        topk = (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k).persist())
        to_unpersist.append(topk)

        guarantee = _covered_radius(F.col(qx), F.col(qy), cur_ring, zoom, spherical)
        stats = topk.groupBy(query_id).agg(
            F.count("*").alias("_n"), F.max("dist").alias("_maxd"),
            F.first(qx).alias(qx), F.first(qy).alias(qy),
        )
        ok_ids = stats.where((F.col("_n") >= k) & (F.col("_maxd") <= guarantee)) \
                      .select(query_id).persist()
        to_unpersist.append(ok_ids)
        n_ok = ok_ids.count()  # materializes topk; ok_ids is tiny
        results.append(topk.join(ok_ids, query_id, "left_semi")
                       .select(query_id, point_id, "dist", "rank"))
        n_remaining -= n_ok
        if n_remaining > 0:
            remaining = remaining.join(ok_ids, query_id, "left_anti").persist()
            to_unpersist.append(remaining)
        cur_ring *= 2

    if n_remaining == 0:
        if not results:
            # empty queries input: the loop never ran — return an empty
            # result with the contract schema (query_id, point_id, dist, rank)
            out = (queries.limit(0)
                   .join(points.limit(0), F.lit(True))
                   .select(F.col(query_id), F.col(point_id),
                           F.lit(0.0).cast("double").alias("dist"),
                           F.lit(0).alias("rank")))
        else:
            # every query satisfied its guarantee — skip the brute-force plan
            out = results[0]
            for r in results[1:]:
                out = out.unionByName(r)
    else:
        out = knn_bruteforce(remaining, points, k, query_id, point_id,
                             qx, qy, px, py, spherical)
        for r in results:
            out = out.unionByName(r)
    # materialize the final result, then release every intermediate cache —
    # otherwise the loop's persisted blocks outlive the operator and tax
    # later queries in the same session
    out = out.persist()
    out.count()
    for df in to_unpersist:
        df.unpersist()
    return out


def nearest_vertex(
    points: DataFrame, qx: float, qy: float, qz: float | None = None,
    point_id: str = "point_id", px: str = "x", py: str = "y", pz: str | None = None,
    spherical: bool = False,
) -> DataFrame:
    """argmin of distances to a literal query point, lowest index wins ties
    (geometry.py:576-591 np.argmin semantics). When both sides carry z, the
    vertical term is folded in as sqrt(d^2 + dz^2) (geometry.py:311-314)."""
    d = _dist(F.lit(float(qx)), F.lit(float(qy)), F.col(px), F.col(py), spherical)
    if qz is not None and pz is not None:
        dz = F.col(pz) - F.lit(float(qz))
        d = F.sqrt(d * d + dz * dz)
    # orderBy + limit compiles to TakeOrderedAndProject — a distributed
    # per-partition top-1 + tiny driver merge, never a single-task global
    # sort (the Window.orderBy form shuffled the whole table to one task)
    return (
        points.withColumn("dist", d)
        .orderBy(F.col("dist").asc(), F.col(point_id).asc())
        .limit(1)
    )
