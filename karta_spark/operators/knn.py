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

from karta_spark.functions import cells
from karta_spark.functions.geodesy import plane_distance, sphere_distance


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


def knn_join(
    queries: DataFrame, points: DataFrame, k: int, zoom: int = 6, ring: int = 1,
    query_id: str = "query_id", point_id: str = "point_id",
    qx: str = "qx", qy: str = "qy", px: str = "x", py: str = "y",
    spherical: bool = False, max_widen: int = 3,
) -> DataFrame:
    """Exact distributed kNN: cell-ring candidate join + top-k window +
    guarantee check with iterative widening for unsatisfied queries.

    The guarantee: if the k-th candidate distance < (ring) whole tile spans
    at the query's latitude row, no closer point can live outside the ring.
    Queries failing the guarantee (or with < k candidates) re-run with a
    doubled ring; after ``max_widen`` rounds the remainder falls back to
    brute force (rare: empty regions)."""
    pts = points.withColumn("_cell", cells.tile_id(F.col(px), F.col(py), zoom))
    remaining = queries
    results = []
    to_unpersist = []
    cur_ring = ring
    n_remaining = None  # unknown before the first materialization
    for _ in range(max_widen):
        if n_remaining == 0:
            break
        q = remaining.withColumn("_cell", cells.tile_id(F.col(qx), F.col(qy), zoom))
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

        # guarantee radius: ring * (tile span at the query latitude), in the
        # same metric as dist
        span_deg = 360.0 / (2 ** zoom)
        if spherical:
            guarantee = (
                F.lit(float(cur_ring)) * F.radians(F.lit(span_deg))
                * F.cos(F.radians(F.col(qy))) * 6370997.0
            )
        else:
            guarantee = F.lit(float(cur_ring) * span_deg)
        stats = topk.groupBy(query_id).agg(
            F.count("*").alias("_n"), F.max("dist").alias("_maxd"),
            F.first(qx).alias(qx), F.first(qy).alias(qy),
        )
        ok_ids = stats.where((F.col("_n") >= k) & (F.col("_maxd") <= guarantee)).select(query_id)
        results.append(topk.join(ok_ids, query_id, "left_semi")
                       .select(query_id, point_id, "dist", "rank"))
        remaining = remaining.join(ok_ids, query_id, "left_anti").persist()
        to_unpersist.append(remaining)
        n_remaining = remaining.count()
        cur_ring *= 2

    fallback = knn_bruteforce(remaining, points, k, query_id, point_id,
                              qx, qy, px, py, spherical)
    out = fallback
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
    w = Window.orderBy(F.col("dist").asc(), F.col(point_id).asc())
    return (
        points.withColumn("dist", d)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") == 1)
        .drop("rank")
    )
