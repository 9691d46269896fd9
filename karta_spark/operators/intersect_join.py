"""touching / within joins for line & polygon member tables.

Reference semantics (geometry.py:1496-1544):
- members vs Line target:    bbox-overlap AND boundaries intersect
- members vs Polygon target: bbox-overlap AND (target contains member's
  FIRST vertex OR boundaries intersect)                       [= touching]
- within (Polygon target):   bbox-overlap AND contains(first vertex)
  AND NOT boundaries intersect

Member tables carry geometry arrays: (geom_id, vertices array<struct<x,y>>,
closed boolean).  The R-tree becomes a bbox prefilter (min-max prunable when
sorted by cell) and the refine is the vectorized brute segment-pair kernel —
brute beats a sweep under numpy for cell-join candidate sizes (SURVEY §2.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from karta_spark.operators.pip_join import PolygonSpec
from karta_spark.functions.kernels import (
    polyline_pairs_intersect,
    polylines_intersect_target,
)


def _xy_cols(vertices: str):
    """JVM-side struct->array extraction: the Arrow pipe then ships plain
    list<double> columns (cheaper than list<struct> and the kernels get
    float arrays instead of per-vertex dicts)."""
    return (F.transform(vertices, lambda v: v.x),
            F.transform(vertices, lambda v: v.y))


def with_member_bbox(df: DataFrame, vertices: str = "vertices") -> DataFrame:
    """Materialize per-member bbox columns from a geometry array — the
    distributed stand-in for R-tree node bboxes (rtree.pyx:39-65)."""
    xs, ys = _xy_cols(vertices)
    return (
        df.withColumn("xmin", F.array_min(xs)).withColumn("xmax", F.array_max(xs))
        .withColumn("ymin", F.array_min(ys)).withColumn("ymax", F.array_max(ys))
    )


def _bbox_gate(target_bbox: tuple):
    xmin, ymin, xmax, ymax = target_bbox
    return (
        (F.col("xmin") <= xmax) & (F.lit(xmin) <= F.col("xmax"))
        & (F.col("ymin") <= ymax) & (F.lit(ymin) <= F.col("ymax"))
    )


def _target_arrays(target_vertices, target_closed: bool):
    tv = np.asarray(target_vertices, dtype=np.float64)
    return tv, target_closed


def _intersects_udf(target_vertices, target_closed: bool, members_closed: bool):
    tv, tc = _target_arrays(target_vertices, target_closed)

    @F.pandas_udf(BooleanType())
    def udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        # one flattened segments-vs-target pass for the whole batch
        return pd.Series(polylines_intersect_target(
            list(xs), list(ys), members_closed, tv, tc))

    return udf


def touching(
    members: DataFrame, target_vertices, target_is_polygon: bool,
    members_closed: bool = False, vertices: str = "vertices",
) -> DataFrame:
    """Members touching a Line/Polygon target (geometry.py:1496-1525)."""
    tv = np.asarray(target_vertices, dtype=np.float64)
    bb = (tv[:, 0].min(), tv[:, 1].min(), tv[:, 0].max(), tv[:, 1].max())
    cand = with_member_bbox(members, vertices).where(_bbox_gate(bb))
    inter = _intersects_udf(tv, target_is_polygon, members_closed)
    xs, ys = _xy_cols(vertices)
    if target_is_polygon:
        spec = PolygonSpec("t", tv)

        @F.pandas_udf(BooleanType())
        def first_vertex_inside(fx: pd.Series, fy: pd.Series) -> pd.Series:
            return pd.Series(spec.contains(
                fx.to_numpy(dtype=np.float64), fy.to_numpy(dtype=np.float64)))

        cond = (first_vertex_inside(F.element_at(xs, 1), F.element_at(ys, 1))
                | inter(xs, ys))
    else:
        cond = inter(xs, ys)
    return cand.where(cond).drop("xmin", "xmax", "ymin", "ymax")


def within(
    members: DataFrame, target_vertices,
    members_closed: bool = False, vertices: str = "vertices",
) -> DataFrame:
    """Members strictly inside a Polygon target: first vertex contained and
    boundary not crossed (geometry.py:1527-1544)."""
    tv = np.asarray(target_vertices, dtype=np.float64)
    bb = (tv[:, 0].min(), tv[:, 1].min(), tv[:, 0].max(), tv[:, 1].max())
    cand = with_member_bbox(members, vertices).where(_bbox_gate(bb))
    spec = PolygonSpec("t", tv)
    inter = _intersects_udf(tv, True, members_closed)
    xs, ys = _xy_cols(vertices)

    @F.pandas_udf(BooleanType())
    def first_vertex_inside(fx: pd.Series, fy: pd.Series) -> pd.Series:
        return pd.Series(spec.contains(
            fx.to_numpy(dtype=np.float64), fy.to_numpy(dtype=np.float64)))

    return cand.where(first_vertex_inside(F.element_at(xs, 1), F.element_at(ys, 1))
                      & ~inter(xs, ys)) \
               .drop("xmin", "xmax", "ymin", "ymax")


def line_intersection_join(
    left: DataFrame, right: DataFrame, zoom: int = 7,
    vertices: str = "vertices", left_closed: bool = False,
    right_closed: bool = False, salt_threshold: int = 0,
) -> DataFrame:
    """Big-big pairwise intersects join between two line/ring tables.

    Neither side broadcasts: each member explodes to the slippy cells its
    bbox covers; the equi-join on cell_id generates candidate pairs
    (deduped — a pair can share several cells); the vectorized brute
    segment kernel refines.  ``salt_threshold`` > 0 additionally salts hot
    cells on the left side (operators.skew pattern) for skewed corpora.

    Returns (geom_id, geom_id_r) pairs that intersect.
    """
    from karta_spark.functions import cells as _cells

    def with_cover(df, suffix):
        bb = with_member_bbox(df, vertices)
        # cell range of the bbox at *zoom* — pure column exprs
        x0 = _cells.tile_x(F.col("xmin"), zoom)
        x1 = _cells.tile_x(F.col("xmax"), zoom)
        # slippy y grows southward: ymax -> smaller ty
        y0 = _cells.tile_y(F.col("ymax"), zoom)
        y1 = _cells.tile_y(F.col("ymin"), zoom)
        cover = F.flatten(F.transform(
            F.sequence(x0, x1),
            lambda tx: F.transform(F.sequence(y0, y1),
                                   lambda ty: F.lit(zoom).cast("long") * (1 << 58)
                                   + tx * (1 << 29) + ty)))
        return bb.select(
            F.col("geom_id").alias("geom_id" + suffix),
            F.col(vertices).alias(vertices + suffix),
            F.explode(cover).alias("cell_id"),
        )

    lc = with_cover(left, "")
    rc = with_cover(right, "_r")
    if salt_threshold > 0:
        from karta_spark.operators.skew import salted_join
        cand = salted_join(lc, rc, threshold=salt_threshold, broadcast_small=False)
    else:
        cand = lc.join(rc, "cell_id")
    cand = cand.dropDuplicates(["geom_id", "geom_id_r"])

    @F.pandas_udf(BooleanType())
    def refine(ax: pd.Series, ay: pd.Series, bx: pd.Series, by: pd.Series) -> pd.Series:
        # flat per-pair segment cross-products, one chunked kernel call
        return pd.Series(polyline_pairs_intersect(
            list(ax), list(ay), list(bx), list(by),
            a_closed=left_closed, b_closed=right_closed))

    lx, ly = _xy_cols(vertices)
    rx, ry = _xy_cols(vertices + "_r")
    return (
        cand.where(refine(lx, ly, rx, ry))
        .select("geom_id", "geom_id_r")
    )


def intersection_points(
    members: DataFrame, target_vertices, target_closed: bool = False,
    members_closed: bool = False, vertices: str = "vertices",
    keep_duplicates: bool = False,
) -> DataFrame:
    """All segment-intersection points between each member and the target
    — ``Geometry.intersections`` (geometry.py:698-723): brute all-pairs over
    bbox-gated candidates, optional dedup (reference dedups via set()).

    Returns (geom_id, ix, iy)."""
    from karta_spark.functions.kernels import polylines_intersection_points_target

    tv = np.asarray(target_vertices, dtype=np.float64)
    bb = (tv[:, 0].min(), tv[:, 1].min(), tv[:, 0].max(), tv[:, 1].max())
    cand = with_member_bbox(members, vertices).where(_bbox_gate(bb))

    out_schema = "geom_id long, ix double, iy double"
    xs, ys = _xy_cols(vertices)

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            owner, px, py = polylines_intersection_points_target(
                list(pdf["_xs"]), list(pdf["_ys"]), members_closed,
                tv, target_closed)
            yield pd.DataFrame(
                {"geom_id": pdf["geom_id"].to_numpy()[owner],
                 "ix": px, "iy": py})

    out = (cand.select("geom_id", xs.alias("_xs"), ys.alias("_ys"))
           .mapInPandas(kernel, out_schema))
    if not keep_duplicates:
        out = out.dropDuplicates(["geom_id", "ix", "iy"])
    return out


def within_distance_join(
    members: DataFrame, qx: float, qy: float, d: float,
    vertices: str = "vertices",
) -> DataFrame:
    """Members with any segment within distance *d* of the query point
    (``within_distance``, geometry.py:794-807)."""
    from karta_spark.functions.geometry import point_segment_distance, segments
    from karta_spark.functions.geometry import explode_vertices

    vx = explode_vertices(members, vertices)
    seg = segments(vx)
    dist = point_segment_distance(
        F.lit(float(qx)), F.lit(float(qy)),
        F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
    hit = seg.withColumn("_d", dist).where(F.col("_d") <= d) \
             .select("geom_id").distinct()
    return members.join(hit, "geom_id", "left_semi")


def bbox_overlap_join(
    left: DataFrame, right: DataFrame, suffix: str = "_r", broadcast_right: bool = True,
) -> DataFrame:
    """Generic bbox range join: pairs whose bboxes overlap (zero-width safe,
    geometry.py:476-481).  Both sides need xmin/ymin/xmax/ymax columns."""
    r = right
    for c in ("xmin", "ymin", "xmax", "ymax"):
        r = r.withColumnRenamed(c, c + suffix)
    if broadcast_right:
        r = F.broadcast(r)
    cond = (
        (F.col("xmin") <= F.col("xmax" + suffix)) & (F.col("xmin" + suffix) <= F.col("xmax"))
        & (F.col("ymin") <= F.col("ymax" + suffix)) & (F.col("ymin" + suffix) <= F.col("ymax"))
    )
    return left.join(r, cond)
