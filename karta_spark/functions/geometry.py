"""DataFrame-level geometry operators over vertex tables.

Canonical representations (SURVEY §1.5):

- **vertex table**: one row per vertex — ``(geom_id, idx, x, y)`` — the
  exploded form all window-style ops run on (segments = lag, cumulative
  length = running sum, bbox = groupBy min/max).
- **geometry array**: ``(geom_id, vertices: array<struct<x,y>>)`` — compact
  form shipped into numpy refine kernels.

Every op here is a plain Catalyst plan (window/agg/join) — karta's eager
per-object methods (reference geometry.py:647-973) become declarative
column programs that scale by partitioning on geom_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from karta_spark.functions.geodesy import plane_distance, sphere_distance


def explode_vertices(df: DataFrame, vertices_col: str = "vertices",
                     geom_id: str = "geom_id") -> DataFrame:
    """geometry-array form -> vertex table (keeps all other columns)."""
    out = df.select(
        geom_id,
        F.posexplode(vertices_col).alias("idx", "_v"),
    )
    return out.select(geom_id, "idx", F.col("_v.x").alias("x"), F.col("_v.y").alias("y"))


def collect_vertices(df: DataFrame, geom_id: str = "geom_id") -> DataFrame:
    """vertex table -> geometry-array form (order restored by idx)."""
    return (
        df.groupBy(geom_id)
        .agg(F.sort_array(F.collect_list(F.struct("idx", "x", "y"))).alias("_s"))
        .select(
            geom_id,
            F.transform("_s", lambda s: F.struct(s.x.alias("x"), s.y.alias("y"))).alias("vertices"),
        )
    )


def segments(df: DataFrame, geom_id: str = "geom_id", closed: bool = False,
             with_z: bool = False) -> DataFrame:
    """Adjacent-vertex pairing — the lag-window analogue of karta's
    ``segments`` generator (reference geometry.py:668-676; ring wrap-around
    for polygons geometry.py:1079-1091).

    Returns (geom_id, seg_idx, x0, y0, x1, y1). With ``closed`` the last
    vertex pairs back to the first (polygon ring closure).  ``with_z``
    also carries z0/z1 from a rank-3 vertex table's ``z`` column.
    """
    w = Window.partitionBy(geom_id).orderBy("idx")
    cols = [
        geom_id, "idx",
        F.col("x").alias("x0"), F.col("y").alias("y0"),
        F.lead("x").over(w).alias("x1"), F.lead("y").over(w).alias("y1"),
    ]
    if with_z:
        cols += [F.col("z").alias("z0"), F.lead("z").over(w).alias("z1")]
    seg = df.select(*cols)
    if closed:
        full = Window.partitionBy(geom_id).orderBy("idx").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)
        seg = seg.withColumn("x1", F.coalesce("x1", F.first("x0").over(full))) \
                 .withColumn("y1", F.coalesce("y1", F.first("y0").over(full)))
        if with_z:
            seg = seg.withColumn(
                "z1", F.coalesce("z1", F.first("z0").over(full)))
    else:
        seg = seg.where(F.col("x1").isNotNull())
    return seg.withColumnRenamed("idx", "seg_idx")


def seg_length(spherical: bool = False) -> Column:
    """Per-segment length column for a segments() frame."""
    if spherical:
        return sphere_distance(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
    return plane_distance(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))


def length(df: DataFrame, geom_id: str = "geom_id", spherical: bool = False,
           geodesic: bool = False, with_z: bool = False) -> DataFrame:
    """Total geometry length: sum of segment lengths (geometry.py:647-665).

    ``geodesic`` sums WGS84 ellipsoidal (Vincenty) segment distances — the
    reference's Line.length on LonLatWGS84 (its default geographic CRS);
    ``spherical`` is the SphericalEarth arm; default planar.

    ``with_z`` is an EXTENSION past the reference: its length kernel is
    2-D even for rank-3 lines (vectorgeo.pyx:178-196 reads only x/y) —
    here each segment folds dz by the Point.distance rank-3 rule
    (sqrt(d2d^2 + dz^2), reference geometry.py:311-314)."""
    if geodesic:
        from karta_spark.functions.geodesy import ellipsoid_distance
        seg = segments(df, geom_id, with_z=with_z).withColumn(
            "_len", ellipsoid_distance(F.col("x0"), F.col("y0"),
                                       F.col("x1"), F.col("y1")))
    else:
        seg = segments(df, geom_id, with_z=with_z).withColumn(
            "_len", seg_length(spherical))
    if with_z:
        from karta_spark.functions.geodesy import distance_with_z
        seg = seg.withColumn(
            "_len", distance_with_z(F.col("_len"), F.col("z0"), F.col("z1")))
    return seg.groupBy(geom_id).agg(F.sum("_len").alias("length"))


def cumlength(df: DataFrame, geom_id: str = "geom_id", spherical: bool = False) -> DataFrame:
    """Running per-vertex cumulative length (geometry.py:875-888): vertex 0
    gets 0, vertex i the summed segment lengths up to i."""
    w = Window.partitionBy(geom_id).orderBy("idx")
    prev_x = F.lag("x").over(w)
    prev_y = F.lag("y").over(w)
    step = F.when(prev_x.isNull(), F.lit(0.0)).otherwise(
        sphere_distance(prev_x, prev_y, F.col("x"), F.col("y")) if spherical
        else plane_distance(prev_x, prev_y, F.col("x"), F.col("y"))
    )
    run = Window.partitionBy(geom_id).orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("cumlength", F.sum(step).over(run))


def displacement(df: DataFrame, geom_id: str = "geom_id", spherical: bool = False) -> DataFrame:
    """distance(first vertex, last vertex) (geometry.py:962-969)."""
    agg = df.groupBy(geom_id).agg(
        F.min_by("x", "idx").alias("x0"), F.min_by("y", "idx").alias("y0"),
        F.max_by("x", "idx").alias("x1"), F.max_by("y", "idx").alias("y1"),
    )
    d = (sphere_distance(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1")) if spherical
         else plane_distance(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1")))
    return agg.select(geom_id, d.alias("displacement"))


def bbox(df: DataFrame, geom_id: str = "geom_id") -> DataFrame:
    """Planar bbox aggregate (geometry.py:428-457 planar path)."""
    return df.groupBy(geom_id).agg(
        F.min("x").alias("xmin"), F.min("y").alias("ymin"),
        F.max("x").alias("xmax"), F.max("y").alias("ymax"),
    )


def geographic_bbox_df(df: DataFrame, geom_id: str = "geom_id",
                       vertices: str = "vertices", ring: bool = False) -> DataFrame:
    """Dateline-aware spherical bbox per geometry (dateline.pyx:19-61 via
    kernels.geographic_bbox) — sequential per-geometry walk in an Arrow
    batch kernel (the rot accumulator is order-dependent, so this is a
    per-geometry scan, not a commutative agg)."""
    import numpy as np
    import pandas as pd

    from karta_spark.functions.kernels import geographic_bbox

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.array([[v["x"], v["y"]] for v in r[vertices]], dtype=np.float64)
                rows.append((r[geom_id],) + geographic_bbox(arr, ring=ring))
            yield pd.DataFrame(rows, columns=[geom_id, "xmin", "ymin", "xmax", "ymax"])

    return df.select(geom_id, vertices).mapInPandas(
        kernel, f"{geom_id} long, xmin double, ymin double, xmax double, ymax double")


def shoelace_terms(closed_segments: DataFrame) -> DataFrame:
    """Add the shoelace cross term to a closed segments() frame."""
    return closed_segments.withColumn(
        "_cross", F.col("x0") * F.col("y1") - F.col("x1") * F.col("y0"))


def area(df: DataFrame, geom_id: str = "geom_id") -> DataFrame:
    """Planar polygon area via shoelace (geometry.py:1110-1124 planar arm);
    input is a vertex table of the outer ring (holes subtracted by caller)."""
    seg = shoelace_terms(segments(df, geom_id, closed=True))
    return seg.groupBy(geom_id).agg((F.abs(F.sum("_cross")) / 2.0).alias("area"))


def centroid(df: DataFrame, geom_id: str = "geom_id") -> DataFrame:
    """Shoelace centroid, holes ignored (geometry.py:1146-1154)."""
    seg = shoelace_terms(segments(df, geom_id, closed=True))
    agg = seg.groupBy(geom_id).agg(
        F.sum("_cross").alias("_a2"),
        F.sum((F.col("x0") + F.col("x1")) * F.col("_cross")).alias("_cx"),
        F.sum((F.col("y0") + F.col("y1")) * F.col("_cross")).alias("_cy"),
    )
    return agg.select(
        geom_id,
        (F.col("_cx") / (3.0 * F.col("_a2"))).alias("cx"),
        (F.col("_cy") / (3.0 * F.col("_a2"))).alias("cy"),
    )


def geodesic_area(df: DataFrame, geom_id: str = "geom_id",
                  spherical: bool = False) -> DataFrame:
    """Polygon area on a geographical CRS — the reference Polygon.area
    geographic arm (geometry.py:1119-1135): per-segment geodesic
    quadrilateral areas (spherical geodesy.py:115-127, ellipsoidal Karney
    I4 series geodesy.py:637-729) summed per ring.

    Scale shape: segments() lag-window -> Arrow-batched numpy kernel per
    segment -> map-side-combinable groupBy sum.  The spherical kernel is
    fully vectorized; the ellipsoidal one pays one scalar Karney inverse
    per segment (~50 us — the price of matching the reference solver
    bit-for-bit; it parallelizes across executors, segments are the unit
    of work, so corpus scale is unaffected)."""
    from karta_spark.functions import kernels as K
    from karta_spark.functions.geodesy import R_SPHERE

    seg = segments(df, geom_id, closed=True)

    @F.pandas_udf("double")
    def quad(x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series) -> pd.Series:
        if spherical:
            s = K.spherical_quad_area(R_SPHERE, x0.to_numpy(), y0.to_numpy(),
                                      x1.to_numpy(), y1.to_numpy())
        else:
            s = K.ellipsoidal_quad_area(K.WGS84_A, K.WGS84_A * (1 - K.WGS84_F),
                                        x0.to_numpy(), y0.to_numpy(),
                                        x1.to_numpy(), y1.to_numpy())
        return pd.Series(np.asarray(s, dtype=np.float64))

    terms = seg.withColumn("_s", quad("x0", "y0", "x1", "y1"))
    return terms.groupBy(geom_id).agg(F.abs(F.sum("_s")).alias("area"))


def isclockwise(df: DataFrame, geom_id: str = "geom_id") -> DataFrame:
    """Ring orientation: sum((x1-x0)*(y1+y0)) > 0 (geometry.py:1044-1048)."""
    seg = segments(df, geom_id, closed=True)
    return seg.groupBy(geom_id).agg(
        (F.sum((F.col("x1") - F.col("x0")) * (F.col("y1") + F.col("y0"))) > 0).alias("isclockwise")
    )


def perimeter(df: DataFrame, geom_id: str = "geom_id", spherical: bool = False) -> DataFrame:
    """Closed-ring perimeter (geometry.py:1098-1107; holes added by caller
    as separate geom rows)."""
    seg = segments(df, geom_id, closed=True).withColumn("_len", seg_length(spherical))
    return seg.groupBy(geom_id).agg(F.sum("_len").alias("perimeter"))


def to_points(df: DataFrame, dx: float, geom_id: str = "geom_id") -> DataFrame:
    """Resample each line at fixed spacing *dx* by walking segments —
    karta ``Line.to_points`` (geometry.py:890-935): positions at distances
    0, dx, 2dx, ... along the cumulative length, linear within segments,
    endpoint always included.

    Plan: cumlength window -> segment ranges -> sequence-generate sample
    distances -> range join (distance between consecutive cumlengths) ->
    linear interpolation. All Catalyst; no UDF.
    """
    cum = cumlength(df, geom_id)
    w = Window.partitionBy(geom_id).orderBy("idx")
    seg = cum.select(
        geom_id,
        F.col("idx").alias("seg_idx"),
        F.col("x").alias("x0"), F.col("y").alias("y0"),
        F.col("cumlength").alias("d0"),
        F.lead("x").over(w).alias("x1"), F.lead("y").over(w).alias("y1"),
        F.lead("cumlength").over(w).alias("d1"),
    ).where(F.col("x1").isNotNull())

    total = cum.groupBy(geom_id).agg(F.max("cumlength").alias("_total"))
    samples = total.select(
        geom_id,
        F.posexplode(
            F.sequence(F.lit(0), F.floor(F.col("_total") / dx).cast("int"))
        ).alias("sample_idx", "_k"),
    ).withColumn("target_d", F.col("_k").cast("double") * dx).drop("_k")

    # samples live at exact multiples of dx along cumulative length; the
    # final vertex appears only when total is an exact multiple (karta's
    # walk loop, geometry.py:890-918).  The `target_d == d1 == total` arm
    # catches that exact-multiple endpoint which the half-open interval
    # misses.
    j = (
        samples.join(seg, on=geom_id, how="inner")
        .withColumn("_dmax", F.max("d1").over(Window.partitionBy(geom_id)))
        .where(
            ((F.col("target_d") >= F.col("d0")) & (F.col("target_d") < F.col("d1")))
            | ((F.col("d1") == F.col("_dmax")) & (F.col("target_d") == F.col("d1")))
        )
    )
    frac = (F.col("target_d") - F.col("d0")) / (F.col("d1") - F.col("d0"))
    return j.select(
        geom_id, "sample_idx",
        (F.col("x0") + frac * (F.col("x1") - F.col("x0"))).alias("x"),
        (F.col("y0") + frac * (F.col("y1") - F.col("y0"))).alias("y"),
    )


def point_segment_distance(px, py, x0, y0, x1, y1):
    """Planar distance from point to segment — projection clamped to the
    segment (semantics of pt_nearest_planar, vectorgeo.pyx:197-251)."""
    dx, dy = x1 - x0, y1 - y0
    seg2 = dx * dx + dy * dy
    t = F.when(seg2 == 0, F.lit(0.0)).otherwise(
        ((px - x0) * dx + (py - y0) * dy) / seg2)
    tc = F.least(F.lit(1.0), F.greatest(F.lit(0.0), t))
    cx = x0 + tc * dx
    cy = y0 + tc * dy
    return F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))


def shortest_distance_to(df: DataFrame, qx: float, qy: float,
                         geom_id: str = "geom_id") -> DataFrame:
    """Min distance from a query point to each geometry's boundary —
    ``Line.shortest_distance_to`` (geometry.py:725-792 planar arm) as
    segment-explode + min agg."""
    seg = segments(df, geom_id)
    d = point_segment_distance(
        F.lit(float(qx)), F.lit(float(qy)),
        F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))
    return seg.withColumn("_d", d).groupBy(geom_id).agg(F.min("_d").alias("distance"))


def to_points_geodesic_df(df: DataFrame, dx: float, geom_id: str = "geom_id",
                          vertices: str = "vertices") -> DataFrame:
    """Geodesic line resampling (LonLatWGS84 ``to_points``) — sequential
    walk per geometry (kernels.to_points_geodesic, matches the reference's
    pyproj walk to ~5e-9 deg) in an Arrow batch kernel."""
    import numpy as np
    import pandas as pd

    from karta_spark.functions.kernels import to_points_geodesic

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.array([[v["x"], v["y"]] for v in r[vertices]], dtype=np.float64)
                pts = to_points_geodesic(arr, dx)
                for k, (x, y) in enumerate(pts):
                    rows.append((r[geom_id], k, float(x), float(y)))
            yield pd.DataFrame(rows, columns=[geom_id, "sample_idx", "x", "y"])

    return df.select(geom_id, vertices).mapInPandas(
        kernel, f"{geom_id} long, sample_idx int, x double, y double")


def to_npoints_geodesic_df(df: DataFrame, n: int, geom_id: str = "geom_id",
                           vertices: str = "vertices") -> DataFrame:
    """Geodesic ``Line.to_npoints`` (LonLatWGS84, geometry.py:920-960) —
    sequential ellipsoid walk per geometry (kernels.to_npoints_geodesic)
    in an Arrow batch kernel; always yields exactly *n* points per line
    (precision behavior pinned by the reference's Greenland-coast test)."""
    import numpy as np
    import pandas as pd

    from karta_spark.functions.kernels import to_npoints_geodesic

    def kernel(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, r in pdf.iterrows():
                arr = np.array([[v["x"], v["y"]] for v in r[vertices]],
                               dtype=np.float64)
                pts = to_npoints_geodesic(arr, n)
                for k, (x, y) in enumerate(pts):
                    rows.append((r[geom_id], k, float(x), float(y)))
            yield pd.DataFrame(rows, columns=[geom_id, "sample_idx", "x", "y"])

    return df.select(geom_id, vertices).mapInPandas(
        kernel, f"{geom_id} long, sample_idx int, x double, y double")


def to_npoints(df: DataFrame, n: int, geom_id: str = "geom_id") -> DataFrame:
    """n equally spaced points along each line (geometry.py:920-960):
    positions k * total/(n-1), k = 0..n-1; endpoint always included."""
    cum = cumlength(df, geom_id)
    w = Window.partitionBy(geom_id).orderBy("idx")
    seg = cum.select(
        geom_id,
        F.col("x").alias("x0"), F.col("y").alias("y0"),
        F.col("cumlength").alias("d0"),
        F.lead("x").over(w).alias("x1"), F.lead("y").over(w).alias("y1"),
        F.lead("cumlength").over(w).alias("d1"),
    ).where(F.col("x1").isNotNull())
    total = cum.groupBy(geom_id).agg(F.max("cumlength").alias("_total"))
    samples = total.select(
        geom_id, "_total",
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("sample_idx"),
    ).withColumn(
        "target_d",
        F.col("sample_idx").cast("double") * F.col("_total") / float(n - 1),
    ).drop("_total")
    j = (
        samples.join(seg, on=geom_id, how="inner")
        .withColumn("_dmax", F.max("d1").over(Window.partitionBy(geom_id)))
        .where(
            ((F.col("target_d") >= F.col("d0")) & (F.col("target_d") < F.col("d1")))
            | ((F.col("d1") == F.col("_dmax")) & (F.col("target_d") >= F.col("d1")))
        )
    )
    frac = F.least(F.lit(1.0), (F.col("target_d") - F.col("d0")) / (F.col("d1") - F.col("d0")))
    return j.select(
        geom_id, "sample_idx",
        (F.col("x0") + frac * (F.col("x1") - F.col("x0"))).alias("x"),
        (F.col("y0") + frac * (F.col("y1") - F.col("y0"))).alias("y"),
    )


def simplify_dp(df: DataFrame, eps: float,
                geom_id: str = "geom_id") -> DataFrame:
    """Douglas–Peucker polyline simplification over the vertex-table
    convention (geom_id, idx, x, y) -> the KEPT vertices, same schema.

    The zoom-dependent geometry step feeding the tile renderer
    (raster/render.py): a coastline drawn at z4 does not need its z14
    vertices.  Per-geometry applyInPandas with an explicit stack (not
    recursion); the deviation is perpendicular point-to-chord distance
    (point-to-anchor when the chord degenerates), split on dev > eps
    STRICTLY, max-deviation ties keep the LOWEST index — the exact
    contract the recursive-CTE DuckDB twin (gate q117) reproduces.
    Geometries are independent: row-level parallelism, no shuffle
    beyond the per-geometry grouping."""

    def run(key, pdf):
        pdf = pdf.sort_values("idx").reset_index(drop=True)
        x = pdf["x"].to_numpy(dtype=np.float64)
        y = pdf["y"].to_numpy(dtype=np.float64)
        n = len(x)
        keep = np.zeros(n, dtype=bool)
        if n:
            keep[0] = keep[-1] = True
        stack = [(0, n - 1)] if n > 2 else []
        while stack:
            lo, hi = stack.pop()
            if hi - lo <= 1:
                continue
            ax, ay, cx, cy = x[lo], y[lo], x[hi], y[hi]
            px, py = x[lo + 1:hi], y[lo + 1:hi]
            if ax == cx and ay == cy:
                dev = np.sqrt((px - ax) ** 2 + (py - ay) ** 2)
            else:
                dev = (np.abs((cx - ax) * (ay - py) - (ax - px) * (cy - ay))
                       / np.sqrt((cx - ax) * (cx - ax)
                                 + (cy - ay) * (cy - ay)))
            k = int(np.argmax(dev)) + lo + 1  # ties -> lowest index
            if dev[k - lo - 1] > eps:
                keep[k] = True
                stack.append((lo, k))
                stack.append((k, hi))
        return pdf[keep]

    return df.select(geom_id, "idx", "x", "y") \
             .groupBy(geom_id).applyInPandas(
                 run, f"{geom_id} long, idx long, x double, y double")
