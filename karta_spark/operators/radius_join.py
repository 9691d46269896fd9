"""Distance (within-radius) joins and bbox queries.

Reference semantics:
- ``Multipoint.within_radius`` (geometry.py:1349-1377): candidates from a
  quadtree bbox probe, refined with exact distance **strictly less than**
  radius (border excluded, geometry.py:1371).
- ``Multipoint.within_bbox`` (geometry.py:1379-1389): quadtree search_within,
  boundary exclusive (see tests/vector_predicate_tests.py:199-206).

Distributed plan: the bbox gate is a plain filter that Parquet/Iceberg
min-max pruning answers from footer stats when data is laid out by cell_id;
the radius refine is a pure column expression (JVM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from karta_spark.functions.geodesy import plane_distance, sphere_distance


def within_bbox(points: DataFrame, bbox: tuple, px: str = "x", py: str = "y") -> DataFrame:
    """Strict-interior bbox filter (xmin,ymin,xmax,ymax)."""
    xmin, ymin, xmax, ymax = bbox
    return points.where(
        (F.col(px) > xmin) & (F.col(px) < xmax)
        & (F.col(py) > ymin) & (F.col(py) < ymax)
    )


def within_radius(
    points: DataFrame, cx: float, cy: float, radius: float,
    px: str = "x", py: str = "y", spherical: bool = False,
) -> DataFrame:
    """Points strictly within *radius* of a literal center — bbox gate then
    exact distance (two-phase plan of geometry.py:1349-1377)."""
    if spherical:
        import math
        dlat = math.degrees(radius / 6370997.0)
        max_lat = min(abs(cy) + dlat, 89.9999)
        dlon = dlat / math.cos(math.radians(max_lat))
        gate = (
            (F.col(py) >= cy - dlat) & (F.col(py) <= cy + dlat)
            & (F.abs(F.pmod(F.col(px) - cx + 180.0, F.lit(360.0)) - 180.0) <= dlon)
        )
        d = sphere_distance(F.lit(float(cx)), F.lit(float(cy)), F.col(px), F.col(py))
        return points.where(gate).where(d < radius)
    gate = (
        (F.col(px) >= cx - radius) & (F.col(px) <= cx + radius)
        & (F.col(py) >= cy - radius) & (F.col(py) <= cy + radius)
    )
    d = plane_distance(F.lit(float(cx)), F.lit(float(cy)), F.col(px), F.col(py))
    return points.where(gate).where(d < radius)


def distance_join(
    left: DataFrame, right: DataFrame, radius: float,
    lx: str = "lx", ly: str = "ly", rx: str = "x", ry: str = "y",
    spherical: bool = False, broadcast_right: bool = True,
) -> DataFrame:
    """General distance θ-join: every (l, r) pair with dist < radius.

    With a broadcast-small right side this is a broadcast nested-loop with a
    bbox band prefilter; the big-big case should pre-key both sides by cell
    (see pip_join/knn for the pattern)."""
    import math

    r = F.broadcast(right) if broadcast_right else right
    if spherical:
        # valid spherical gate: a point within `radius` meters differs by at
        # most radius/R radians of latitude (longitude needs the cos(lat)
        # inflation, bounded at the band's extreme latitude)
        dlat = math.degrees(radius / 6370997.0)
        lat_gate = (F.col(ry) >= F.col(ly) - dlat) & (F.col(ry) <= F.col(ly) + dlat)
        max_abs_lat = F.least(F.lit(89.9999), F.greatest(
            F.abs(F.col(ly)) + dlat, F.abs(F.col(ry)) + dlat))
        dlon = F.lit(dlat) / F.cos(F.radians(max_abs_lat))
        lon_gate = F.abs(
            F.pmod(F.col(rx) - F.col(lx) + 180.0, F.lit(360.0)) - 180.0) <= dlon
        band = lat_gate & lon_gate
    else:
        band = (
            (F.col(rx) >= F.col(lx) - radius) & (F.col(rx) <= F.col(lx) + radius)
            & (F.col(ry) >= F.col(ly) - radius) & (F.col(ry) <= F.col(ly) + radius)
        )
    joined = left.join(r, band)
    d = (sphere_distance(F.col(lx), F.col(ly), F.col(rx), F.col(ry)) if spherical
         else plane_distance(F.col(lx), F.col(ly), F.col(rx), F.col(ry)))
    return joined.withColumn("dist", d).where(F.col("dist") < radius)
