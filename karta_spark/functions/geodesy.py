"""Distance / azimuth / affine column expressions.

Pure Catalyst expressions (JVM whole-stage codegen) replicating karta's
scalar geodesy (reference karta/geodesy.py:80-113) so the hot path never
leaves the JVM.  The spherical branch rule (law-of-cosines vs haversine at
0.01 rad, geodesy.py:100-107) is kept for golden parity.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

R_SPHERE = 6370997.0  # karta SphericalEarth radius (crs.py:77)


def plane_distance(x1: Column, y1: Column, x2: Column, y2: Column,
                   z1: Column | None = None,
                   z2: Column | None = None) -> Column:
    """sqrt(dx^2 + dy^2) — geodesy.py:80-82.

    With both ``z1``/``z2``: the reference's rank-3 fold (Point.distance,
    reference geometry.py:311-314) — dist = sqrt(d2d^2 + dz^2), applied
    exactly as the reference does (fold AFTER the 2-D distance, so the
    float sequence matches)."""
    d = F.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
    if z1 is not None and z2 is not None:
        return distance_with_z(d, z1, z2)
    return d


def distance_with_z(dist: Column, z1: Column, z2: Column) -> Column:
    """Fold a vertical delta into ANY 2-D distance column —
    sqrt(dist^2 + dz^2), the reference's Point.distance rank-3 rule
    (geometry.py:311-314), which applies it to the planar AND geodesic
    arms alike (compose with sphere_distance / ellipsoid_distance)."""
    dz = z2 - z1
    return F.sqrt(dist * dist + dz * dz)


def plane_azimuth(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """atan2(dx, dy) (clockwise from +y) — geodesy.py:84-89."""
    return F.atan2(x2 - x1, y2 - y1)


def compass_azimuth(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Point.azimuth's projected arm (reference geometry.py:166-173):
    degrees clockwise from north, normalized into [-180, 180) (due south
    is -180, not +180); NaN for coincident points."""
    az = F.degrees(F.atan2(x2 - x1, y2 - y1))
    norm = F.pmod(az + 180.0, F.lit(360.0)) - 180.0
    return F.when((x1 == x2) & (y1 == y2), F.lit(float("nan"))).otherwise(norm)


def sphere_distance(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column, radius: float = R_SPHERE
) -> Column:
    """Two-branch spherical distance in meters, degrees in (geodesy.py:96-108)."""
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    dx = F.abs(rlon1 - rlon2)
    dy = F.abs(rlat1 - rlat2)
    loc = F.acos(
        F.least(F.lit(1.0), F.greatest(F.lit(-1.0),
            F.sin(rlat1) * F.sin(rlat2) + F.cos(rlat1) * F.cos(rlat2) * F.cos(dx)))
    )
    hav = 2.0 * F.asin(F.sqrt(
        F.pow(F.sin(dy / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dx / 2), 2)
    ))
    return F.when((dx > 0.01) | (dy > 0.01), loc).otherwise(hav) * radius


def sphere_azimuth(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Spherical forward azimuth in radians (geodesy.py:111-113)."""
    dlon = F.radians(lon2 - lon1)
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    return F.atan2(F.sin(dlon), F.cos(rlat1) * F.tan(rlat2) - F.sin(rlat1) * F.cos(dlon))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str, radius: float = R_SPHERE) -> str:
    """DuckDB-SQL twin of the haversine branch (for oracle queries that keep
    separations under the 0.01 rad branch point, or accept the branch)."""
    return (
        f"(2.0 * asin(sqrt(pow(sin((radians({lat1})-radians({lat2}))/2),2) "
        f"+ cos(radians({lat1}))*cos(radians({lat2}))"
        f"*pow(sin((radians({lon1})-radians({lon2}))/2),2))) * {radius!r})"
    )


def sphere_distance_sql(lon1: str, lat1: str, lon2: str, lat2: str, radius: float = R_SPHERE) -> str:
    """DuckDB-SQL twin of the full two-branch rule (geodesy.py:96-108)."""
    dx = f"abs(radians({lon1}) - radians({lon2}))"
    dy = f"abs(radians({lat1}) - radians({lat2}))"
    loc = (
        f"acos(least(1.0, greatest(-1.0, sin(radians({lat1}))*sin(radians({lat2}))"
        f" + cos(radians({lat1}))*cos(radians({lat2}))*cos({dx}))))"
    )
    hav = (
        f"2.0 * asin(sqrt(pow(sin(({dy})/2),2)"
        f" + cos(radians({lat1}))*cos(radians({lat2}))*pow(sin(({dx})/2),2)))"
    )
    return f"(CASE WHEN {dx} > 0.01 OR {dy} > 0.01 THEN {loc} ELSE {hav} END * {radius!r})"


def walk_projected(x: Column, y: Column, azimuth_deg, distance
                   ) -> tuple[Column, Column]:
    """Point.walk's projected arm (reference geometry.py:232-253): planar
    displacement of `distance` along compass `azimuth` (clockwise, north
    at 0) in the projected plane — (x + d sin az, y + d cos az)."""
    az = F.radians(azimuth_deg if isinstance(azimuth_deg, Column)
                   else F.lit(float(azimuth_deg)))
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    return x + d * F.sin(az), y + d * F.cos(az)


def spherical_quad_area_sql(x1: str, y1: str, x2: str, y2: str,
                            radius: float = R_SPHERE) -> str:
    """Engine-neutral SQL for the signed area between a great-circle
    segment and the equator (reference geodesy.py:115-127; the kernel twin
    is kernels.spherical_quad_area).  Parses identically as a Spark SQL
    expression (F.expr) and in DuckDB, so the geodesic-area family is
    oracle-checkable.  Emits the Karney eq. 44 canonical configuration as
    CASE chains."""
    swap = f"(abs({y1}) < abs({y2}))"
    Y1 = f"(CASE WHEN {swap} THEN {y2} ELSE {y1} END)"
    Y2 = f"(CASE WHEN {swap} THEN {y1} ELSE {y2} END)"
    neg = f"({Y1} > 0)"
    Y1n = f"(CASE WHEN {neg} THEN -{Y1} ELSE {Y1} END)"
    Y2n = f"(CASE WHEN {neg} THEN -{Y2} ELSE {Y2} END)"
    d = f"(({x2}) - ({x1}))"
    dr = f"({d} - 360.0*floor(({d} + 180.0)/360.0))"
    dxc = f"(CASE WHEN {dr} < 0 OR {dr} > 180 THEN -{dr} ELSE {dr} END)"
    p1, p2, lam = f"radians({Y1n})", f"radians({Y2n})", f"radians({dxc})"
    a1 = (f"atan2(cos({p2})*sin({lam}),"
          f" cos({p1})*sin({p2}) - sin({p1})*cos({p2})*cos({lam}))")
    a2 = (f"atan2(cos({p1})*sin({lam}),"
          f" -cos({p2})*sin({p1}) + sin({p2})*cos({p1})*cos({lam}))")
    rev = f"(CASE WHEN ({x2}) < ({x1}) THEN -1.0 ELSE 1.0 END)"
    return f"({rev} * {radius!r} * {radius!r} * ({a2} - {a1}))"


def ellipsoid_distance(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """WGS84 ellipsoidal geodesic distance (Vincenty inverse, Arrow-batched
    kernel). The reference delegates this to pyproj.Geod at runtime
    (crs.py:234-243); kernels.vincenty_inverse is the self-contained twin."""
    from pyspark.sql import functions as _F

    from karta_spark.functions.kernels import vincenty_inverse

    @_F.pandas_udf("double")
    def udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        _, _, dist = vincenty_inverse(a.to_numpy(), b.to_numpy(),
                                      c.to_numpy(), d.to_numpy())
        return pd.Series(dist)

    return udf(lon1, lat1, lon2, lat2)


# ---------------------------------------------------------------------------
# affine transforms over coordinate columns (geometry.py:180-230, 483-539)
# ---------------------------------------------------------------------------

def affine_x(x: Column, y: Column, m: list[float]) -> Column:
    """x' = m[0]*x + m[1]*y + m[2] (2x3 row-major matrix)."""
    return F.lit(float(m[0])) * x + F.lit(float(m[1])) * y + F.lit(float(m[2]))


def affine_y(x: Column, y: Column, m: list[float]) -> Column:
    return F.lit(float(m[3])) * x + F.lit(float(m[4])) * y + F.lit(float(m[5]))


def lift_affine(m: list[float]) -> list[float]:
    """Lift a 2x3 (6-element row-major) affine matrix to the 3x4
    (12-element) form — the reference's apply_transform lifting
    (geometry.py:210-217): xy block copied, z row = identity, so a 2-D
    transform passes z through unchanged.  12-element input returns
    as-is; anything else raises (reference raises ValueError on bad
    shapes, geometry.py:216-217)."""
    if len(m) == 12:
        return [float(v) for v in m]
    if len(m) != 6:
        raise ValueError(f"invalid affine matrix size: {len(m)} "
                         "(expected 6 = 2x3 or 12 = 3x4)")
    return [float(m[0]), float(m[1]), 0.0, float(m[2]),
            float(m[3]), float(m[4]), 0.0, float(m[5]),
            0.0, 0.0, 1.0, 0.0]


def affine3_x(x: Column, y: Column, z: Column, m: list[float]) -> Column:
    """x' from a 3x4 row-major affine matrix (reference
    geometry.py:224-230: x' = M00*x + M01*y + M02*z + M03); pass
    ``F.lit(0.0)`` as z for 2-D vertices (the reference's convention,
    geometry.py:219-222)."""
    m = lift_affine(m)
    return (F.lit(m[0]) * x + F.lit(m[1]) * y + F.lit(m[2]) * z
            + F.lit(m[3]))


def affine3_y(x: Column, y: Column, z: Column, m: list[float]) -> Column:
    m = lift_affine(m)
    return (F.lit(m[4]) * x + F.lit(m[5]) * y + F.lit(m[6]) * z
            + F.lit(m[7]))


def affine3_z(x: Column, y: Column, z: Column, m: list[float]) -> Column:
    """z' = M20*x + M21*y + M22*z + M23 — only meaningful for rank-3
    vertices (the reference drops the z row for 2-D points,
    geometry.py:225-230)."""
    m = lift_affine(m)
    return (F.lit(m[8]) * x + F.lit(m[9]) * y + F.lit(m[10]) * z
            + F.lit(m[11]))


def rotation_matrix(theta_deg: float, x0: float = 0.0, y0: float = 0.0) -> list[float]:
    """2x3 rotation about (x0, y0) — geometry.py:49-64."""
    t = math.radians(theta_deg)
    c, s = math.cos(t), math.sin(t)
    return [c, -s, x0 - c * x0 + s * y0, s, c, y0 - s * x0 - c * y0]


def affine_matrix_agg(df, ax: str = "ax", ay: str = "ay",
                      bx: str = "bx", by: str = "by",
                      exact_sums: bool = False):
    """Least-squares 2x3 affine fit mapping (ax, ay) -> (bx, by) — the
    distributed twin of the reference's ``affine_matrix`` (geometry.py:
    1833-1852, np.linalg.lstsq over the kron-structured design matrix).

    The design matrix decomposes into two independent 3-parameter
    regressions sharing the Gram matrix G = sum [x y 1][x y 1]^T, so the
    whole fit is ONE map-side-combinable aggregation of 12 sums plus a
    closed-form 3x3 Cramer solve — expressible as column math (and as the
    DuckDB oracle twin), no collect of the points.

    Returns a 1-row DataFrame (m00, m01, m02, m10, m11, m12, det).
    Requires non-degenerate control points (det != 0); the reference's
    lstsq min-norm behavior on degenerate input is not replicated."""
    x, y = F.col(ax), F.col(ay)
    u, v = F.col(bx), F.col(by)
    if exact_sums:
        # shuffle-order-independent sums for oracle parity: round each
        # product to a fixed scale and accumulate in DECIMAL (exact)
        def S(e):
            return F.sum(F.round(e, 9).cast("decimal(30,9)")).cast("double")
    else:
        def S(e):
            return F.sum(e)
    s = df.agg(
        S(x * x).alias("sxx"), S(x * y).alias("sxy"),
        S(y * y).alias("syy"), S(x).alias("sx"), S(y).alias("sy"),
        F.count("*").cast("double").alias("n"),
        S(x * u).alias("sxu"), S(y * u).alias("syu"), S(u).alias("su"),
        S(x * v).alias("sxv"), S(y * v).alias("syv"), S(v).alias("sv"),
    )
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    sx, sy, n = F.col("sx"), F.col("sy"), F.col("n")
    det = (sxx * (syy * n - sy * sy) - sxy * (sxy * n - sy * sx)
           + sx * (sxy * sy - syy * sx))

    def cramer(v1, v2, v3):
        d0 = (v1 * (syy * n - sy * sy) - sxy * (v2 * n - sy * v3)
              + sx * (v2 * sy - syy * v3))
        d1 = (sxx * (v2 * n - sy * v3) - v1 * (sxy * n - sy * sx)
              + sx * (sxy * v3 - v2 * sx))
        d2 = (sxx * (syy * v3 - v2 * sy) - sxy * (sxy * v3 - v2 * sx)
              + v1 * (sxy * sy - syy * sx))
        return d0 / det, d1 / det, d2 / det

    m00, m01, m02 = cramer(F.col("sxu"), F.col("syu"), F.col("su"))
    m10, m11, m12 = cramer(F.col("sxv"), F.col("syv"), F.col("sv"))
    return s.select(m00.alias("m00"), m01.alias("m01"), m02.alias("m02"),
                    m10.alias("m10"), m11.alias("m11"), m12.alias("m12"),
                    det.alias("det"))


def affine_matrix(df, ax: str = "ax", ay: str = "ay",
                  bx: str = "bx", by: str = "by"):
    """Collect affine_matrix_agg into the reference's (2, 3) ndarray."""
    import numpy as _np
    r = affine_matrix_agg(df, ax, ay, bx, by).first()
    return _np.array([[r["m00"], r["m01"], r["m02"]],
                      [r["m10"], r["m11"], r["m12"]]])


def affine_matrix_sql(table: str, ax: str = "ax", ay: str = "ay",
                      bx: str = "bx", by: str = "by",
                      exact_sums: bool = False) -> str:
    """DuckDB twin of affine_matrix_agg (same sums, same Cramer algebra)."""
    if exact_sums:
        def S(e):
            return f"CAST(sum(CAST(round({e}, 9) AS DECIMAL(30,9))) AS DOUBLE)"
    else:
        def S(e):
            return f"sum({e})"
    return f"""
WITH s AS (
  SELECT {S(f'{ax}*{ax}')} AS sxx, {S(f'{ax}*{ay}')} AS sxy, {S(f'{ay}*{ay}')} AS syy,
         {S(ax)} AS sx, {S(ay)} AS sy, CAST(count(*) AS DOUBLE) AS n,
         {S(f'{ax}*{bx}')} AS sxu, {S(f'{ay}*{bx}')} AS syu, {S(bx)} AS su,
         {S(f'{ax}*{by}')} AS sxv, {S(f'{ay}*{by}')} AS syv, {S(by)} AS sv
  FROM {table}
), d AS (
  SELECT *,
    (sxx*(syy*n - sy*sy) - sxy*(sxy*n - sy*sx) + sx*(sxy*sy - syy*sx)) AS det
  FROM s
)
SELECT
  (sxu*(syy*n - sy*sy) - sxy*(syu*n - sy*su) + sx*(syu*sy - syy*su)) / det AS m00,
  (sxx*(syu*n - sy*su) - sxu*(sxy*n - sy*sx) + sx*(sxy*su - syu*sx)) / det AS m01,
  (sxx*(syy*su - syu*sy) - sxy*(sxy*su - syu*sx) + sxu*(sxy*sy - syy*sx)) / det AS m02,
  (sxv*(syy*n - sy*sy) - sxy*(syv*n - sy*sv) + sx*(syv*sy - syy*sv)) / det AS m10,
  (sxx*(syv*n - sy*sv) - sxv*(sxy*n - sy*sx) + sx*(sxy*sv - syv*sx)) / det AS m11,
  (sxx*(syy*sv - syv*sy) - sxy*(sxy*sv - syv*sx) + sxv*(sxy*sy - syy*sx)) / det AS m12,
  det
FROM d
"""
