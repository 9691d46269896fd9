"""Distance / azimuth / affine column expressions.

Pure Catalyst expressions (JVM whole-stage codegen) replicating karta's
scalar geodesy (reference karta/geodesy.py:80-113) so the hot path never
leaves the JVM.  The spherical branch rule (law-of-cosines vs haversine at
0.01 rad, geodesy.py:100-107) is kept for golden parity.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

R_SPHERE = 6370997.0  # karta SphericalEarth radius (crs.py:77)


def plane_distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """sqrt(dx^2 + dy^2) — geodesy.py:80-82."""
    return F.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))


def plane_azimuth(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """atan2(dx, dy) (clockwise from +y) — geodesy.py:84-89."""
    return F.atan2(x2 - x1, y2 - y1)


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


def ellipsoid_distance(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """WGS84 ellipsoidal geodesic distance (Vincenty inverse, Arrow-batched
    kernel). The reference delegates this to pyproj.Geod at runtime
    (crs.py:234-243); kernels.vincenty_inverse is the self-contained twin."""
    import pandas as pd
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


def rotation_matrix(theta_deg: float, x0: float = 0.0, y0: float = 0.0) -> list[float]:
    """2x3 rotation about (x0, y0) — geometry.py:49-64."""
    t = math.radians(theta_deg)
    c, s = math.cos(t), math.sin(t)
    return [c, -s, x0 - c * x0 + s * y0, s, c, y0 - s * x0 - c * y0]
