"""Projected-CRS tests: forward/inverse math on all three backends.

Replicates the reference's CRS contract (karta crs.py:98-124) and named
projected instances (crs.py:358-388) with public formulas.  Goldens:
- Web-Mercator world-edge constant 20037508.342789244 (a*pi)
- CN Tower UTM 17N 630084 E / 4833438 N (published example, +-1 m)
- central-meridian northing == meridian arc by numerical integration
- UPS north pole maps exactly to the (2e6, 2e6) false origin
Roundtrip accuracy is pinned to the series truncation (<= 2e-8 deg, ~2 mm).
"""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from karta_spark.functions import crs


RNG = np.random.default_rng(17)
LON = RNG.uniform(-55, 55, 500)
LAT = RNG.uniform(-84, 84, 500)


class TestNumpyBackend:
    def test_webmercator_goldens(self):
        x, y = crs.forward_np(crs.WEB_MERCATOR, [180.0, 0.0], [0.0, 0.0])
        assert abs(x[0] - 20037508.342789244) < 1e-6
        assert abs(y[0]) < 1e-9 and abs(x[1]) < 1e-9

    def test_utm_cn_tower(self):
        x, y = crs.forward_np(crs.utm(17), [-79.387139], [43.642567])
        assert abs(x[0] - 630084.0) < 1.0
        assert abs(y[0] - 4833438.0) < 1.0

    def test_tm_central_meridian_is_meridian_arc(self):
        phi = np.linspace(0.0, math.radians(45.0), 400001)
        M = np.trapz(
            crs.A_WGS84 * (1 - crs.E2_WGS84)
            * (1 - crs.E2_WGS84 * np.sin(phi) ** 2) ** -1.5, phi)
        x, y = crs.forward_np(crs.tmerc(0.0), [0.0], [45.0])
        assert abs(x[0]) < 1e-9
        assert abs(y[0] - M) < 1e-4

    def test_ups_pole_false_origin(self):
        x, y = crs.forward_np(crs.UPS_NORTH, [0.0], [90.0])
        assert abs(x[0] - 2e6) < 1e-6 and abs(y[0] - 2e6) < 1e-6

    @pytest.mark.parametrize("c", [
        crs.WEB_MERCATOR, crs.utm(31), crs.LAEA_WGS84, crs.GALL_PETERS])
    def test_roundtrip(self, c):
        lon = LON if c.kind != "tmerc" else LON / 10.0 + 3.0  # near the cm
        x, y = crs.forward_np(c, lon, LAT)
        lo, la = crs.inverse_np(c, x, y)
        assert np.abs(lo - lon).max() < 2e-8
        assert np.abs(la - LAT).max() < 2e-8

    @pytest.mark.parametrize("c,sgn", [
        (crs.UPS_NORTH, 1), (crs.NSIDC_NORTH, 1),
        (crs.UPS_SOUTH, -1), (crs.NSIDC_SOUTH, -1)])
    def test_roundtrip_polar(self, c, sgn):
        lat = sgn * RNG.uniform(45, 89.99, 500)
        x, y = crs.forward_np(c, LON, lat)
        lo, la = crs.inverse_np(c, x, y)
        assert np.abs(lo - LON).max() < 2e-8
        assert np.abs(la - lat).max() < 2e-8

    def test_equal_area_property(self):
        # LAEA/CEA: projected area of a small quad ~= authalic-sphere area
        for c in (crs.LAEA_WGS84, crs.GALL_PETERS):
            lon0, lat0, d = 10.0, 40.0, 0.01
            lons = np.array([lon0, lon0 + d, lon0 + d, lon0])
            lats = np.array([lat0, lat0, lat0 + d, lat0 + d])
            x, y = crs.forward_np(c, lons, lats)
            area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            # exact ellipsoid patch area: a^2/2 * dlam * (q(lat1) - q(lat0))
            q0, q1 = crs._authalic_q(
                crs._NpOps, np.radians(np.array([lat0, lat0 + d])))
            truth = crs.A_WGS84 ** 2 / 2.0 * math.radians(d) * (q1 - q0)
            assert abs(area - truth) / truth < 1e-6, c.name


class TestColumnBackend:
    @pytest.mark.parametrize("c", [
        crs.WEB_MERCATOR, crs.utm(31), crs.UPS_NORTH, crs.LAEA_WGS84,
        crs.GALL_PETERS])
    def test_exprs_match_numpy(self, spark, c):
        lat = LAT if c is not crs.UPS_NORTH else np.abs(LAT) / 2 + 45.0
        lon = LON if c.kind != "tmerc" else LON / 10.0 + 3.0
        df = spark.createDataFrame(
            [(i, float(lon[i]), float(lat[i])) for i in range(120)],
            "i long, lon double, lat double")
        fx, fy = crs.forward_exprs(c, F.col("lon"), F.col("lat"))
        rows = df.select("i", fx.alias("x"), fy.alias("y")).orderBy("i").collect()
        X, Y = crs.forward_np(c, lon[:120], lat[:120])
        for k, r in enumerate(rows):
            assert abs(r["x"] - X[k]) < 1e-6 and abs(r["y"] - Y[k]) < 1e-6

    def test_reproject_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(i, float(LON[i] / 10 + 3), float(LAT[i])) for i in range(100)],
            "i long, x double, y double")
        out = crs.reproject(crs.reproject(df, "lonlat", "utm31n"),
                            "utm31n", "lonlat").orderBy("i").collect()
        for k, r in enumerate(out):
            assert abs(r["x"] - (LON[k] / 10 + 3)) < 2e-8
            assert abs(r["y"] - LAT[k]) < 2e-8

    def test_reproject_between_projected(self, spark):
        # webmercator -> UTM without going through explicit lonlat columns
        df = spark.createDataFrame([(0, 334111.17, 5621521.49)],
                                   "i long, x double, y double")
        got = crs.reproject(df, "webmercator", "utm31n").collect()[0]
        lo, la = crs.inverse_np(crs.WEB_MERCATOR, [334111.17], [5621521.49])
        X, Y = crs.forward_np(crs.utm(31), lo, la)
        assert abs(got["x"] - X[0]) < 1e-6 and abs(got["y"] - Y[0]) < 1e-6


class TestSqlBackend:
    @pytest.mark.parametrize("c", [
        crs.WEB_MERCATOR, crs.utm(31), crs.NSIDC_NORTH, crs.GALL_PETERS])
    def test_sql_matches_numpy(self, c):
        lat = LAT[:64] if c is not crs.NSIDC_NORTH else np.abs(LAT[:64]) / 2 + 45.0
        lon = LON[:64] if c.kind != "tmerc" else LON[:64] / 10.0 + 3.0
        con = duckdb.connect()
        con.execute("CREATE TABLE pts AS SELECT i, CAST(lon AS DOUBLE) AS lon, "
                    "CAST(lat AS DOUBLE) AS lat FROM (VALUES " +
                    ",".join(f"({i}, {lon[i]!r}, {lat[i]!r})" for i in range(64)) +
                    ") t(i, lon, lat)")
        xs, ys = crs.forward_sql(c, "lon", "lat")
        rows = con.execute(
            f"SELECT i, {xs} AS x, {ys} AS y FROM pts ORDER BY i").fetchall()
        X, Y = crs.forward_np(c, lon, lat)
        for i, x, y in rows:
            assert abs(x - X[i]) < 1e-6 and abs(y - Y[i]) < 1e-6

    def test_inverse_sql_matches_numpy(self):
        c = crs.utm(31)
        X, Y = crs.forward_np(c, LON[:32] / 10.0 + 3.0, LAT[:32])
        con = duckdb.connect()
        con.execute("CREATE TABLE pts AS SELECT i, CAST(x AS DOUBLE) AS x, "
                    "CAST(y AS DOUBLE) AS y FROM (VALUES " +
                    ",".join(f"({i}, {X[i]!r}, {Y[i]!r})" for i in range(32)) +
                    ") t(i, x, y)")
        lo_s, la_s = crs.inverse_sql(c, "x", "y")
        rows = con.execute(
            f"SELECT i, {lo_s} AS lon, {la_s} AS lat FROM pts ORDER BY i").fetchall()
        lo, la = crs.inverse_np(c, X, Y)
        for i, lon_v, lat_v in rows:
            assert abs(lon_v - lo[i]) < 1e-9 and abs(lat_v - la[i]) < 1e-9
