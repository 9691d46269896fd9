"""Round-7 projection breadth: plain oblique/equatorial stereographic
(+proj=stere with |lat_0| < 90, the PROJ OBLIQ/EQUIT arms — Snyder
21-27..21-31 / 21-38..21-40) and equidistant conic (+proj=eqdc, Snyder
ch. 16).  The reference reaches both through arbitrary proj.4 strings
(reference crs.py:248-306); the registry previously raised on them.

No pyproj in this sandbox, so the pins are the projections' DEFINING
invariants, which identify them uniquely:
- stere_obl: conformality (isotropic scale + orthogonality) at sample
  points, k0 scale at the origin, exact agreement with the hand-coded
  Snyder sphere formulas when e=0, fwd/inv roundtrip;
- eqdc: true scale along every meridian (projected radial distance ==
  ellipsoidal meridian arc), true scale on both standard parallels,
  hand-coded Snyder sphere formulas when e=0, fwd/inv roundtrip.
"""
import math

import duckdb
import numpy as np
import pytest

from karta_spark.functions import crs as C
from karta_spark.functions.crs import _NpOps, _meridian_arc


STERE_OBL = C.from_proj4(
    "+proj=stere +lat_0=52 +lon_0=6 +k_0=0.9999 "
    "+x_0=155000 +y_0=463000 +ellps=bessel")
EQDC_CONUS = C.from_proj4(
    "+proj=eqdc +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=clrk66")


class TestObliqueStere:
    def test_from_proj4_kind(self):
        assert STERE_OBL.kind == "stere_obl"
        assert STERE_OBL.params[:5] == (52.0, 6.0, 0.9999, 155000.0, 463000.0)

    def test_equatorial_aspect_parses(self):
        g = C.from_proj4("+proj=stere +lat_0=0 +lon_0=-70")
        assert g.kind == "stere_obl" and g.params[0] == 0.0

    def test_polar_still_routes_to_polar(self):
        g = C.from_proj4("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45")
        assert g.kind == "stere"

    def test_roundtrip(self):
        lon = np.array([6.0, 5.0, 8.5, 2.0, 6.0, -10.0])
        lat = np.array([52.0, 50.0, 54.0, 55.0, 40.0, 61.0])
        x, y = C.forward_np(STERE_OBL, lon, lat)
        lo, la = C.inverse_np(STERE_OBL, x, y)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9

    def test_origin_maps_to_false_offsets_at_k0(self):
        x, y = C.forward_np(STERE_OBL, 6.0, 52.0)
        assert x == pytest.approx(155000.0, abs=1e-6)
        assert y == pytest.approx(463000.0, abs=1e-6)
        # scale at the origin is k0 (conformal: any direction)
        eps = 1e-5   # small enough for locality, large enough to dodge
        xs, ys = C.forward_np(STERE_OBL, np.array([6.0, 6.0]),
                              np.array([52.0, 52.0 + eps]))
        a, f = 6377397.155, 1.0 / 299.1528128
        e2 = f * (2 - f)
        phi = math.radians(52.0)
        M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
        ds_true = M * math.radians(eps)
        ds_proj = math.hypot(xs[1] - xs[0], ys[1] - ys[0])
        assert ds_proj / ds_true == pytest.approx(0.9999, abs=1e-6)

    def test_conformality(self):
        a, f = 6377397.155, 1.0 / 299.1528128
        e2 = f * (2 - f)
        for lon0, lat0 in [(6.0, 52.0), (3.0, 48.0), (9.0, 55.0),
                           (-20.0, 30.0)]:
            eps = 1e-6
            xs, ys = C.forward_np(
                STERE_OBL, np.array([lon0, lon0 + eps, lon0]),
                np.array([lat0, lat0, lat0 + eps]))
            dxl, dyl = xs[1] - xs[0], ys[1] - ys[0]
            phi = math.radians(lat0)
            M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            s = M / (N * math.cos(phi))
            dxp, dyp = (xs[2] - xs[0]) / s, (ys[2] - ys[0]) / s
            n1, n2 = math.hypot(dxl, dyl), math.hypot(dxp, dyp)
            assert n1 / n2 == pytest.approx(1.0, abs=1e-6)
            assert abs(dxl * dxp + dyl * dyp) / (n1 * n2) < 1e-6

    def test_sphere_matches_snyder_closed_form(self):
        # Snyder 21-2..21-4 coded independently here
        gs = C.from_proj4(
            "+proj=stere +lat_0=40 +lon_0=-100 +a=6370997 +b=6370997")
        R, k0 = 6370997.0, 1.0
        p1 = math.radians(40.0)
        lam = np.radians(np.array([-75.0, -110.0, -90.0, -100.0]))
        phi = np.radians(np.array([30.0, 50.0, -10.0, 40.0]))
        lam0 = math.radians(-100.0)
        k = 2 * k0 / (1 + math.sin(p1) * np.sin(phi)
                      + math.cos(p1) * np.cos(phi) * np.cos(lam - lam0))
        xs = R * k * np.cos(phi) * np.sin(lam - lam0)
        ys = R * k * (math.cos(p1) * np.sin(phi)
                      - math.sin(p1) * np.cos(phi) * np.cos(lam - lam0))
        xg, yg = C.forward_np(gs, np.degrees(lam), np.degrees(phi))
        assert np.abs(xg - xs).max() < 1e-6
        assert np.abs(yg - ys).max() < 1e-6

    def test_proj4_and_wkt_roundtrip(self):
        p4 = C.to_proj4(STERE_OBL)
        assert "+proj=stere " in p4 and "+lat_0=52" in p4
        g2 = C.from_proj4(p4)
        assert g2.kind == "stere_obl" and g2.params == STERE_OBL.params
        w = C.to_wkt(STERE_OBL)
        assert '"Stereographic"' in w
        g3 = C.from_wkt(w)
        assert g3.kind == "stere_obl"
        assert np.allclose(g3.params, STERE_OBL.params)

    def test_sql_twin_matches_numpy(self):
        lon = np.linspace(-10.0, 20.0, 32)
        lat = np.linspace(40.0, 60.0, 32)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pts AS SELECT i, CAST(lon AS DOUBLE) AS lon, "
            "CAST(lat AS DOUBLE) AS lat FROM (VALUES "
            + ",".join(f"({i}, {lon[i]!r}, {lat[i]!r})" for i in range(32))
            + ") t(i, lon, lat)")
        xs, ys = C.forward_sql(STERE_OBL, "lon", "lat")
        rows = con.execute(
            f"SELECT i, {xs} AS x, {ys} AS y FROM pts ORDER BY i").fetchall()
        X, Y = C.forward_np(STERE_OBL, lon, lat)
        for i, x, y in rows:
            assert abs(x - X[i]) < 1e-6 and abs(y - Y[i]) < 1e-6


class TestEquidistantConic:
    def test_from_proj4_kind(self):
        assert EQDC_CONUS.kind == "eqdc"
        assert EQDC_CONUS.params[:4] == (29.5, 45.5, 23.0, -96.0)

    def test_roundtrip(self):
        lon = np.array([-75.0, -96.0, -120.0, -96.0, -60.0])
        lat = np.array([35.0, 23.0, 45.0, 60.0, 10.0])
        x, y = C.forward_np(EQDC_CONUS, lon, lat)
        lo, la = C.inverse_np(EQDC_CONUS, x, y)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-8

    def test_meridian_equidistance(self):
        # the defining property: projected distance along a meridian
        # equals the ellipsoidal meridian arc length
        a, f = EQDC_CONUS.params[6], EQDC_CONUS.params[7]
        e2 = f * (2 - f)
        for lam in (-96.0, -75.0, -120.0):
            x1, y1 = C.forward_np(EQDC_CONUS, lam, 30.0)
            x2, y2 = C.forward_np(EQDC_CONUS, lam, 42.0)
            d_proj = math.hypot(x2 - x1, y2 - y1)
            d_arc = float(
                _meridian_arc(_NpOps, np.radians(42.0), a, e2)
                - _meridian_arc(_NpOps, np.radians(30.0), a, e2))
            assert d_proj == pytest.approx(d_arc, abs=1e-6)

    def test_true_scale_on_both_standard_parallels(self):
        a, f = EQDC_CONUS.params[6], EQDC_CONUS.params[7]
        e2 = f * (2 - f)
        dlam = 0.01
        for lat1 in (29.5, 45.5):
            xA, yA = C.forward_np(EQDC_CONUS, -96.0, lat1)
            xB, yB = C.forward_np(EQDC_CONUS, -96.0 + dlam, lat1)
            m1 = math.cos(math.radians(lat1)) / math.sqrt(
                1 - e2 * math.sin(math.radians(lat1)) ** 2)
            true_len = a * m1 * math.radians(dlam)
            # chord vs arc differs at O((n dlam)^2) ~ 1e-9 relative here
            assert math.hypot(xB - xA, yB - yA) == pytest.approx(
                true_len, rel=1e-7)

    def test_sphere_matches_snyder_closed_form(self):
        # Snyder 16-1..16-4 (sphere) coded independently here
        gs = C.from_proj4(
            "+proj=eqdc +lat_1=20 +lat_2=60 +lat_0=0 +lon_0=-100 "
            "+a=6370997 +b=6370997")
        R = 6370997.0
        p1, p2 = math.radians(20.0), math.radians(60.0)
        n = (math.cos(p1) - math.cos(p2)) / (p2 - p1)
        G = math.cos(p1) / n + p1
        lam = np.radians(np.array([-75.0, -110.0, -90.0]))
        phi = np.radians(np.array([30.0, 50.0, -10.0]))
        lam0 = math.radians(-100.0)
        rho = R * (G - phi)
        rho0 = R * (G - 0.0)
        th = n * (lam - lam0)
        xs = rho * np.sin(th)
        ys = rho0 - rho * np.cos(th)
        xg, yg = C.forward_np(gs, np.degrees(lam), np.degrees(phi))
        assert np.abs(xg - xs).max() < 1e-6
        assert np.abs(yg - ys).max() < 1e-6

    def test_southern_hemisphere_parallels(self):
        g = C.from_proj4("+proj=eqdc +lat_1=-20 +lat_2=-50 +lat_0=-30 "
                         "+lon_0=135")
        lon = np.array([135.0, 150.0, 115.0])
        lat = np.array([-30.0, -15.0, -45.0])
        x, y = C.forward_np(g, lon, lat)
        lo, la = C.inverse_np(g, x, y)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-8

    def test_single_parallel_and_degenerate(self):
        g = C.from_proj4("+proj=eqdc +lat_1=40 +lat_2=40 +lat_0=40 +lon_0=0")
        x, y = C.forward_np(g, 1.0, 41.0)
        lo, la = C.inverse_np(g, x, y)
        assert lo == pytest.approx(1.0, abs=1e-9)
        assert la == pytest.approx(41.0, abs=1e-8)
        bad = C.from_proj4("+proj=eqdc +lat_1=-30 +lat_2=30 +lon_0=0")
        with pytest.raises(ValueError, match="degenerates"):
            C.forward_np(bad, 1.0, 1.0)

    def test_proj4_and_wkt_roundtrip(self):
        p4 = C.to_proj4(EQDC_CONUS)
        assert "+proj=eqdc" in p4 and "+lat_1=29.5" in p4
        g2 = C.from_proj4(p4)
        assert g2.kind == "eqdc" and g2.params == EQDC_CONUS.params
        w = C.to_wkt(EQDC_CONUS)
        assert '"Equidistant_Conic"' in w
        g3 = C.from_wkt(w)
        assert g3.kind == "eqdc"
        assert np.allclose(g3.params, EQDC_CONUS.params)

    def test_sql_twin_matches_numpy(self):
        lon = np.linspace(-120.0, -70.0, 32)
        lat = np.linspace(22.0, 50.0, 32)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pts AS SELECT i, CAST(lon AS DOUBLE) AS lon, "
            "CAST(lat AS DOUBLE) AS lat FROM (VALUES "
            + ",".join(f"({i}, {lon[i]!r}, {lat[i]!r})" for i in range(32))
            + ") t(i, lon, lat)")
        xs, ys = C.forward_sql(EQDC_CONUS, "lon", "lat")
        rows = con.execute(
            f"SELECT i, {xs} AS x, {ys} AS y FROM pts ORDER BY i").fetchall()
        X, Y = C.forward_np(EQDC_CONUS, lon, lat)
        for i, x, y in rows:
            assert abs(x - X[i]) < 1e-6 and abs(y - Y[i]) < 1e-6
