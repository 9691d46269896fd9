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


def _dms(d, m, s):
    return d + m / 60.0 + s / 3600.0


GUAM = C.from_proj4(
    f"+proj=aeqd +guam +lat_0={_dms(13, 28, 20.87887)!r} "
    f"+lon_0={_dms(144, 44, 55.50254)!r} "
    "+x_0=50000 +y_0=50000 +ellps=clrk66")


class TestAeqdGuam:
    """Guam projection (+proj=aeqd +guam, EPSG method 9831) — pinned
    to the EPSG GN7-2 worked example (Guam 1963 SPCS, Clarke 1866)."""

    def test_epsg_worked_example(self):
        lat = _dms(13, 20, 20.53846)
        lon = _dms(144, 38, 7.19265)
        x, y = C.forward_np(GUAM, np.array([lon]), np.array([lat]))
        assert abs(x[0] - 37712.48) < 0.02
        assert abs(y[0] - 35242.00) < 0.02

    def test_inverse_roundtrip(self):
        lon = np.linspace(144.2, 145.2, 16)
        lat = np.linspace(13.0, 13.9, 16)
        x, y = C.forward_np(GUAM, lon, lat)
        lo, la = C.inverse_np(GUAM, x, y)
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)

    def test_proj4_roundtrip(self):
        g2 = C.from_proj4(C.to_proj4(GUAM))
        assert g2.kind == "aeqd_guam"
        assert np.allclose(g2.params, GUAM.params)

    def test_sql_twin_matches_numpy(self):
        lon = np.linspace(144.3, 145.1, 16)
        lat = np.linspace(13.1, 13.8, 16)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pts AS SELECT i, CAST(lon AS DOUBLE) AS lon, "
            "CAST(lat AS DOUBLE) AS lat FROM (VALUES "
            + ",".join(f"({i}, {lon[i]!r}, {lat[i]!r})" for i in range(16))
            + ") t(i, lon, lat)")
        xs, ys = C.forward_sql(GUAM, "lon", "lat")
        rows = con.execute(
            f"SELECT i, {xs} AS x, {ys} AS y FROM pts ORDER BY i").fetchall()
        X, Y = C.forward_np(GUAM, lon, lat)
        for i, x, y in rows:
            assert abs(x - X[i]) < 1e-6 and abs(y - Y[i]) < 1e-6


class TestKrovakCzech:
    """+czech flag: positive southing/westing (traditional S-JTSK
    sheets) = sign-flipped proj default (proj krovak.c)."""

    def test_czech_is_negated_default(self):
        base = C.from_proj4("+proj=krovak")
        cz = C.from_proj4("+proj=krovak +czech")
        lon = np.array([14.42076, 16.6, 17.25])
        lat = np.array([50.08804, 49.2, 49.95])
        x0, y0 = C.forward_np(base, lon, lat)
        x1, y1 = C.forward_np(cz, lon, lat)
        assert np.allclose(x1, -x0) and np.allclose(y1, -y0)
        assert (x1 > 0).all() and (y1 > 0).all()  # positive sheet coords

    def test_czech_inverse_roundtrip(self):
        cz = C.from_proj4("+proj=krovak +czech")
        lon = np.linspace(12.5, 18.5, 12)
        lat = np.linspace(48.6, 50.9, 12)
        x, y = C.forward_np(cz, lon, lat)
        lo, la = C.inverse_np(cz, x, y)
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)

    def test_proj4_roundtrip_keeps_flag(self):
        cz = C.from_proj4("+proj=krovak +czech")
        s = C.to_proj4(cz)
        assert "+czech" in s
        cz2 = C.from_proj4(s)
        assert np.allclose(cz2.params, cz.params)


class TestOmercTwoPoint:
    """Two-point Hotine form -> azimuth-form conversion, validated by
    geometry: the azimuth form's own centerline points, fed back as
    +lat_1/+lon_1/+lat_2/+lon_2, must reproduce the same projection."""

    AZ = C.from_proj4("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582 "
                      "+k_0=0.99984 +ellps=GRS80 +no_off")

    def _two_point_from_centerline(self):
        import math
        g = self.AZ.params[3] * math.pi / 180.0
        pts = []
        for u in (300000.0, -250000.0):
            lo, la = C.inverse_np(self.AZ, np.array([u * math.sin(g)]),
                                  np.array([u * math.cos(g)]))
            pts.append((lo[0], la[0]))
        (lo1, la1), (lo2, la2) = pts
        return C.from_proj4(
            f"+proj=omerc +lat_0=4 +lat_1={la1!r} +lon_1={lo1!r} "
            f"+lat_2={la2!r} +lon_2={lo2!r} +k_0=0.99984 "
            "+ellps=GRS80 +no_off")

    def test_recovers_azimuth_form(self):
        tp = self._two_point_from_centerline()
        assert tp.kind == "omerc"
        # recovered lonc/alpha match the generating azimuth form
        assert abs(tp.params[1] - 115.0) < 1e-8
        assert abs(tp.params[2] - 53.31582) < 1e-7

    def test_defining_points_on_centerline(self):
        import math
        tp = self._two_point_from_centerline()
        g = tp.params[3] * math.pi / 180.0
        pts = []
        for u in (300000.0, -250000.0):
            lo, la = C.inverse_np(self.AZ, np.array([u * math.sin(g)]),
                                  np.array([u * math.cos(g)]))
            pts.append((lo[0], la[0]))
        lons = np.array([p[0] for p in pts])
        lats = np.array([p[1] for p in pts])
        x, y = C.forward_np(tp, lons, lats)
        v = x * math.cos(g) - y * math.sin(g)
        u = y * math.cos(g) + x * math.sin(g)
        assert np.allclose(v, 0.0, atol=1e-4)  # sub-0.1mm off the line
        assert np.allclose(u, [300000.0, -250000.0], atol=1e-3)

    def test_inverse_roundtrip(self):
        tp = self._two_point_from_centerline()
        lon = np.linspace(110.0, 120.0, 10)
        lat = np.linspace(0.0, 8.0, 10)
        x, y = C.forward_np(tp, lon, lat)
        lo, la = C.inverse_np(tp, x, y)
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)
