"""Interop tests against the reference repo's REAL fixture files
(tests/data — shapefiles written by shapelib-era tooling, GeoJSON, GPX,
ESRI ASCII).  Unlike the roundtrip tests (which only prove we can read
what we write), these prove the pure-python readers parse files produced
by other software.  Skipped when the reference checkout is absent, so the
repo stays self-contained.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixture checkout not present")


class TestShapefileFixtures:
    def test_points_with_dbf_attrs(self, spark):
        """shapefile/points.shp — the reference's 4-point species fixture
        (shapefile_tests.py:27-30)."""
        from karta_spark.sources import shapefile
        r = shapefile.read_shapefile(spark, f"{DATA}/shapefile/points")
        rows = sorted(((p["x"], p["y"]), p["properties"]["species"])
                      for p in r["points"].collect())
        assert rows == [((1.0, 1.0), "T. officianale"), ((2.0, 2.0), "V. cracca"),
                        ((3.0, 1.0), "C. tectorum"), ((4.0, 3.0), "M. alba")]

    def test_line_and_polygon(self, spark):
        """shapefile/line.shp + polygon.shp (shapefile_tests.py:32-38)."""
        from karta_spark.sources import shapefile
        want = [(1.0, 5.0), (5.0, 5.0), (5.0, 1.0), (3.0, 3.0), (1.0, 1.0)]
        line = shapefile.read_shapefile(spark, f"{DATA}/shapefile/line")["lines"].first()
        assert [(v["x"], v["y"]) for v in line["vertices"]] == want
        poly = shapefile.read_shapefile(spark, f"{DATA}/shapefile/polygon")["polygons"].first()
        assert [(v["x"], v["y"]) for v in poly["outer"]] == want
        assert poly["holes"] == []

    def test_newp_mooring_data(self, spark):
        """newp.shp — real mooring records; the NSIDC-projected variant
        carries projected coordinates readable alongside DBF attributes."""
        from karta_spark.sources import shapefile
        pts = shapefile.read_shapefile(spark, f"{DATA}/newp")["points"]
        assert pts.count() == 11
        first = pts.orderBy("geom_id").first()
        assert first["properties"]["mooring"] == "NEW A/1"
        proj = shapefile.read_shapefile(
            spark, f"{DATA}/shapefile/newp_nsidc_north")["points"]
        rows = proj.orderBy("geom_id").collect()
        assert len(rows) == 11
        assert rows[0]["x"] == pytest.approx(521236.8297444395)
        assert rows[0]["y"] == pytest.approx(-888853.1384770898)
        # inverse-project the NSIDC coordinates back to lonlat: they must
        # land near the unprojected newp.shp lonlat points
        from karta_spark.functions import crs as C
        lon, lat = C.inverse_np(C.NSIDC_NORTH,
                                np.array([r["x"] for r in rows]),
                                np.array([r["y"] for r in rows]))
        ll = pts.orderBy("geom_id").collect()
        assert np.allclose(lon, [r["x"] for r in ll], atol=2e-2)
        assert np.allclose(lat, [r["y"] for r in ll], atol=2e-2)


class TestGeoJSONFixtures:
    def _raw(self, name):
        with open(f"{DATA}/geojson_input/{name}") as f:
            return json.load(f)

    def test_simple_geometries(self, spark):
        """Every simple-geometry fixture parses and coordinates match a
        stdlib-json independent parse."""
        from karta_spark.sources import geojson
        g = geojson.read_geojson(spark, f"{DATA}/geojson_input/point.json")
        raw = self._raw("point.json")["coordinates"]
        p = g["points"].first()
        assert (p["x"], p["y"]) == (raw[0], raw[1])

        g = geojson.read_geojson(spark, f"{DATA}/geojson_input/linestring.json")
        raw = self._raw("linestring.json")["coordinates"]
        got = [(v["x"], v["y"]) for v in g["lines"].first()["vertices"]]
        assert got == [(c[0], c[1]) for c in raw]

        g = geojson.read_geojson(spark, f"{DATA}/geojson_input/multipolygon.json")
        raw = self._raw("multipolygon.json")["coordinates"]
        polys = g["polygons"].orderBy("geom_id").collect()
        assert len(polys) == len(raw)
        got0 = [(v["x"], v["y"]) for v in polys[0]["outer"]]
        want0 = [(c[0], c[1]) for c in raw[0][0]]
        # ring closure convention: the reader may drop a closing duplicate
        assert got0 == want0 or got0 == want0[:-1]

    def test_multipoint_vertices_fixture(self, spark):
        """testgeojson.json is the 20-vertex Multipoint fixture shared with
        geometry_tests.py (geojson_tests.py reads the same file)."""
        from karta_spark.sources import geojson
        g = geojson.read_geojson(spark, f"{DATA}/../data/testgeojson.json")
        pts = sorted((p["x"], p["y"]) for p in g["points"].collect())
        raw = self._raw("../testgeojson.json")["geometry"]["coordinates"]
        assert pts == sorted((c[0], c[1]) for c in raw)

    def test_us_capitols_multipoint_feature(self, spark):
        """A real-world Feature wrapping a 51-capitol MultiPoint: every
        coordinate matches the stdlib parse."""
        from karta_spark.sources import geojson
        raw = self._raw("us-capitols.json")["geometry"]["coordinates"]
        g = geojson.read_geojson(spark, f"{DATA}/geojson_input/us-capitols.json")
        got = sorted((p["x"], p["y"]) for p in g["points"].collect())
        assert got == sorted((c[0], c[1]) for c in raw)
        assert len(got) == 51


class TestGpxAaiFixtures:
    def test_fishermans_trail(self, spark):
        """Real GPX track: point count and first trackpoint vs an
        independent ElementTree parse."""
        from karta_spark.sources import gpx
        g = gpx.read_gpx(spark, f"{DATA}/gpx_input/fishermans-trail.gpx")
        ns = {"gpx": "http://www.topografix.com/GPX/1/1"}
        root = ET.parse(f"{DATA}/gpx_input/fishermans-trail.gpx").getroot()
        raw_pts = root.findall(".//gpx:trkpt", ns)
        track = g["tracks"].first()
        got = [(v["x"], v["y"]) for v in track["vertices"]]
        assert len(got) == len(raw_pts)
        assert got[0] == (float(raw_pts[0].get("lon")), float(raw_pts[0].get("lat")))

    def test_peaks49_center_and_corner(self, spark):
        """peaks49_center.asc / _corner.asc: same data, XLLCENTER vs
        XLLCORNER headers — both land on the same cell values and the
        transforms differ by half a cell (aai_tests.py semantics)."""
        from karta_spark.raster import tiles as T
        from karta_spark.sources import aai
        vc, tc, _ = T.df_to_grid(aai.read_aai(spark, f"{DATA}/peaks49_center.asc", "c"))
        vk, tk, _ = T.df_to_grid(aai.read_aai(spark, f"{DATA}/peaks49_corner.asc", "k"))
        raw = np.loadtxt(f"{DATA}/peaks49_center.asc", skiprows=6)[::-1]
        assert vc.shape == (49, 49) and np.allclose(vc, raw, equal_nan=True)
        assert np.allclose(vc, vk, equal_nan=True)
        assert tc[2:4] == (30.0, 30.0) and tk[2:4] == (30.0, 30.0)
        assert (tc[0] - tk[0], tc[1] - tk[1]) == (0.0, 0.0) or \
               (abs(tc[0] - tk[0]) == 15.0 and abs(tc[1] - tk[1]) == 15.0)
