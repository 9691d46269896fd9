"""Tests for stencils, dateline bbox, intersections op, clip/extent/profile,
GeoJSON and AAI sources."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from karta_spark.functions import geometry as geom
from karta_spark.functions.kernels import geographic_bbox
from karta_spark.operators import intersect_join
from karta_spark.raster import sampling, stencil, tiles
from karta_spark.sources import aai, geojson

T1 = (0.0, 0.0, 1.0, 1.0, 0.0, 0.0)


def _ref_derivs(D, dx, dy):
    Ddx = ((2 * D[1:-1, 2:] + D[:-2, 2:] + D[2:, 2:])
           - (2 * D[1:-1, :-2] + D[:-2, :-2] + D[2:, :-2])) / (8.0 * dx)
    Ddy = ((2 * D[2:, 1:-1] + D[2:, 2:] + D[2:, :-2])
           - (2 * D[:-2, 1:-1] + D[:-2, :-2] + D[:-2, 2:])) / (8.0 * dy)
    return Ddx, Ddy


def _ref_slope(D, dx=1.0, dy=1.0):
    Ddx, Ddy = _ref_derivs(D, dx, dy)
    return np.pad(np.sqrt(Ddx ** 2 + Ddy ** 2), ((1, 1), (1, 1)),
                  "reflect", reflect_type="odd")


def _ref_aspect(D, dx=1.0, dy=1.0):
    Ddx, Ddy = _ref_derivs(D, dx, dy)
    return np.pad(np.arctan2(Ddy, -Ddx), ((1, 1), (1, 1)),
                  "constant", constant_values=(np.nan,))


class TestStencils:
    def _grid(self, spark, tile=8):
        rng = np.random.default_rng(11)
        Z = np.cumsum(rng.standard_normal((24, 24)), axis=0)
        return Z, tiles.grid_to_df(spark, "g", Z, T1, tile=tile)

    def test_slope_matches_reference(self, spark):
        Z, g = self._grid(spark)
        got, _, _ = tiles.df_to_grid(stencil.slope(g))
        np.testing.assert_allclose(got, _ref_slope(Z), rtol=1e-12, equal_nan=True)

    def test_aspect_matches_reference(self, spark):
        Z, g = self._grid(spark)
        got, _, _ = tiles.df_to_grid(stencil.aspect(g))
        np.testing.assert_allclose(got, _ref_aspect(Z), rtol=1e-12, equal_nan=True)

    def test_gradient_tiling_invariance(self, spark):
        Z, g8 = self._grid(spark, tile=8)
        _, g256 = self._grid(spark, tile=256)
        a, _, _ = tiles.df_to_grid(stencil.gradient(g8)[0])
        b, _, _ = tiles.df_to_grid(stencil.gradient(g256)[0])
        np.testing.assert_allclose(a, b, equal_nan=True)

    def test_hillshade_range(self, spark):
        Z, g = self._grid(spark)
        got, _, _ = tiles.df_to_grid(stencil.hillshade(g))
        v = got[~np.isnan(got)]
        # light vector isn't unit (|s| = sqrt(1+sin^2 el), as in reference)
        assert len(v) > 0 and np.all(np.abs(v) <= np.sqrt(2.0))
        # clip actually applied: no value outside the 2/98 percentile span
        assert v.max() - v.min() <= np.sqrt(2.0) * 2


class TestDatelineBbox:
    def test_quad_golden(self):
        # dateline_tests.py:40-46
        bb = geographic_bbox([(179, -1), (-179, -1), (-179, 1), (179, 1)], ring=True)
        assert (bb[0], bb[2]) == (179, -179)
        assert bb[1] == pytest.approx(-1.000152297, abs=1e-8)
        assert bb[3] == pytest.approx(1.000152297, abs=1e-8)

    def test_df_op(self, spark):
        df = spark.createDataFrame(
            [(0, [{"x": 179.0, "y": -1.0}, {"x": -179.0, "y": -1.0},
                  {"x": -179.0, "y": 1.0}, {"x": 179.0, "y": 1.0}])],
            "geom_id long, vertices array<struct<x:double,y:double>>")
        r = geom.geographic_bbox_df(df, ring=True).collect()[0]
        assert (r["xmin"], r["xmax"]) == (179.0, -179.0)


class TestIntersectionsOp:
    def test_crossing_points(self, spark):
        members = spark.createDataFrame(
            [(0, [{"x": 0.0, "y": 0.0}, {"x": 3.0, "y": 3.0}]),
             (1, [{"x": 10.0, "y": 10.0}, {"x": 11.0, "y": 11.0}])],
            "geom_id long, vertices array<struct<x:double,y:double>>")
        got = intersect_join.intersection_points(
            members, np.array([(0.0, 3.0), (3.0, 0.0)])).collect()
        assert len(got) == 1
        assert (got[0]["geom_id"], got[0]["ix"], got[0]["iy"]) == (0, 1.5, 1.5)

    def test_polygon_pair_points(self, spark):
        # vector_predicate_tests.py:69-81: two squares -> (0,1) and (1,3)
        members = spark.createDataFrame(
            [(0, [{"x": 0.0, "y": 0.0}, {"x": 3.0, "y": 0.0},
                  {"x": 3.0, "y": 3.0}, {"x": 0.0, "y": 3.0}])],
            "geom_id long, vertices array<struct<x:double,y:double>>")
        tgt = np.array([(1.0, 4.0), (-2.0, 4.0), (-2.0, 1.0), (1.0, 1.0)])
        got = sorted((r["ix"], r["iy"]) for r in intersect_join.intersection_points(
            members, tgt, target_closed=True, members_closed=True).collect())
        assert got == [(0.0, 1.0), (1.0, 3.0)]

    def test_within_distance(self, spark):
        # vector_predicate_tests.py:192-197
        members = spark.createDataFrame(
            [(0, [{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 1.0}, {"x": 3.0, "y": 1.0}])],
            "geom_id long, vertices array<struct<x:double,y:double>>")
        assert intersect_join.within_distance_join(members, 1.0, 1.5, 0.6).count() == 1
        assert intersect_join.within_distance_join(members, 1.0, 1.5, 0.4).count() == 0


class TestClipExtentProfile:
    def test_clip(self, spark):
        Z = np.arange(100, dtype=float).reshape(10, 10)
        g = tiles.grid_to_df(spark, "g", Z, T1, tile=4)
        clipped = tiles.clip(g, 2.2, 7.8, 3.2, 8.8)
        vals, _, _ = tiles.df_to_grid(clipped)
        valid = ~np.isnan(vals)
        ii, jj = np.nonzero(valid)
        # kept cell centers must lie in the ceil/floor index window
        # reference index math (grid.py:553-556): i = ceil(2.7)..floor(8.3),
        # j = ceil(1.7)..floor(7.3)
        assert ii.min() == 3 and ii.max() == 8 and jj.min() == 2 and jj.max() == 7

    def test_data_extent(self, spark):
        Z = np.full((8, 8), np.nan)
        Z[2:5, 3:6] = 1.0
        g = tiles.grid_to_df(spark, "g", Z, T1, tile=4)
        r = tiles.data_extent(g).collect()[0]
        assert (r["xmin"], r["xmax"], r["ymin"], r["ymax"]) == (3.5, 5.5, 2.5, 4.5)

    def test_profile(self, spark):
        Z = np.tile(np.arange(10, dtype=float), (10, 1))  # value = col index
        g = tiles.grid_to_df(spark, "g", Z, T1)
        got = sampling.profile(g, T1, [(0.5, 5.0), (8.5, 5.0)], 1.0, "nearest").collect()
        assert [r["value"] for r in got] == [float(i) for i in range(9)]


class TestSources:
    GJ = """{"type": "FeatureCollection", "features": [
      {"type": "Feature", "properties": {"name": "sq"},
       "geometry": {"type": "Polygon",
         "coordinates": [[[0,0],[1,0],[1,1],[0,1],[0,0]],
                         [[0.2,0.2],[0.4,0.2],[0.3,0.4],[0.2,0.2]]]}},
      {"type": "Feature", "properties": {"name": "ln"},
       "geometry": {"type": "LineString", "coordinates": [[0,0],[2,2]]}},
      {"type": "Feature", "properties": {"name": "pt"},
       "geometry": {"type": "Point", "coordinates": [5, 6]}}]}"""

    def test_geojson_roundtrip(self, spark):
        layers = geojson.read_geojson(spark, self.GJ)
        assert layers["points"].count() == 1
        assert layers["lines"].count() == 1
        p = layers["polygons"].collect()[0]
        assert len(p["outer"]) == 4  # closing vertex dropped (karta convention)
        assert len(p["holes"]) == 1 and len(p["holes"][0]) == 3
        assert p["properties"]["name"] == "sq"
        out = geojson.to_geojson(points=layers["points"], lines=layers["lines"],
                                 polygons=layers["polygons"])
        again = geojson.read_geojson(spark, out)
        assert again["polygons"].collect()[0]["outer"] == p["outer"]

    def test_aai_roundtrip(self, spark, tmp_path):
        Z = np.arange(12, dtype=float).reshape(3, 4)
        Z[0, 0] = np.nan
        g = tiles.grid_to_df(spark, "g", Z, (10.0, 20.0, 2.0, 2.0, 0.0, 0.0))
        path = str(tmp_path / "t.asc")
        aai.to_aai(g, path)
        back = aai.read_aai(spark, path)
        vals, transform, _ = tiles.df_to_grid(back)
        assert transform == (10.0, 20.0, 2.0, 2.0, 0.0, 0.0)
        np.testing.assert_allclose(vals, Z, equal_nan=True)


class TestShapefile:
    def test_polygon_roundtrip(self, spark, tmp_path):
        from karta_spark.sources import shapefile
        df = spark.createDataFrame(
            [(0,
              [{"x": 0.0, "y": 0.0}, {"x": 4.0, "y": 0.0},
               {"x": 4.0, "y": 4.0}, {"x": 0.0, "y": 4.0}],
              [[{"x": 1.0, "y": 1.0}, {"x": 2.0, "y": 1.0}, {"x": 1.5, "y": 2.0}]],
              {"name": "sq"})],
            "geom_id long, outer array<struct<x:double,y:double>>, "
            "holes array<array<struct<x:double,y:double>>>, "
            "properties map<string,string>")
        stem = str(tmp_path / "layer")
        shapefile.write_shapefile(stem, polygons=df)
        back = shapefile.read_shapefile(spark, stem)
        p = back["polygons"].collect()[0]
        got_outer = {(v["x"], v["y"]) for v in p["outer"]}
        assert got_outer == {(0, 0), (4, 0), (4, 4), (0, 4)}
        assert len(p["holes"]) == 1 and len(p["holes"][0]) == 3
        assert p["properties"]["name"] == "sq"

    def test_points_roundtrip(self, spark, tmp_path):
        from karta_spark.sources import shapefile
        df = spark.createDataFrame(
            [(0, 1.5, 2.5, {"a": "x"}), (1, -3.0, 4.0, {"a": "y"})],
            "geom_id long, x double, y double, properties map<string,string>")
        stem = str(tmp_path / "pts")
        shapefile.write_shapefile(stem, points=df)
        back = shapefile.read_shapefile(spark, stem)["points"].orderBy("x").collect()
        assert [(r["x"], r["y"], r["properties"]["a"]) for r in back] == \
               [(-3.0, 4.0, "y"), (1.5, 2.5, "x")]

    def test_lines_roundtrip(self, spark, tmp_path):
        from karta_spark.sources import shapefile
        df = spark.createDataFrame(
            [(0, [{"x": 0.0, "y": 0.0}, {"x": 3.0, "y": 3.0}], {})],
            "geom_id long, vertices array<struct<x:double,y:double>>, "
            "properties map<string,string>")
        stem = str(tmp_path / "lin")
        shapefile.write_shapefile(stem, lines=df)
        back = shapefile.read_shapefile(spark, stem)["lines"].collect()
        assert [(v["x"], v["y"]) for v in back[0]["vertices"]] == [(0, 0), (3, 3)]


class TestGeodesicResample:
    def test_to_points_lonlat_golden(self, spark):
        # geometry_tests.py:513-529 (pyproj-derived golden list)
        df = spark.createDataFrame(
            [(0, [{"x": 0.0, "y": 38.0}, {"x": -10.5, "y": 33.0},
                  {"x": -6.0, "y": 35.0}])],
            "geom_id long, vertices array<struct<x:double,y:double>>")
        got = geom.to_points_geodesic_df(df, 100000.0).orderBy("sample_idx").collect()
        ans = [(0., 38.), (-1.00809817, 37.58554833), (-2.01066416, 37.17113146),
               (-3.00781084, 36.7567488), (-3.99964867, 36.34239982),
               (-4.98628577, 35.92808398), (-5.96782797, 35.51380078),
               (-6.94437893, 35.09954973), (-7.91604017, 34.68533037),
               (-8.88291117, 34.27114226), (-9.84508939, 33.85698498),
               (-10.80267038, 33.44285814), (-10.09466286, 33.19083929),
               (-9.15505703, 33.62895663), (-8.21064326, 34.0669835),
               (-7.26131724, 34.5049191), (-6.30697252, 34.94276264)]
        assert len(got) == len(ans)
        for r, (wx, wy) in zip(got, ans):
            assert r["x"] == pytest.approx(wx, abs=2e-7)
            assert r["y"] == pytest.approx(wy, abs=2e-7)


class TestBigBigLineJoin:
    def _lines(self, spark, seed, n):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            off = rng.uniform(-60, 60, 2)
            pts = rng.uniform(0, 8, (6, 2)) + off
            rows.append((i, [{"x": float(x), "y": float(y)} for x, y in pts]))
        return spark.createDataFrame(
            rows, "geom_id long, vertices array<struct<x:double,y:double>>")

    def test_matches_bruteforce(self, spark):
        from karta_spark.functions.kernels import polyline_intersects
        left = self._lines(spark, 1, 60)
        right = self._lines(spark, 2, 60)
        got = {(r["geom_id"], r["geom_id_r"]) for r in
               intersect_join.line_intersection_join(left, right, zoom=6).collect()}
        lv = {r["geom_id"]: np.array([[v["x"], v["y"]] for v in r["vertices"]])
              for r in left.collect()}
        rv = {r["geom_id"]: np.array([[v["x"], v["y"]] for v in r["vertices"]])
              for r in right.collect()}
        want = {(i, j) for i in lv for j in rv if polyline_intersects(lv[i], rv[j])}
        assert got == want and len(want) > 0

    def test_salted_variant_identical(self, spark):
        left = self._lines(spark, 3, 50)
        right = self._lines(spark, 4, 50)
        plain = {(r["geom_id"], r["geom_id_r"]) for r in
                 intersect_join.line_intersection_join(left, right, zoom=6).collect()}
        salted = {(r["geom_id"], r["geom_id_r"]) for r in
                  intersect_join.line_intersection_join(
                      left, right, zoom=6, salt_threshold=5).collect()}
        assert plain == salted


class TestGpxGeotiff:
    GPX_DOC = """<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1" creator="t">
      <wpt lon="-21.9" lat="64.1"><name>rvk</name><ele>10</ele></wpt>
      <wpt lon="18.1" lat="59.3"><name>sto</name></wpt>
      <trk><name>t1</name><trkseg>
        <trkpt lon="0.0" lat="0.0"/><trkpt lon="1.0" lat="1.0"/><trkpt lon="2.0" lat="1.5"/>
      </trkseg></trk>
    </gpx>"""

    def test_gpx_roundtrip(self, spark):
        from karta_spark.sources import gpx
        layers = gpx.read_gpx(spark, self.GPX_DOC)
        w = {r["properties"].get("name"): (r["x"], r["y"])
             for r in layers["waypoints"].collect()}
        assert w["rvk"] == (-21.9, 64.1) and w["sto"] == (18.1, 59.3)
        t = layers["tracks"].collect()[0]
        assert [(v["x"], v["y"]) for v in t["vertices"]] == [(0, 0), (1, 1), (2, 1.5)]
        assert t["properties"]["name"] == "t1"
        again = gpx.read_gpx(spark, gpx.to_gpx(
            waypoints=layers["waypoints"], tracks=layers["tracks"]))
        assert again["waypoints"].count() == 2 and again["tracks"].count() == 1

    def test_geotiff_roundtrip(self, spark, tmp_path):
        from karta_spark.sources import geotiff
        rng = np.random.default_rng(8)
        Z = rng.uniform(0, 100, (12, 9))
        g = tiles.grid_to_df(spark, "g", Z, (500.0, 4000.0, 30.0, 30.0, 0.0, 0.0))
        p = str(tmp_path / "t.tif")
        geotiff.write_geotiff(p, g)
        back = geotiff.read_geotiff(spark, p)
        vals, transform, _ = tiles.df_to_grid(back)
        assert transform == (500.0, 4000.0, 30.0, 30.0, 0.0, 0.0)
        np.testing.assert_allclose(vals, Z)

    def test_geotiff_int_dtype(self, spark, tmp_path):
        from karta_spark.sources import geotiff
        Z = np.arange(20, dtype=float).reshape(4, 5)
        g = tiles.grid_to_df(spark, "g", Z, (0.0, 0.0, 1.0, 1.0, 0.0, 0.0))
        p = str(tmp_path / "i.tif")
        geotiff.write_geotiff(p, g, dtype=np.int32)
        vals, _, _ = tiles.df_to_grid(geotiff.read_geotiff(spark, p))
        np.testing.assert_allclose(vals, Z)


class TestGeoTiffCompressedMultiband:
    """Round-2 additions: Deflate/PackBits strips, predictor=2, and chunky
    multi-band read (SamplesPerPixel tag 277) — reference reads these via
    GDAL (_gdal.py:114-188)."""

    def _grid(self, spark):
        import numpy as np
        from karta_spark.raster.tiles import grid_to_df
        rng = np.random.default_rng(4)
        Z = rng.uniform(-50, 50, size=(13, 9)).round(3)
        return Z, grid_to_df(spark, "g", Z, (2.0, 3.0, 0.5, 0.25, 0.0, 0.0), tile=8)

    def test_packbits_codec_adversarial(self):
        import numpy as np
        from karta_spark.sources.geotiff import packbits_decode, packbits_encode
        rng = np.random.default_rng(1)
        cases = [
            b"", b"\x00", b"a" * 1, b"a" * 2, b"a" * 3, b"a" * 128, b"a" * 129,
            b"a" * 300, b"abab" * 70, bytes(rng.integers(0, 4, 1000, dtype=np.uint8)),
            b"ab" + b"c" * 200 + b"de" + b"f" * 2 + b"xyz",
        ]
        for c in cases:
            assert packbits_decode(packbits_encode(c), len(c)) == c

    def test_deflate_roundtrip(self, spark, tmp_path):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        Z, tiles = self._grid(spark)
        p = str(tmp_path / "z.tif")
        geotiff.write_geotiff(p, tiles, compress="deflate")
        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=8))
        assert np.array_equal(back, Z)
        assert t[:4] == (2.0, 3.0, 0.5, 0.25)

    def test_packbits_roundtrip(self, spark, tmp_path):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        Z, tiles = self._grid(spark)
        p = str(tmp_path / "p.tif")
        geotiff.write_geotiff(p, tiles, compress="packbits", dtype=np.int32)
        back, _, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=8))
        assert np.array_equal(back, np.trunc(Z))  # int32 write truncates

    def test_multiband_chunky_read(self, spark, tmp_path):
        """Hand-built 2-band chunky uint16 TIFF with deflate + predictor=2,
        multiple strips."""
        import struct, zlib
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        ny, nx, spp = 6, 5, 2
        rng = np.random.default_rng(9)
        A = rng.integers(0, 60000, (ny, nx, spp)).astype(np.uint16)
        rows_per_strip = 2
        strips = []
        for s0 in range(0, ny, rows_per_strip):
            strip = A[s0:s0 + rows_per_strip]
            diff = np.empty_like(strip)
            diff[:, 0] = strip[:, 0]
            diff[:, 1:] = strip[:, 1:] - strip[:, :-1]  # predictor 2 (wraps)
            strips.append(zlib.compress(diff.tobytes()))

        def entry(tag, ftype, count, value):
            return struct.pack("<HHI4s", tag, ftype, count, value)

        vl = lambda v: struct.pack("<I", v)
        vs = lambda v: struct.pack("<HH", v, 0)
        n_entries = 13
        ifd_off = 8
        ext_off = ifd_off + 2 + n_entries * 12 + 4
        bits_off = ext_off
        scale_off = bits_off + 2 * spp
        tie_off = scale_off + 24
        off_off = tie_off + 48
        cnt_off = off_off + 4 * len(strips)
        data_off = cnt_off + 4 * len(strips)
        offs, pos = [], data_off
        for s in strips:
            offs.append(pos); pos += len(s)
        entries = [
            entry(256, 4, 1, vl(nx)), entry(257, 4, 1, vl(ny)),
            entry(258, 3, spp, struct.pack('<HH', 16, 16)),  # inline (4 bytes)
            entry(259, 3, 1, vs(8)),            # deflate
            entry(262, 3, 1, vs(1)),
            entry(273, 4, len(strips), vl(off_off)),
            entry(277, 3, 1, vs(spp)),
            entry(278, 4, 1, vl(rows_per_strip)),
            entry(279, 4, len(strips), vl(cnt_off)),
            entry(317, 3, 1, vs(2)),            # predictor: horizontal diff
            entry(339, 3, 1, vs(1)),
            entry(33550, 12, 3, vl(scale_off)),
            entry(33922, 12, 6, vl(tie_off)),
        ]
        p = str(tmp_path / "mb.tif")
        with open(p, "wb") as f:
            f.write(b"II*\x00" + struct.pack("<I", ifd_off))
            f.write(struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0))
            f.write(struct.pack(f"<{spp}H", *([16] * spp)))
            f.write(struct.pack("<3d", 1.0, 1.0, 0.0))
            f.write(struct.pack("<6d", 0, 0, 0, 10.0, 20.0 + ny * 1.0, 0))
            f.write(struct.pack(f"<{len(strips)}I", *offs))
            f.write(struct.pack(f"<{len(strips)}I", *[len(s) for s in strips]))
            for s in strips:
                f.write(s)

        df = geotiff.read_geotiff(spark, p, tile=4)
        for b in range(spp):
            back, t, _ = df_to_grid(df, band=b)
            assert np.array_equal(back, A[::-1, :, b].astype(np.float64)), b
            assert t[:4] == (10.0, 20.0, 1.0, 1.0)


class TestGeoTiffLzw:
    def test_lzw_codec_adversarial(self):
        import numpy as np
        from karta_spark.sources.geotiff import lzw_decode, lzw_encode
        rng = np.random.default_rng(2)
        cases = [b"", b"a", b"ab" * 3000, b"\x00" * 50000,
                 bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),
                 bytes(rng.integers(0, 16, 200000, dtype=np.uint8))]
        for c in cases:
            assert lzw_decode(lzw_encode(c), len(c)) == c

    def test_lzw_geotiff_roundtrip(self, spark, tmp_path):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid, grid_to_df
        from karta_spark.sources import geotiff
        rng = np.random.default_rng(5)
        Z = rng.integers(0, 255, size=(20, 15)).astype(np.float64)
        tiles = grid_to_df(spark, "g", Z, (0.0, 0.0, 1.0, 1.0, 0.0, 0.0), tile=8)
        p = str(tmp_path / "l.tif")
        geotiff.write_geotiff(p, tiles, compress="lzw", dtype=np.uint8)
        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=8))
        assert np.array_equal(back, Z)


class TestGeoTiffTiled:
    """Round-4: tile-organized TIFF (tags 322-325) — the cloud-optimized
    layout GDAL writes for large rasters; reference reads it via GDAL
    (_gdal.py:114-188)."""

    def _grid(self, spark, ny=37, nx=23):
        import numpy as np
        from karta_spark.raster.tiles import grid_to_df
        rng = np.random.default_rng(11)
        Z = rng.integers(0, 250, size=(ny, nx)).astype(np.float64)
        return Z, grid_to_df(spark, "g", Z, (1.0, -4.0, 0.5, 0.5, 0.0, 0.0),
                             tile=16)

    @pytest.mark.parametrize("compress", [None, "deflate", "lzw", "packbits"])
    def test_tiled_roundtrip(self, spark, tmp_path, compress):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        Z, tiles = self._grid(spark)  # 37x23: edge tiles padded both axes
        p = str(tmp_path / "t.tif")
        geotiff.write_geotiff(p, tiles, dtype=np.uint8, compress=compress,
                              tiled=16)
        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=16))
        assert np.array_equal(back, Z)
        assert t[:4] == (1.0, -4.0, 0.5, 0.5)

    def test_tiled_float_roundtrip(self, spark, tmp_path):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid, grid_to_df
        from karta_spark.sources import geotiff
        rng = np.random.default_rng(12)
        Z = rng.uniform(-1e4, 1e4, size=(16, 33)).round(4)
        tiles = grid_to_df(spark, "g", Z, (0.0, 0.0, 1.0, 1.0, 0.0, 0.0), tile=16)
        p = str(tmp_path / "tf.tif")
        geotiff.write_geotiff(p, tiles, compress="deflate", tiled=16)
        back, _, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=16))
        assert np.array_equal(back, Z)

    def test_tile_size_must_be_multiple_of_16(self, spark, tmp_path):
        from karta_spark.sources import geotiff
        _, tiles = self._grid(spark, 8, 8)
        with pytest.raises(ValueError, match="multiple of 16"):
            geotiff.write_geotiff(str(tmp_path / "x.tif"), tiles, tiled=10)

    def test_handbuilt_tiled_predictor_lzw(self, spark, tmp_path):
        """Independent writer: 4-tile uint16 file with predictor=2 + LZW,
        pinning tile raster order and edge-padding semantics (a matched
        writer/reader bug cannot hide behind the roundtrip tests)."""
        import struct
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        from karta_spark.sources.geotiff import lzw_encode
        ny, nx, tw, th = 18, 20, 16, 16
        rng = np.random.default_rng(13)
        A = rng.integers(0, 60000, (ny, nx)).astype(np.uint16)
        ntx = (nx + tw - 1) // tw
        nty = (ny + th - 1) // th
        padded = np.zeros((nty * th, ntx * tw), dtype=np.uint16)
        padded[:ny, :nx] = A
        tiles_raw = []
        for ty in range(nty):
            for tx in range(ntx):
                t = padded[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                diff = np.empty_like(t)
                diff[:, 0] = t[:, 0]
                diff[:, 1:] = t[:, 1:] - t[:, :-1]  # horizontal differencing
                tiles_raw.append(lzw_encode(diff.tobytes()))

        entry = lambda tag, ftype, count, value: struct.pack(
            "<HHI4s", tag, ftype, count, value)
        vl = lambda v: struct.pack("<I", v)
        vs = lambda v: struct.pack("<HH", v, 0)
        n_entries = 14
        ifd_off = 8
        ext_off = ifd_off + 2 + n_entries * 12 + 4
        scale_off = ext_off
        tie_off = scale_off + 24
        off_off = tie_off + 48
        cnt_off = off_off + 4 * len(tiles_raw)
        data_off = cnt_off + 4 * len(tiles_raw)
        offs, pos = [], data_off
        for t in tiles_raw:
            offs.append(pos); pos += len(t)
        entries = [
            entry(256, 4, 1, vl(nx)), entry(257, 4, 1, vl(ny)),
            entry(258, 3, 1, vs(16)),
            entry(259, 3, 1, vs(5)),              # LZW
            entry(262, 3, 1, vs(1)),
            entry(277, 3, 1, vs(1)),
            entry(317, 3, 1, vs(2)),              # predictor
            entry(322, 4, 1, vl(tw)), entry(323, 4, 1, vl(th)),
            entry(324, 4, len(tiles_raw), vl(off_off)),
            entry(325, 4, len(tiles_raw), vl(cnt_off)),
            entry(339, 3, 1, vs(1)),
            entry(33550, 12, 3, vl(scale_off)),
            entry(33922, 12, 6, vl(tie_off)),
        ]
        p = str(tmp_path / "hb.tif")
        with open(p, "wb") as f:
            f.write(b"II*\x00" + struct.pack("<I", ifd_off))
            f.write(struct.pack("<H", n_entries) + b"".join(entries)
                    + struct.pack("<I", 0))
            f.write(struct.pack("<3d", 2.0, 1.0, 0.0))
            f.write(struct.pack("<6d", 0, 0, 0, 5.0, -3.0 + ny * 1.0, 0))
            f.write(struct.pack(f"<{len(tiles_raw)}I", *offs))
            f.write(struct.pack(f"<{len(tiles_raw)}I",
                                *[len(t) for t in tiles_raw]))
            for t in tiles_raw:
                f.write(t)

        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=16))
        assert np.array_equal(back, A[::-1].astype(np.float64))
        assert t[:4] == (5.0, -3.0, 2.0, 1.0)


class TestGeoTiffLazyWindow:
    """Round-4: lazy windowed + distributed GeoTIFF scans — only the
    strips/tiles a window needs are read (reference GdalFileBand,
    _gdal.py:17-57)."""

    def _write(self, spark, tmp_path, tiled, compress, ny=70, nx=53):
        import numpy as np
        from karta_spark.raster.tiles import grid_to_df
        from karta_spark.sources import geotiff
        rng = np.random.default_rng(21)
        Z = rng.integers(0, 250, size=(ny, nx)).astype(np.float64)
        tiles = grid_to_df(spark, "g", Z, (10.0, -5.0, 0.5, 0.25, 0.0, 0.0),
                           tile=32)
        p = str(tmp_path / "w.tif")
        geotiff.write_geotiff(p, tiles, dtype=np.uint8, compress=compress,
                              tiled=tiled)
        return Z, p

    @pytest.mark.parametrize("tiled,compress", [
        (None, None), (None, "deflate"), (16, None), (16, "lzw")])
    def test_window_equals_slice(self, spark, tmp_path, tiled, compress):
        import numpy as np
        from karta_spark.sources import geotiff
        Z, p = self._write(spark, tmp_path, tiled, compress)
        for (i0, j0, ny, nx) in [(0, 0, 70, 53), (5, 7, 20, 11),
                                 (60, 40, 10, 13), (0, 0, 1, 1),
                                 (33, 0, 16, 53)]:
            vals, t = geotiff.read_geotiff_window(p, i0, j0, ny, nx)
            assert np.array_equal(vals, Z[i0:i0 + ny, j0:j0 + nx]), \
                (tiled, compress, i0, j0)
            assert t == (10.0 + j0 * 0.5, -5.0 + i0 * 0.25, 0.5, 0.25, 0.0, 0.0)

    def test_window_out_of_bounds_raises(self, spark, tmp_path):
        from karta_spark.sources import geotiff
        _, p = self._write(spark, tmp_path, None, None)
        with pytest.raises(ValueError, match="bounds"):
            geotiff.read_geotiff_window(p, 60, 0, 20, 10)

    @pytest.mark.parametrize("tiled", [None, 16])
    def test_distributed_equals_driver_read(self, spark, tmp_path, tiled):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        Z, p = self._write(spark, tmp_path, tiled, "deflate")
        dist = geotiff.read_geotiff_distributed(spark, p, tile=32)
        back, t, _ = df_to_grid(dist)
        assert np.array_equal(back, Z)
        assert t[:4] == (10.0, -5.0, 0.5, 0.25)

    def test_distributed_halo_matches_grid_to_df(self, spark, tmp_path):
        """Halo contents must match the driver-side tiling exactly, so
        stencil ops give identical answers on the lazy table."""
        import numpy as np
        from karta_spark.sources import geotiff
        Z, p = self._write(spark, tmp_path, 16, None)
        dist = geotiff.read_geotiff_distributed(spark, p, tile=32).collect()
        ref = geotiff.read_geotiff(spark, p, tile=32).collect()
        key = lambda r: (r.tile_i, r.tile_j)
        da = {key(r): r for r in dist}
        dr = {key(r): r for r in ref}
        assert set(da) == set(dr)
        for k in da:
            a = np.asarray(da[k].block, dtype=np.float64)
            b = np.asarray(dr[k].block, dtype=np.float64)
            assert np.array_equal(np.isnan(a), np.isnan(b)), k
            assert np.array_equal(a[~np.isnan(a)], b[~np.isnan(b)]), k


class TestGeoTiffBigEndian:
    """Round-4: big-endian (MM) classic TIFF read — common in the wild;
    hand-built fixture, entirely '>'-packed."""

    def test_handbuilt_bigendian_strip(self, spark, tmp_path):
        import struct
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        ny, nx = 6, 5
        rng = np.random.default_rng(31)
        A = rng.integers(0, 60000, (ny, nx)).astype(np.uint16)
        data = A.astype(">u2").tobytes()

        entry = lambda tag, ftype, count, value: struct.pack(
            ">HHI4s", tag, ftype, count, value)
        vl = lambda v: struct.pack(">I", v)
        vs = lambda v: struct.pack(">HH", v, 0)
        n_entries = 12
        ifd_off = 8
        ext_off = ifd_off + 2 + n_entries * 12 + 4
        scale_off = ext_off
        tie_off = scale_off + 24
        data_off = tie_off + 48
        entries = [
            entry(256, 4, 1, vl(nx)), entry(257, 4, 1, vl(ny)),
            entry(258, 3, 1, vs(16)),
            entry(259, 3, 1, vs(1)),
            entry(262, 3, 1, vs(1)),
            entry(273, 4, 1, vl(data_off)),
            entry(277, 3, 1, vs(1)),
            entry(278, 4, 1, vl(ny)),
            entry(279, 4, 1, vl(len(data))),
            entry(339, 3, 1, vs(1)),
            entry(33550, 12, 3, vl(scale_off)),
            entry(33922, 12, 6, vl(tie_off)),
        ]
        p = str(tmp_path / "be.tif")
        with open(p, "wb") as fh:
            fh.write(b"MM\x00*" + struct.pack(">I", ifd_off))
            fh.write(struct.pack(">H", n_entries) + b"".join(entries)
                     + struct.pack(">I", 0))
            fh.write(struct.pack(">3d", 1.5, 0.5, 0.0))
            fh.write(struct.pack(">6d", 0, 0, 0, 7.0, 1.0 + ny * 0.5, 0))
            fh.write(data)

        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=4))
        assert np.array_equal(back, A[::-1].astype(np.float64))
        assert t[:4] == (7.0, 1.0, 1.5, 0.5)
        # windowed read honors endianness too
        vals, _ = geotiff.read_geotiff_window(p, 1, 1, 3, 2)
        assert np.array_equal(vals, A[::-1][1:4, 1:3].astype(np.float64))

    def test_garbage_magic_raises(self, tmp_path):
        from karta_spark.sources.geotiff import TiffMeta
        p = tmp_path / "x.tif"
        p.write_bytes(b"XX!!rest")
        with pytest.raises(ValueError, match="classic TIFF"):
            with open(p, "rb") as fh:
                TiffMeta(fh)


class TestGeoTiffOverviews:
    """Round-4: chained-IFD overview pyramids (the COG layout) — write
    with overviews=[...], read any level lazily."""

    def _write(self, spark, tmp_path, **kw):
        import numpy as np
        from karta_spark.raster.tiles import grid_to_df
        from karta_spark.sources import geotiff
        ny, nx = 40, 36
        yy, xx = np.mgrid[0:ny, 0:nx]
        Z = (yy * 3.0 + xx * 5.0)
        tiles = grid_to_df(spark, "g", Z, (2.0, 1.0, 0.5, 0.25, 0.0, 0.0),
                           tile=32)
        p = str(tmp_path / "ov.tif")
        geotiff.write_geotiff(p, tiles, **kw)
        return Z, p

    @pytest.mark.parametrize("kw", [
        dict(overviews=[2, 4]),
        dict(overviews=[2], compress="lzw"),
        dict(overviews=[2, 4], tiled=16, compress="deflate"),
    ])
    def test_overview_chain_roundtrip(self, spark, tmp_path, kw):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        Z, p = self._write(spark, tmp_path, **kw)
        # base level identical
        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=32))
        assert np.array_equal(back, Z)
        # each overview is the box mean at factor f, anchored at the UL
        # tiepoint with scale*f
        arr_td = Z[::-1]
        for lvl, f in enumerate(kw["overviews"], start=1):
            got, t, _ = df_to_grid(
                geotiff.read_geotiff(spark, p, tile=32, overview=lvl))
            H = (arr_td.shape[0] + f - 1) // f
            W = (arr_td.shape[1] + f - 1) // f
            pad = np.pad(arr_td, ((0, H * f - arr_td.shape[0]),
                                  (0, W * f - arr_td.shape[1])), mode="edge")
            want_td = pad.reshape(H, f, W, f).mean(axis=(1, 3))
            assert np.allclose(got, want_td[::-1], atol=1e-9), (lvl, f)
            assert t[2] == 0.5 * f and t[3] == 0.25 * f
            # UL anchor: y_top identical across levels
            assert t[1] + got.shape[0] * t[3] == pytest.approx(1.0 + 40 * 0.25)

    def test_overview_window_and_distributed(self, spark, tmp_path):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        Z, p = self._write(spark, tmp_path, overviews=[2], tiled=16)
        full, _ = geotiff.read_geotiff_window(p, 0, 0, 20, 18, overview=1)
        win, t = geotiff.read_geotiff_window(p, 3, 2, 5, 7, overview=1)
        assert np.array_equal(win, full[3:8, 2:9])
        dist, tt, _ = df_to_grid(
            geotiff.read_geotiff_distributed(spark, p, tile=16, overview=1))
        assert np.array_equal(dist, full)

    def test_missing_overview_raises(self, spark, tmp_path):
        from karta_spark.sources import geotiff
        _, p = self._write(spark, tmp_path, overviews=[2])
        with pytest.raises(ValueError, match="overview 3"):
            geotiff.read_geotiff_window(p, 0, 0, 1, 1, overview=3)

    def test_overview_metas_chain(self, spark, tmp_path):
        from karta_spark.sources import geotiff
        _, p = self._write(spark, tmp_path, overviews=[2, 4])
        with open(p, "rb") as f:
            metas = geotiff.tiff_overview_metas(f)
        assert [m.ny for m in metas] == [40, 20, 10]
        assert [m.nx for m in metas] == [36, 18, 9]
        assert metas[-1].next_ifd == 0


class TestGeoTiffNodataTag:
    """Round-4: GDAL_NODATA (tag 42113) — the wild-standard nodata
    marker; written when the tile table carries a non-NaN nodata, read
    back as the default."""

    def test_nodata_roundtrip(self, spark, tmp_path):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid, grid_to_df
        from karta_spark.sources import geotiff
        Z = np.arange(20.0).reshape(4, 5)
        Z[1, 2] = -9999.0
        tiles = grid_to_df(spark, "g", Z, (0.0, 0.0, 1.0, 1.0, 0.0, 0.0),
                           tile=8, nodata=-9999.0)
        p = str(tmp_path / "nd.tif")
        geotiff.write_geotiff(p, tiles, dtype=np.float64)
        with open(p, "rb") as f:
            assert geotiff.TiffMeta(f).nodata == -9999.0
        back = geotiff.read_geotiff(spark, p, tile=8)
        _, _, nod = df_to_grid(back)
        assert nod == -9999.0
        dist = geotiff.read_geotiff_distributed(spark, p, tile=8)
        _, _, nod2 = df_to_grid(dist)
        assert nod2 == -9999.0
        # explicit override wins
        _, _, nod3 = df_to_grid(geotiff.read_geotiff(spark, p, tile=8,
                                                     nodata=float("nan")))
        assert np.isnan(nod3)

    def test_no_tag_defaults_nan(self, spark, tmp_path):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid, grid_to_df
        from karta_spark.sources import geotiff
        Z = np.arange(20.0).reshape(4, 5)
        tiles = grid_to_df(spark, "g", Z, (0.0, 0.0, 1.0, 1.0, 0.0, 0.0),
                           tile=8)
        p = str(tmp_path / "nn.tif")
        geotiff.write_geotiff(p, tiles)
        with open(p, "rb") as f:
            assert geotiff.TiffMeta(f).nodata is None
        _, _, nod = df_to_grid(geotiff.read_geotiff(spark, p, tile=8))
        assert np.isnan(nod)

    def test_short_inline_nodata(self, spark, tmp_path):
        # value "0" fits inline (2 bytes incl. NUL) — exercises the
        # inline-ASCII branch
        import numpy as np
        from karta_spark.raster.tiles import grid_to_df
        from karta_spark.sources import geotiff
        Z = np.arange(16.0).reshape(4, 4)
        tiles = grid_to_df(spark, "g", Z, (0.0, 0.0, 1.0, 1.0, 0.0, 0.0),
                           tile=8, nodata=0.0)
        p = str(tmp_path / "z.tif")
        geotiff.write_geotiff(p, tiles)
        with open(p, "rb") as f:
            assert geotiff.TiffMeta(f).nodata == 0.0


class TestBigTiff:
    """Round-4: BigTIFF (version 43, 8-byte offsets) read — the layout
    rasters beyond 4 GB actually ship in; hand-built fixture with
    LONG8 tile offset arrays."""

    def test_handbuilt_bigtiff_tiled(self, spark, tmp_path):
        import struct
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        ny, nx, tw = 20, 18, 16
        rng = np.random.default_rng(41)
        A = rng.integers(0, 250, (ny, nx)).astype(np.uint8)
        ntx = (nx + tw - 1) // tw
        nty = (ny + tw - 1) // tw
        padded = np.zeros((nty * tw, ntx * tw), dtype=np.uint8)
        padded[:ny, :nx] = A
        tiles_raw = [padded[ty * tw:(ty + 1) * tw, tx * tw:(tx + 1) * tw]
                     .tobytes()
                     for ty in range(nty) for tx in range(ntx)]

        def entry(tag, ftype, count, value8):
            return struct.pack("<HHQ", tag, ftype, count) + value8

        vq = lambda v: struct.pack("<Q", v)
        vs = lambda v: struct.pack("<HHHH", v, 0, 0, 0)
        n_entries = 13
        ifd_off = 16
        ifd_size = 8 + n_entries * 20 + 8
        ext_off = ifd_off + ifd_size
        scale_off = ext_off
        tie_off = scale_off + 24
        off_off = tie_off + 48
        cnt_off = off_off + 8 * len(tiles_raw)
        data_off = cnt_off + 8 * len(tiles_raw)
        offs, pos = [], data_off
        for t in tiles_raw:
            offs.append(pos); pos += len(t)
        entries = [
            entry(256, 4, 1, vq(nx)), entry(257, 4, 1, vq(ny)),
            entry(258, 3, 1, vs(8)),
            entry(259, 3, 1, vs(1)),
            entry(262, 3, 1, vs(1)),
            entry(277, 3, 1, vs(1)),
            entry(322, 4, 1, vq(tw)), entry(323, 4, 1, vq(tw)),
            entry(324, 16, len(tiles_raw), vq(off_off)),   # LONG8 array
            entry(325, 16, len(tiles_raw), vq(cnt_off)),
            entry(339, 3, 1, vs(1)),
            entry(33550, 12, 3, vq(scale_off)),
            entry(33922, 12, 6, vq(tie_off)),
        ]
        p = str(tmp_path / "big.tif")
        with open(p, "wb") as fh:
            # BigTIFF header: II, 43, bytesize 8, 0, first IFD offset u64
            fh.write(b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off))
            fh.write(struct.pack("<Q", n_entries) + b"".join(entries)
                     + struct.pack("<Q", 0))
            fh.write(struct.pack("<3d", 1.0, 1.0, 0.0))
            fh.write(struct.pack("<6d", 0, 0, 0, 3.0, -2.0 + ny * 1.0, 0))
            fh.write(struct.pack(f"<{len(tiles_raw)}Q", *offs))
            fh.write(struct.pack(f"<{len(tiles_raw)}Q",
                                 *[len(t) for t in tiles_raw]))
            for t in tiles_raw:
                fh.write(t)

        with open(p, "rb") as fh:
            m = geotiff.TiffMeta(fh)
        assert m.bigtiff and m.tiled and (m.ny, m.nx) == (ny, nx)
        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=16))
        assert np.array_equal(back, A[::-1].astype(np.float64))
        assert t[:4] == (3.0, -2.0, 1.0, 1.0)
        # windowed read too
        vals, _ = geotiff.read_geotiff_window(p, 2, 3, 7, 9)
        assert np.array_equal(vals, A[::-1][2:9, 3:12].astype(np.float64))


class TestJpegInTiff:
    """Round-4: new-style JPEG-in-TIFF (compression 7, TTN2) — the
    standard aerial-imagery layout, incl. the shared-JPEGTables
    abbreviated-stream form."""

    def _grid(self, spark, ny=48, nx=40):
        import numpy as np
        from karta_spark.raster.tiles import grid_to_df
        yy, xx = np.mgrid[0:ny, 0:nx]
        Z = np.clip(128 + 80 * np.sin(xx / 7.0) * np.cos(yy / 9.0),
                    0, 255).round()
        return Z, grid_to_df(spark, "g", Z, (0.0, 0.0, 1.0, 1.0, 0.0, 0.0),
                             tile=32)

    @pytest.mark.parametrize("tiled", [None, 16])
    def test_jpeg_compressed_roundtrip_psnr(self, spark, tmp_path, tiled):
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        from karta_spark.sources.images import psnr
        Z, tiles = self._grid(spark)
        p = str(tmp_path / "j.tif")
        geotiff.write_geotiff(p, tiles, dtype=np.uint8, compress="jpeg",
                              tiled=tiled)
        with open(p, "rb") as f:
            assert geotiff.TiffMeta(f).comp == geotiff.COMPRESSION_JPEG
        back, t, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=32))
        assert psnr(back, Z) >= 40.0  # lossy chunk codec
        assert t[:4] == (0.0, 0.0, 1.0, 1.0)
        # windowed read decodes only intersecting chunks
        vals, _ = geotiff.read_geotiff_window(p, 5, 3, 20, 17)
        assert np.array_equal(vals, back[5:25, 3:20])

    def test_jpeg_requires_uint8(self, spark, tmp_path):
        from karta_spark.sources import geotiff
        _, tiles = self._grid(spark)
        with pytest.raises(ValueError, match="uint8"):
            geotiff.write_geotiff(str(tmp_path / "x.tif"), tiles,
                                  compress="jpeg")

    def test_abbreviated_streams_with_jpegtables_tag(self, spark, tmp_path):
        """Hand-built file: DQT/DHT live ONLY in tag 347; each tile chunk
        is an abbreviated stream (SOI + SOF0 + SOS + entropy + EOI)."""
        import struct
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        from karta_spark.sources.images import psnr
        from karta_spark.sources.jpeg import encode_jpeg_baseline

        def split_stream(full):
            """(tables_segments, abbreviated_stream) from a full JFIF."""
            pos = 2
            tables = b""
            abbrev = bytearray(b"\xFF\xD8")
            while pos < len(full):
                marker = full[pos + 1]
                if marker == 0xD9:
                    abbrev += full[pos:pos + 2]
                    break
                (seglen,) = struct.unpack(">H", full[pos + 2:pos + 4])
                seg = full[pos:pos + 2 + seglen]
                if marker in (0xDB, 0xC4):
                    tables += seg
                elif marker == 0xDA:
                    abbrev += full[pos:]  # SOS + entropy + EOI
                    break
                else:
                    abbrev += seg
                pos += 2 + seglen
            return tables, bytes(abbrev)

        ny, nx, tw = 32, 32, 16
        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:ny, 0:nx]
        A = np.clip(120 + 70 * np.sin(xx / 5.0) + 20 * np.cos(yy / 4.0),
                    0, 255).round().astype(np.uint8)
        chunks, tables = [], None
        for ty in range(2):
            for tx in range(2):
                tile = A[ty * tw:(ty + 1) * tw, tx * tw:(tx + 1) * tw]
                tb, ab = split_stream(encode_jpeg_baseline(tile, 95))
                tables = tb
                chunks.append(ab)
        jpegtables = b"\xFF\xD8" + tables + b"\xFF\xD9"

        entry = lambda tag, ftype, count, value: struct.pack(
            "<HHI4s", tag, ftype, count, value)
        vl = lambda v: struct.pack("<I", v)
        vs = lambda v: struct.pack("<HH", v, 0)
        n_entries = 14
        ifd_off = 8
        ext_off = ifd_off + 2 + n_entries * 12 + 4
        scale_off = ext_off
        tie_off = scale_off + 24
        jt_off = tie_off + 48
        off_off = jt_off + len(jpegtables)
        cnt_off = off_off + 16
        data_off = cnt_off + 16
        offs, pos = [], data_off
        for c in chunks:
            offs.append(pos); pos += len(c)
        entries = [
            entry(256, 4, 1, vl(nx)), entry(257, 4, 1, vl(ny)),
            entry(258, 3, 1, vs(8)), entry(259, 3, 1, vs(7)),  # JPEG
            entry(262, 3, 1, vs(1)), entry(277, 3, 1, vs(1)),
            entry(322, 4, 1, vl(tw)), entry(323, 4, 1, vl(tw)),
            entry(324, 4, 4, vl(off_off)), entry(325, 4, 4, vl(cnt_off)),
            entry(339, 3, 1, vs(1)),
            entry(347, 7, len(jpegtables), vl(jt_off)),  # JPEGTables
            entry(33550, 12, 3, vl(scale_off)),
            entry(33922, 12, 6, vl(tie_off)),
        ]
        p = str(tmp_path / "abbr.tif")
        with open(p, "wb") as fh:
            fh.write(b"II*\x00" + struct.pack("<I", ifd_off))
            fh.write(struct.pack("<H", n_entries) + b"".join(entries)
                     + struct.pack("<I", 0))
            fh.write(struct.pack("<3d", 1.0, 1.0, 0.0))
            fh.write(struct.pack("<6d", 0, 0, 0, 0.0, float(ny), 0))
            fh.write(jpegtables)
            fh.write(struct.pack("<4I", *offs))
            fh.write(struct.pack("<4I", *[len(c) for c in chunks]))
            for c in chunks:
                fh.write(c)

        with open(p, "rb") as fh:
            m = geotiff.TiffMeta(fh)
        assert m.jpeg_tables is not None and m.comp == 7
        back, _, _ = df_to_grid(geotiff.read_geotiff(spark, p, tile=16))
        assert psnr(back, A[::-1].astype(np.float64)) >= 40.0


class TestPlanarTiff:
    """Round-4: PlanarConfiguration=2 read — each chunk holds one band,
    offset arrays plane-major; hand-built 2-band strip fixture."""

    def test_handbuilt_planar_two_band(self, spark, tmp_path):
        import struct
        import zlib as _z
        import numpy as np
        from karta_spark.raster.tiles import df_to_grid
        from karta_spark.sources import geotiff
        ny, nx, spp = 10, 7, 2
        rng = np.random.default_rng(51)
        A = rng.integers(0, 250, (ny, nx, spp)).astype(np.uint8)
        rows_per_strip = 4
        nstrips = (ny + rows_per_strip - 1) // rows_per_strip
        strips = []
        for p in range(spp):           # plane-major chunk order
            for s0 in range(0, ny, rows_per_strip):
                strips.append(_z.compress(
                    np.ascontiguousarray(A[s0:s0 + rows_per_strip, :, p])
                    .tobytes()))

        entry = lambda tag, ftype, count, value: struct.pack(
            "<HHI4s", tag, ftype, count, value)
        vl = lambda v: struct.pack("<I", v)
        vs = lambda v: struct.pack("<HH", v, 0)
        n_entries = 14
        ifd_off = 8
        ext_off = ifd_off + 2 + n_entries * 12 + 4
        bits_off = ext_off
        scale_off = bits_off + 2 * spp
        tie_off = scale_off + 24
        off_off = tie_off + 48
        cnt_off = off_off + 4 * len(strips)
        data_off = cnt_off + 4 * len(strips)
        offs, pos = [], data_off
        for s in strips:
            offs.append(pos); pos += len(s)
        entries = [
            entry(256, 4, 1, vl(nx)), entry(257, 4, 1, vl(ny)),
            entry(258, 3, spp, struct.pack("<HH", 8, 8)),
            entry(259, 3, 1, vs(8)),          # deflate
            entry(262, 3, 1, vs(1)),
            entry(273, 4, len(strips), vl(off_off)),
            entry(277, 3, 1, vs(spp)),
            entry(278, 4, 1, vl(rows_per_strip)),
            entry(279, 4, len(strips), vl(cnt_off)),
            entry(284, 3, 1, vs(2)),          # PlanarConfiguration=2
            entry(339, 3, 1, vs(1)),
            entry(33550, 12, 3, vl(scale_off)),
            entry(33922, 12, 6, vl(tie_off)),
            entry(42113, 2, 2, b"9\x00\x00\x00"),  # nodata "9" inline
        ]
        p = str(tmp_path / "planar.tif")
        with open(p, "wb") as fh:
            fh.write(b"II*\x00" + struct.pack("<I", ifd_off))
            fh.write(struct.pack("<H", n_entries) + b"".join(entries)
                     + struct.pack("<I", 0))
            fh.write(struct.pack("<2H", 8, 8))
            fh.write(struct.pack("<3d", 1.0, 1.0, 0.0))
            fh.write(struct.pack("<6d", 0, 0, 0, 4.0, -1.0 + ny * 1.0, 0))
            fh.write(struct.pack(f"<{len(strips)}I", *offs))
            fh.write(struct.pack(f"<{len(strips)}I", *[len(s) for s in strips]))
            for s in strips:
                fh.write(s)

        with open(p, "rb") as fh:
            m = geotiff.TiffMeta(fh)
        assert m.planar == 2 and m.chunks_per_plane == nstrips
        df = geotiff.read_geotiff(spark, p, tile=8)
        for b in range(spp):
            back, t, _ = df_to_grid(df, band=b)
            assert np.array_equal(back, A[::-1, :, b].astype(np.float64)), b
            assert t[:4] == (4.0, -1.0, 1.0, 1.0)
        # windowed read assembles planes too
        vals0, _ = geotiff.read_geotiff_window(p, 2, 1, 5, 4, band=1)
        full1, _, _ = df_to_grid(df, band=1)
        assert np.array_equal(vals0, full1[2:7, 1:5])


class TestGpxRoutesExtensions:
    """Round-7 GPX long tail: <rte> routes and <extensions> blobs
    (reference _gpx.py Route namedtuple + _readextensions:66-73)."""

    GPX_DOC = """<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1" creator="t">
      <wpt lon="-21.9" lat="64.1"><name>rvk</name>
        <extensions><hr>142</hr><cad>87</cad></extensions></wpt>
      <rte><name>commute</name><desc>morning</desc>
        <extensions><color>red</color></extensions>
        <rtept lon="0.0" lat="51.5"/><rtept lon="0.1" lat="51.6"/>
        <rtept lon="0.2" lat="51.7"/></rte>
      <trk><name>t1</name><trkseg>
        <trkpt lon="1.0" lat="2.0"/><trkpt lon="1.5" lat="2.5"/>
      </trkseg></trk>
    </gpx>"""

    def test_routes_read(self, spark):
        from karta_spark.sources import gpx
        layers = gpx.read_gpx(spark, self.GPX_DOC)
        rows = layers["routes"].collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["properties"]["name"] == "commute"
        assert r["properties"]["desc"] == "morning"
        assert r["properties"]["ext:color"] == "red"
        assert [(v["x"], v["y"]) for v in r["vertices"]] == \
            [(0.0, 51.5), (0.1, 51.6), (0.2, 51.7)]

    def test_waypoint_extensions_read(self, spark):
        from karta_spark.sources import gpx
        layers = gpx.read_gpx(spark, self.GPX_DOC)
        w = layers["waypoints"].collect()[0]
        assert w["properties"]["ext:hr"] == "142"
        assert w["properties"]["ext:cad"] == "87"
        assert w["properties"]["name"] == "rvk"

    def test_full_roundtrip_with_routes_and_extensions(self, spark):
        from karta_spark.sources import gpx
        layers = gpx.read_gpx(spark, self.GPX_DOC)
        doc2 = gpx.to_gpx(waypoints=layers["waypoints"],
                          tracks=layers["tracks"],
                          routes=layers["routes"])
        # extensions serialize into a real <extensions> block, not a
        # flat child (the reference's GPX consumers require that)
        assert "<extensions>" in doc2 and "<color>red</color>" in doc2
        again = gpx.read_gpx(spark, doc2)
        r1 = layers["routes"].collect()[0]
        r2 = again["routes"].collect()[0]
        assert r1["vertices"] == r2["vertices"]
        assert dict(r1["properties"]) == dict(r2["properties"])
        w1 = layers["waypoints"].collect()[0]
        w2 = again["waypoints"].collect()[0]
        assert dict(w1["properties"]) == dict(w2["properties"])
