"""Spark-level spatial operator tests — golden values ported from the
reference suite (tests/geometry_tests.py, tests/vector_predicate_tests.py).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from karta_spark.functions import geometry as geom
from karta_spark.operators import intersect_join, knn, pip_join, radius_join
from karta_spark.operators.hull import convex_hull_df
from karta_spark.operators.pip_join import PolygonSpec

# canonical 20-vertex 3D set (geometry_tests.py:21-30)
VERTICES3D = [(2.0, 9.0, 9.0), (4.0, 1.0, 9.0), (4.0, 1.0, 5.0),
              (2.0, 8.0, 0.0), (9.0, 8.0, 4.0), (1.0, 4.0, 6.0),
              (7.0, 3.0, 4.0), (2.0, 5.0, 3.0), (1.0, 6.0, 6.0),
              (8.0, 1.0, 0.0), (5.0, 5.0, 1.0), (4.0, 5.0, 7.0),
              (3.0, 3.0, 5.0), (9.0, 0.0, 9.0), (6.0, 3.0, 8.0),
              (4.0, 5.0, 7.0), (9.0, 9.0, 4.0), (1.0, 4.0, 7.0),
              (1.0, 7.0, 8.0), (9.0, 1.0, 6.0)]


def lattice(spark):
    rows = [(i, float(x), float(y))
            for i, (x, y) in enumerate((x, y) for x in range(-10, 11) for y in range(-10, 11))]
    return spark.createDataFrame(rows, "point_id long, x double, y double")


class TestPointQueries:
    def test_within_bbox_strict(self, spark):
        # vector_predicate_tests.py:199-206: strict interior
        got = radius_join.within_bbox(lattice(spark), (-5.0, -4.0, 5.0, 6.0)).count()
        want = sum(1 for x in range(-10, 11) for y in range(-10, 11)
                   if -5 < x < 5 and -4 < y < 6)
        assert got == want

    def test_within_radius_border_excluded(self, spark):
        # geometry_tests.py:345-352: dist < 5.0 strictly
        got = radius_join.within_radius(lattice(spark), 0.0, 0.0, 5.0).count()
        want = sum(1 for x in range(-10, 11) for y in range(-10, 11)
                   if math.sqrt(x * x + y * y) < 5.0)
        assert got == want

    def test_nearest_vertex_3d(self, spark):
        # geometry_tests.py:262-266: nearest to (1,2,3) is index 12
        df = spark.createDataFrame(
            [(i, x, y, z) for i, (x, y, z) in enumerate(VERTICES3D)],
            "point_id long, x double, y double, z double")
        got = knn.nearest_vertex(df, 1.0, 2.0, 3.0, pz="z").collect()
        assert len(got) == 1 and got[0]["point_id"] == 12

    def test_bbox_agg(self, spark):
        # geometry_tests.py:289-293: bbox (1,0,9,9)
        df = spark.createDataFrame(
            [(0, float(x), float(y)) for x, y, _ in VERTICES3D],
            "geom_id long, x double, y double")
        vx = df.withColumn("idx", F.lit(0))
        row = geom.bbox(vx).collect()[0]
        assert (row["xmin"], row["ymin"], row["xmax"], row["ymax"]) == (1.0, 0.0, 9.0, 9.0)

    def test_knn_join_matches_bruteforce(self, spark):
        rng = np.random.default_rng(7)
        pts = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(
                zip(rng.uniform(-170, 170, 400), rng.uniform(-80, 80, 400)))],
            "point_id long, x double, y double")
        qs = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(
                zip(rng.uniform(-170, 170, 20), rng.uniform(-80, 80, 20)))],
            "query_id long, qx double, qy double")
        brute = {(r["query_id"], r["rank"]): r["point_id"]
                 for r in knn.knn_bruteforce(qs, pts, 3).collect()}
        ring = {(r["query_id"], r["rank"]): r["point_id"]
                for r in knn.knn_join(qs, pts, 3, zoom=3).collect()}
        assert brute == ring
        # zoom=None (density-derived auto_zoom) is exactness-invariant
        auto = {(r["query_id"], r["rank"]): r["point_id"]
                for r in knn.knn_join(qs, pts, 3, zoom=None).collect()}
        assert brute == auto


class TestSeededTouchingWithin:
    """The seed-49 membership-count goldens
    (vector_predicate_tests.py:223-281)."""

    @staticmethod
    def _multiline(spark):
        np.random.seed(49)
        members = [10 * np.random.rand(10, 2) + np.random.randint(-50, 50, (1, 2))
                   for _ in range(50)]
        rows = [(i, [{"x": float(x), "y": float(y)} for x, y in m])
                for i, m in enumerate(members)]
        return spark.createDataFrame(
            rows, "geom_id long, vertices array<struct<x:double,y:double>>")

    @staticmethod
    def _multipolygon(spark, size):
        np.random.seed(49)
        base = np.array([[0, 0], [size, 0], [size, size], [0, size]])
        members = [base + np.random.randint(-50, 50, (1, 2)) for _ in range(50)]
        rows = [(i, [{"x": float(x), "y": float(y)} for x, y in m])
                for i, m in enumerate(members)]
        return spark.createDataFrame(
            rows, "geom_id long, vertices array<struct<x:double,y:double>>")

    def test_multiline_touching_line(self, spark):
        line = np.array([(-30, -40), (11, -30), (10, 22), (-10, 50)], float)
        got = intersect_join.touching(self._multiline(spark), line, False).count()
        assert got == 4

    def test_multipolygon_touching_line(self, spark):
        line = np.array([(-40, -35), (-15, -30), (30, 5), (10, 32), (-15, 17)], float)
        got = intersect_join.touching(
            self._multipolygon(spark, 10), line, False, members_closed=True).count()
        assert got == 10

    def test_multiline_touching_poly(self, spark):
        poly = np.array([(-30, -40), (12, -30), (8, 22), (-10, 50)], float)
        got = intersect_join.touching(self._multiline(spark), poly, True).count()
        assert got == 12

    def test_multipolygon_touching_poly(self, spark):
        poly = np.array([(-30, -40), (12, -30), (8, 22), (-10, 50)], float)
        got = intersect_join.touching(
            self._multipolygon(spark, 3), poly, True, members_closed=True).count()
        assert got == 14

    def test_multiline_within_poly(self, spark):
        poly = np.array([(-30, -40), (12, -30), (8, 22), (-10, 50)], float)
        got = intersect_join.within(self._multiline(spark), poly).count()
        assert got == 8

    def test_multipolygon_within_poly(self, spark):
        poly = np.array([(-30, -40), (12, -30), (8, 22), (-10, 50)], float)
        got = intersect_join.within(
            self._multipolygon(spark, 3), poly, members_closed=True).count()
        assert got == 8


class TestSeededWithinPolygon:
    def test_seed42_membership_consistency(self, spark):
        # vector_predicate_tests.py:208-221: joined subset == contains() set
        np.random.seed(42)
        x = (np.random.random(100) - 0.5) * 180.0
        y = (np.random.random(100) - 0.5) * 30.0
        poly = PolygonSpec("region", np.array(
            [(-80, 0), (-50, -10), (20, -8), (35, -17), (55, 15), (-45, 18), (-60, 12)],
            float), crs="lonlat")
        pts = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))],
            "point_id long, x double, y double")
        joined = {r["point_id"] for r in
                  pip_join.point_in_polygon_join(pts, [poly], zoom=6).collect()}
        from karta_spark.functions.kernels import winding_contains
        want = {i for i in range(100) if winding_contains([x[i]], [y[i]], poly.outer)[0]}
        assert joined == want and len(want) > 0


class TestHullAndLines:
    def test_convex_hull_golden1(self, spark):
        verts = [(953, 198), (986, 271), (937, 305), (934, 464), (967, 595),
                 (965, 704), (800, 407), (782, 322), (863, 979), (637, 689),
                 (254, 944), (330, 745), (363, 646), (27, 990), (127, 696),
                 (286, 352), (436, 205), (88, 254), (187, 85)]
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in verts], "x double, y double")
        hull = {tuple(v) for v in convex_hull_df(df)}
        want = {(27, 990), (88, 254), (187, 85), (953, 198),
                (986, 271), (965, 704), (863, 979)}
        assert hull == {(float(a), float(b)) for a, b in want}

    def test_convex_hull_golden2(self, spark):
        verts = [(-158, 175), (-179, 230), (-404, -390), (259, -79), (32, 144),
                 (-59, 355), (402, 301), (239, 159), (-421, 172), (-482, 26),
                 (2, -499), (134, -72), (-412, -12), (476, 235), (-412, 40),
                 (-198, -256), (314, 331), (431, -492), (325, -415), (-400, -491)]
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in verts], "x double, y double")
        hull = {tuple(v) for v in convex_hull_df(df)}
        want = {(-482, 26), (-400, -491), (2, -499), (431, -492), (476, 235),
                (402, 301), (314, 331), (-59, 355), (-421, 172)}
        assert hull == {(float(a), float(b)) for a, b in want}

    def test_to_points_golden(self, spark):
        # geometry_tests.py:502-512
        df = spark.createDataFrame(
            [(0, 0, 0.0, 0.0), (0, 1, 4.0, 3.0), (0, 2, 1.0, 7.0)],
            "geom_id long, idx long, x double, y double")
        got = geom.to_points(df, 1.0).orderBy("sample_idx").collect()
        ans = [(0., 0.), (0.8, 0.6), (1.6, 1.2), (2.4, 1.8), (3.2, 2.4),
               (4., 3.), (3.4, 3.8), (2.8, 4.6), (2.2, 5.4), (1.6, 6.2), (1., 7.)]
        assert len(got) == len(ans)
        for r, (wx, wy) in zip(got, ans):
            assert r["x"] == pytest.approx(wx) and r["y"] == pytest.approx(wy)

    def test_shortest_distance(self, spark):
        # geometry_tests.py: line [(0,0),(2,2),(5,4)] -> dist((0,2)) = sqrt(2)
        df = spark.createDataFrame(
            [(0, 0, 0.0, 0.0), (0, 1, 2.0, 2.0), (0, 2, 5.0, 4.0)],
            "geom_id long, idx long, x double, y double")
        got = geom.shortest_distance_to(df, 0.0, 2.0).collect()[0]["distance"]
        assert abs(got - math.sqrt(2)) < 1e-10

    def test_length_cumlength_displacement(self, spark):
        df = spark.createDataFrame(
            [(0, 0, 0.0, 0.0), (0, 1, 4.0, 3.0), (0, 2, 1.0, 7.0)],
            "geom_id long, idx long, x double, y double")
        assert geom.length(df).collect()[0]["length"] == pytest.approx(10.0)
        cums = [r["cumlength"] for r in geom.cumlength(df).orderBy("idx").collect()]
        assert cums == pytest.approx([0.0, 5.0, 10.0])
        disp = geom.displacement(df).collect()[0]["displacement"]
        assert disp == pytest.approx(math.sqrt(1 + 49))

    def test_area_perimeter_centroid_clockwise(self, spark):
        # unit square ccw; ringed square 10x10 w/ hole handled via subtract
        sq = spark.createDataFrame(
            [(0, i, float(x), float(y)) for i, (x, y) in
             enumerate([(0, 0), (1, 0), (1, 1), (0, 1)])],
            "geom_id long, idx long, x double, y double")
        assert geom.area(sq).collect()[0]["area"] == pytest.approx(1.0)
        assert geom.perimeter(sq).collect()[0]["perimeter"] == pytest.approx(4.0)
        c = geom.centroid(sq).collect()[0]
        assert (c["cx"], c["cy"]) == (pytest.approx(0.5), pytest.approx(0.5))
        assert geom.isclockwise(sq).collect()[0]["isclockwise"] is False
        cw = spark.createDataFrame(
            [(0, i, float(x), float(y)) for i, (x, y) in
             enumerate([(0, 0), (0, 1), (1, 1), (1, 0)])],
            "geom_id long, idx long, x double, y double")
        assert geom.isclockwise(cw).collect()[0]["isclockwise"] is True


class TestCartesianPIP:
    def test_star_polygon_planar_cells(self, spark):
        # hippie star (360 edges -> numpy-kernel branch) on a planar grid;
        # coordinates far outside lonlat range prove the cartesian path
        theta = np.linspace(0, 2 * np.pi, 361)[:-1]
        r = 10 * np.sin(theta * 8) + 15
        ring = np.column_stack([np.cos(theta) * r + 2500,
                                np.sin(theta) * r + 2500])
        star = PolygonSpec("star", ring, crs="cartesian")
        rng = np.random.default_rng(4)
        xs = rng.uniform(2470, 2530, 500)
        ys = rng.uniform(2470, 2530, 500)
        pts = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(xs, ys))],
            "point_id long, x double, y double")
        got = {r_["point_id"] for r_ in
               pip_join.point_in_polygon_join(pts, [star]).collect()}
        from karta_spark.functions.kernels import winding_contains
        want = {i for i in range(500) if winding_contains([xs[i]], [ys[i]], ring)[0]}
        assert got == want and len(want) > 0

    def test_mixed_expr_and_udf_polys(self, spark):
        diamond = PolygonSpec("diamond", np.array(
            [(0, 0), (50, 50), (100, 0), (50, -50)], float), crs="cartesian")
        theta = np.linspace(0, 2 * np.pi, 361)[:-1]
        ring = np.column_stack([np.cos(theta) * (10 * np.sin(theta * 8) + 15) + 50,
                                np.sin(theta) * (10 * np.sin(theta * 8) + 15)])
        star = PolygonSpec("star", ring, crs="cartesian")
        rng = np.random.default_rng(6)
        xs = rng.uniform(-10, 110, 400)
        ys = rng.uniform(-60, 60, 400)
        pts = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(xs, ys))],
            "point_id long, x double, y double")
        got = {(r_["point_id"], r_["poly_id"]) for r_ in
               pip_join.point_in_polygon_join(pts, [diamond, star]).collect()}
        from karta_spark.functions.kernels import winding_contains
        want = set()
        for i in range(400):
            if winding_contains([xs[i]], [ys[i]], diamond.outer)[0]:
                want.add((i, "diamond"))
            if winding_contains([xs[i]], [ys[i]], ring)[0]:
                want.add((i, "star"))
        assert got == want and len(want) > 0


class TestAutoZoom:
    def test_auto_zoom_pip(self, spark):
        from karta_spark.operators.pip_join import auto_zoom
        poly = PolygonSpec("hept", np.array(
            [(-80, 0), (-50, -10), (20, -8), (35, -17), (55, 15), (-45, 18), (-60, 12)],
            float), crs="lonlat")
        z = auto_zoom([poly])
        assert 4 <= z <= 8
        pts = lattice(spark)
        a = {r["point_id"] for r in
             pip_join.point_in_polygon_join(pts, [poly], zoom=None).collect()}
        b = {r["point_id"] for r in
             pip_join.point_in_polygon_join(pts, [poly], zoom=6).collect()}
        assert a == b


class TestSphericalQueries:
    def test_knn_spherical_matches_bruteforce(self, spark):
        rng = np.random.default_rng(13)
        pts = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(
                zip(rng.uniform(-179, 179, 400), rng.uniform(-84, 84, 400)))],
            "point_id long, x double, y double")
        qs = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(
                zip(rng.uniform(-179, 179, 15), rng.uniform(-84, 84, 15)))],
            "query_id long, qx double, qy double")
        brute = {(r["query_id"], r["rank"]): r["point_id"] for r in
                 knn.knn_bruteforce(qs, pts, 3, spherical=True).collect()}
        ring = {(r["query_id"], r["rank"]): r["point_id"] for r in
                knn.knn_join(qs, pts, 3, zoom=3, spherical=True).collect()}
        assert brute == ring

    def test_within_radius_spherical_gate(self, spark):
        from karta_spark.functions.kernels import sphere_distance
        rng = np.random.default_rng(13)
        P = [(i, float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-179, 179, 400), rng.uniform(-84, 84, 400)))]
        pts = spark.createDataFrame(P, "point_id long, x double, y double")
        got = {r["point_id"] for r in radius_join.within_radius(
            pts, 20.0, 40.0, 3_000_000.0, spherical=True).collect()}
        xs = np.array([p[1] for p in P]); ys = np.array([p[2] for p in P])
        d = sphere_distance(20.0, 40.0, xs, ys)
        want = set(np.nonzero(d < 3_000_000.0)[0].tolist())
        assert got == want and len(want) > 0
