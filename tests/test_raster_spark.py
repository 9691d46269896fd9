"""Spark raster tests — goldens from reference tests/grid_tests.py."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from karta_spark.raster import algebra, sampling, tiles
from karta_spark.raster.gridpoints import gridpoints
from karta_spark.raster.mask import mask_by_poly

T1 = (0.0, 0.0, 1.0, 1.0, 0.0, 0.0)


def _is_nodata(v):
    return v is None or (isinstance(v, float) and np.isnan(v))
Z2 = np.array([[0.0, 1.0], [1.0, 0.5]])


def peaks(n=49):
    X, Y = np.meshgrid(np.linspace(-3, 3, n), np.linspace(-3, 3, n))
    return (3.0 * (1 - X) ** 2 * np.exp(-X ** 2 - (Y + 1) ** 2)
            - 10.0 * (X / 5.0 - X ** 3 - Y ** 5) * np.exp(-X ** 2 - Y ** 2)
            - 1.0 / 3.0 * np.exp(-(X + 1) ** 2 - Y ** 2))


def sample_at(spark, grid_df, transform, pts, method):
    pdf = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double")
    got = sampling.sample_join(pdf, grid_df, transform, method=method).orderBy("pid").collect()
    return [r["value"] for r in got]


class TestSampling:
    def test_nearest_golden(self, spark):
        # grid_tests.py:220-226
        g = tiles.grid_to_df(spark, "g", Z2, T1)
        got = sample_at(spark, g, T1, [(0.6, 0.7), (0.6, 1.3), (1.4, 0.3), (1.6, 1.3)], "nearest")
        assert got == [0.0, 1.0, 1.0, 0.5]

    def test_bilinear_golden(self, spark):
        # grid_tests.py:261-264: center (1,1) -> 0.625
        g = tiles.grid_to_df(spark, "g", Z2, T1)
        got = sample_at(spark, g, T1, [(1.0, 1.0)], "bilinear")
        assert got[0] == pytest.approx(0.625)

    def test_nearest_out_of_bounds(self, spark):
        # grid_tests.py:194-201: ones 10x10; (12,-1),(15,1) -> nan
        g = tiles.grid_to_df(spark, "g", np.ones((10, 10)), T1)
        got = sample_at(spark, g, T1, [(7, 3), (9, 1), (12, -1), (15, 1)], "nearest")
        assert got[0] == 1.0 and got[1] == 1.0
        # NaN nodata surfaces as SQL NULL across the Arrow boundary
        assert _is_nodata(got[2]) and _is_nodata(got[3])

    def test_bilinear_out_of_bounds(self, spark):
        g = tiles.grid_to_df(spark, "g", np.ones((10, 10)), T1)
        got = sample_at(spark, g, T1, [(7, 3), (9, 1), (12, -1), (15, 1)], "bilinear")
        assert got[0] == 1.0 and got[1] == 1.0
        assert _is_nodata(got[2]) and _is_nodata(got[3])

    def test_multi_tile_consistency(self, spark):
        # same samples from a 1-tile and a 16-tile layout must agree
        rng = np.random.default_rng(3)
        Z = rng.uniform(0, 10, (64, 64))
        one = tiles.grid_to_df(spark, "g", Z, T1, tile=256)
        many = tiles.grid_to_df(spark, "g", Z, T1, tile=16)
        pts = [(float(x), float(y)) for x, y in rng.uniform(0.6, 63.4, (50, 2))]
        a = sample_at(spark, one, T1, pts, "bilinear")
        b = sample_at(spark, many, T1, pts, "bilinear")
        np.testing.assert_allclose(a, b, rtol=0, atol=0)

    def test_peaks_minmax(self, spark):
        # grid_tests.py:389-397
        g = tiles.grid_to_df(spark, "g", peaks(49), (0.0, 0.0, 30.0, 30.0, 0.0, 0.0),
                             tile=16)
        row = tiles.grid_minmax(g).collect()[0]
        assert row["min"] == pytest.approx(-6.5466445243204294)
        assert row["max"] == pytest.approx(8.075173545159231)


class TestResample:
    def test_resample_linear_exact(self, spark):
        # grid_tests.py:162-192: linear field exact under resampling
        def makevals(n):
            xx, yy = np.meshgrid(np.linspace(0.0, 1.0 - 2.0 / 300, n) * 0 + 0, [0])
            return None
        n = 150
        xx, yy = np.meshgrid(np.linspace(0.0, 1.0 - 2.0 / 300, n),
                             np.linspace(0.0, 1.0 - 2.0 / 300, n))
        # reference grids are in index space: transform (0,0,2,2,0,0)
        X, Y = np.meshgrid(np.arange(n) * 2.0 + 1.0, np.arange(n) * 2.0 + 1.0)
        zz = 2.0 * xx - 3.0 * yy
        T = (0.0, 0.0, 2.0, 2.0, 0.0, 0.0)
        g = tiles.grid_to_df(spark, "g", zz, T, tile=64)
        for method in ("nearest", "linear" ):
            sampled, tnew, (ny, nx) = sampling.resample(
                g, T, zz.shape, 6.0, 6.0,
                method="bilinear" if method == "linear" else "nearest", tile=64)
            assert (ny, nx) == (50, 50)
            # analytic solution on the new lattice
            pdf = sampled.orderBy("ti", "tj").toPandas()
            n2 = 50
            xx2, yy2 = np.meshgrid(np.linspace(0.0, 1.0 - 6.0 / 300, n2),
                                   np.linspace(0.0, 1.0 - 6.0 / 300, n2))
            sol = 2.0 * xx2 - 3.0 * yy2
            got = np.full((n2, n2), np.nan)
            got[pdf["ti"].to_numpy(), pdf["tj"].to_numpy()] = pdf["value"].to_numpy()
            assert np.nanmax(np.abs(got - sol)) < 1e-12


class TestGridpoints:
    def test_mean_per_cell(self, spark):
        # fillarray semantics (crfuncs.pyx:161-195): mean per cell
        pts = [(0.5, 0.5, 1.0), (0.9, 0.9, 3.0), (1.5, 0.5, 7.0)]
        df = spark.createDataFrame(pts, "x double, y double, z double")
        got = {(r["cell_i"], r["cell_j"]): (r["value"], r["n"])
               for r in gridpoints(df, T1).collect()}
        assert got[(0, 0)] == (2.0, 2)
        assert got[(0, 1)] == (7.0, 1)

    def test_reference_benchmark_shape(self, spark):
        # benchmark_gridpoints.py workload: n=50k seed 49, 100x100 grid
        np.random.seed(49)
        x = np.random.rand(50_000)
        y = np.random.rand(50_000)
        z = x ** 2 + np.sin(y)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
            "x double, y double, z double")
        T = (0.0, 0.0, 0.01, 0.01, 0.0, 0.0)
        got = gridpoints(df, T).collect()
        # every cell mean must equal the numpy reference
        I = np.round((y - T[1]) / 0.01 - 0.5).astype(int)
        J = np.round((x - T[0]) / 0.01 - 0.5).astype(int)
        import collections
        acc = collections.defaultdict(list)
        for i, j, v in zip(I, J, z):
            acc[(i, j)].append(v)
        for r in got[:200]:
            want = float(np.mean(acc[(r["cell_i"], r["cell_j"])]))
            assert r["value"] == pytest.approx(want, rel=1e-12)


class TestMergeAlgebra:
    def test_merge_golden(self, spark):
        # grid_tests.py:126-133
        g1 = tiles.grid_to_df(spark, "g1", np.ones((8, 8)), (10, 20, 1, 1, 0, 0))
        g2 = tiles.grid_to_df(spark, "g2", 2 * np.ones((4, 6)), (7, 22, 1, 1, 0, 0))
        g3 = tiles.grid_to_df(spark, "g3", 3 * np.ones((5, 5)), (12, 15, 1, 1, 0, 0))
        merged, T, (ny, nx) = algebra.merge_grids([g1, g2, g3])
        assert T == (7.0, 15.0, 1.0, 1.0, 0.0, 0.0)
        assert (ny, nx) == (13, 11)
        vals, _, _ = tiles.df_to_grid(merged)
        assert int(np.sum(np.isnan(vals))) == 42

    def test_merge_weighted_golden(self, spark):
        # grid_tests.py:135-142
        g1 = tiles.grid_to_df(spark, "g1", np.ones((8, 8)), (10, 20, 1, 1, 0, 0))
        g2 = tiles.grid_to_df(spark, "g2", 2 * np.ones((4, 6)), (7, 22, 1, 1, 0, 0))
        g3 = tiles.grid_to_df(spark, "g3", 3 * np.ones((5, 5)), (12, 19, 1, 1, 0, 0))
        merged, T, shape = algebra.merge_grids([g1, g2, g3], weights=[1, 2, 3])
        vals, _, _ = tiles.df_to_grid(merged)
        assert vals[4, 4] == pytest.approx(1.66666666666)
        assert vals[2, 8] == pytest.approx(2.5)
        assert vals[4, 5] == pytest.approx(2.33333333333)

    def test_grid_add_sub(self, spark):
        a = tiles.grid_to_df(spark, "a", np.full((4, 4), 3.0), T1)
        b = tiles.grid_to_df(spark, "b", np.full((4, 4), 1.5), T1)
        s, _, _ = tiles.df_to_grid(algebra.grid_add(a, b))
        d, _, _ = tiles.df_to_grid(algebra.grid_sub(a, b))
        assert np.allclose(s, 4.5) and np.allclose(d, 1.5)

    def test_grid_apply(self, spark):
        g = tiles.grid_to_df(spark, "g", np.array([[1.0, 4.0], [9.0, 16.0]]), T1)
        out, _, _ = tiles.df_to_grid(algebra.grid_apply(g, np.sqrt))
        assert np.allclose(out, [[1, 2], [3, 4]])


class TestMask:
    def test_mask_by_poly(self, spark):
        # semantics of grid_tests.py:459-556: inside kept, outside nodata
        g = tiles.grid_to_df(spark, "g", np.ones((10, 10)), T1, tile=8)
        tri = (np.array([(1.0, 1.0), (9.0, 1.0), (5.0, 9.0)]), [])
        masked, _, _ = tiles.df_to_grid(mask_by_poly(g, [tri]))
        from karta_spark.functions.kernels import winding_contains
        jj, ii = np.meshgrid(np.arange(10), np.arange(10))
        cx, cy = jj + 0.5, ii + 0.5
        want = winding_contains(cx.ravel(), cy.ravel(), tri[0]).reshape(10, 10)
        assert np.array_equal(~np.isnan(masked), want)


class TestTilesFromCells:
    def test_matches_driver_side_assembly(self, spark):
        rng = np.random.default_rng(9)
        gny, gnx = 40, 56
        # sparse cells (~60% fill)
        mask = rng.uniform(size=(gny, gnx)) < 0.6
        vals = rng.standard_normal((gny, gnx))
        rows = [(int(i), int(j), float(vals[i, j]))
                for i, j in zip(*np.nonzero(mask))]
        cdf = spark.createDataFrame(rows, "cell_i int, cell_j int, value double")
        got_df = tiles.tiles_from_cells(cdf, T1, (gny, gnx), tile=16)
        got, transform, _ = tiles.df_to_grid(got_df)
        want = np.where(mask, vals, np.nan)
        np.testing.assert_allclose(got, want, equal_nan=True)
        # halos correct: a stencil over this equals the stencil over a
        # driver-side grid_to_df of the same array
        from karta_spark.raster import stencil
        a, _, _ = tiles.df_to_grid(stencil.slope(got_df))
        b, _, _ = tiles.df_to_grid(stencil.slope(
            tiles.grid_to_df(spark, "ref", want, T1, tile=16)))
        np.testing.assert_allclose(a, b, equal_nan=True)


class TestMultiband:
    def test_three_band_sampling(self, spark):
        # reference resample_multiband golden shape (grid_tests.py:210-218):
        # constant bands 1/2/3 sample to their constants
        dfs = [tiles.grid_to_df(spark, "g", float(b + 1) * np.ones((8, 8)), T1, band=b)
               for b in range(3)]
        g = dfs[0].unionByName(dfs[1]).unionByName(dfs[2])
        pts = spark.createDataFrame([(0, 3.3, 4.7)], "pid long, x double, y double")
        row = sampling.sample_join_multiband(pts, g, T1, method="bilinear").collect()[0]
        assert (row["band_0"], row["band_1"], row["band_2"]) == (1.0, 2.0, 3.0)
