"""Hot-cell salting wired into the big-big PIP join (round 7).

The north rule demands data-driven skew handling (SURVEY §4): a phash
pileup puts ~20% of the corpus into ONE cell, and the cell-keyed
shuffle join in point_in_polygon_join_table would hand that cell to a
single reducer.  salt_threshold composes operators/skew.py's
histogram-driven salt map into that join: the point side picks a
stable hash salt, the cover side explodes hot cells x n_salt.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from karta_spark.operators import pip_join, skew


def _hot_points(spark, n=2000, hot_frac=0.25):
    """~hot_frac of the points pile onto one location (one cell)."""
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % int(1 / hot_frac) == 0, F.lit(2.0))
         .otherwise(((F.col("id") * 37) % 320) - 160 + 0.5).alias("x"),
        F.when(F.col("id") % int(1 / hot_frac) == 0, F.lit(1.5))
         .otherwise(((F.col("id") * 53) % 140) - 70 + 0.25).alias("y"))
    return df.select("id", F.col("x").cast("double"),
                     F.col("y").cast("double"))


def _polys(spark):
    rows = []
    diamond = [(0.0, 1.5), (2.0, 3.5), (4.0, 1.5), (2.0, -0.5)]
    quad = [(-60.0, -30.0), (-40.0, -30.0), (-40.0, -10.0), (-60.0, -10.0)]
    for pid, ring in (("diamond", diamond), ("quad", quad)):
        rows.append((pid, [{"x": float(x), "y": float(y)} for x, y in ring]))
    return spark.createDataFrame(
        rows, "poly_id string, vertices array<struct<x double, y double>>")


class TestPipSalting:
    def test_salted_equals_unsalted(self, spark):
        pts = _hot_points(spark)
        polys = _polys(spark)
        base = pip_join.point_in_polygon_join_table(
            pts, polys, zoom=5, small_table_threshold=None)
        salted = pip_join.point_in_polygon_join_table(
            pts, polys, zoom=5, small_table_threshold=None,
            salt_threshold=50)
        a = sorted((r["id"], r["poly_id"]) for r in base.collect())
        b = sorted((r["id"], r["poly_id"]) for r in salted.collect())
        assert a == b and len(a) > 0
        # the hot pile (id % 4 == 0 at (2.0, 1.5)) is inside the diamond
        hot = [t for t in a if t[1] == "diamond" and t[0] % 4 == 0]
        assert len(hot) == 500

    def test_salted_plan_splits_hot_cell(self, spark):
        pts = _hot_points(spark)
        polys = _polys(spark)
        salted = pip_join.point_in_polygon_join_table(
            pts, polys, zoom=5, small_table_threshold=None,
            salt_threshold=50)
        plan = salted._jdf.queryExecution().toString()
        assert "salt" in plan  # join key extended to (cell_id, salt)

    def test_salt_map_fanout_matches_histogram(self, spark):
        pts = _hot_points(spark).withColumn(
            "cell_id", F.when(F.col("id") % 4 == 0, F.lit(7)).otherwise(
                F.col("id") + 10000))
        hist = skew.cell_histogram(pts)
        m = {r["cell_id"]: r["n_salt"]
             for r in skew.salt_map(hist, threshold=100).collect()}
        assert m == {7: 5}  # 500 rows / 100 -> fan-out 5, only the hot cell
