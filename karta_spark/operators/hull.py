"""Distributed convex hull.

Reference: Graham-type scan (convexhull.pyx:18-82), dispatched per CRS at
geometry.py:600-613.  Distributed form (SURVEY §2.6): per-partition partial
hull (a hull of a subset loses no hull vertex of the union), collect the
small union of partials, final exact hull on the driver — hull-of-hulls is
exact, and the collected set is O(sqrt(n)) in practice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from karta_spark.functions.kernels import convex_hull


def convex_hull_df(points: DataFrame, px: str = "x", py: str = "y") -> np.ndarray:
    """Exact planar convex hull vertices (ccw) of a point DataFrame."""
    def partial(batches):
        for pdf in batches:
            pts = pdf[[px, py]].to_numpy(dtype=np.float64)
            if len(pts) == 0:
                continue
            idx = convex_hull(pts)
            yield pd.DataFrame(pts[idx], columns=[px, py])

    partials = points.select(px, py).mapInPandas(
        partial, f"{px} double, {py} double").toPandas()
    if len(partials) == 0:
        return np.empty((0, 2))
    pts = partials.to_numpy(dtype=np.float64)
    return pts[convex_hull(pts)]
