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

from karta_spark.functions.kernels import convex_hull, convex_hull_sph


def convex_hull_df(points: DataFrame, px: str = "x", py: str = "y",
                   spherical: bool = False) -> np.ndarray:
    """Exact convex hull vertices of a point DataFrame.

    Planar: Graham-type hull (CRS dispatch as geometry.py:600-613);
    spherical: geodesic hull (convexhull.pyx:84-148; hemisphere-bounded
    point sets, as the reference assumes).  Per-partition partial hulls
    lose no hull vertex of the union, so the collected set is tiny."""
    kern = convex_hull_sph if spherical else convex_hull

    def partial(batches):
        for pdf in batches:
            pts = pdf[[px, py]].to_numpy(dtype=np.float64)
            if len(pts) == 0:
                continue
            idx = kern(pts)
            yield pd.DataFrame(pts[idx], columns=[px, py])

    partials = points.select(px, py).mapInPandas(
        partial, f"{px} double, {py} double").toPandas()
    if len(partials) == 0:
        return np.empty((0, 2))
    pts = partials.to_numpy(dtype=np.float64)
    return pts[kern(pts)]
