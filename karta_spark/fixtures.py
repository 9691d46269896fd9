"""Shared geometry fixtures (ported reference test polygons).

Packaged inside karta_spark so spark-submit --py-files jobs can use them
without the repo checkout.
"""

from __future__ import annotations

import numpy as np

from karta_spark.operators.pip_join import PolygonSpec

# seeded region heptagon from reference tests/vector_predicate_tests.py:208-221
HEPTAGON = np.array(
    [(-80, 0), (-50, -10), (20, -8), (35, -17), (55, 15), (-45, 18), (-60, 12)],
    dtype=np.float64,
)
NORTH_QUAD = np.array([(-120, 20), (-60, 20), (-60, 60), (-120, 60)], dtype=np.float64)
EAST_TRI = np.array([(60, -40), (150, -10), (80, 30)], dtype=np.float64)


def flagship_polys() -> list[PolygonSpec]:
    return [
        PolygonSpec("heptagon", HEPTAGON, crs="lonlat"),
        PolygonSpec("north_quad", NORTH_QUAD, crs="lonlat"),
        PolygonSpec("east_tri", EAST_TRI, crs="lonlat"),
    ]
