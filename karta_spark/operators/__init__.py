from karta_spark.operators import (  # noqa: F401
    dedup,
    hull,
    intersect_join,
    knn,
    pip_join,
    radius_join,
    similarity,
    skew,
    text,
)
