from karta_spark.functions import cells, geodesy, geometry, kernels  # noqa: F401
