from karta_spark.functions import cells, crs, geodesy, geometry, kernels  # noqa: F401
