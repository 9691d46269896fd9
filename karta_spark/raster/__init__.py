from karta_spark.raster import algebra, gridpoints, mask, sampling, tiles  # noqa: F401
