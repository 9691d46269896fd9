from karta_spark.sources import images, tables  # noqa: F401
