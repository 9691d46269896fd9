from karta_spark.plans import lineage  # noqa: F401
