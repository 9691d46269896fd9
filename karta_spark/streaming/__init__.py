from karta_spark.streaming import stream_ops  # noqa: F401
