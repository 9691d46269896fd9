"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.9) and the north rule's
streaming-shaped requirement — resumable stages with lineage — is covered by
plans.lineage. This module adds the genuinely-streaming counterparts so the
engine also serves continuous ingest:

- ``streaming_tile_counts``: the flagship pipeline as a stream — cell
  encode + PIP + tile assign over a streaming image/point source with
  event-time watermarks and windowed counts.
- ``streaming_sessionize``: session windows over an event stream
  (the streaming twin of q31).
- ``run_foreach_batch_checkpoint``: foreachBatch sink writing parquet
  stages through plans.lineage, so a killed stream resumes from its
  checkpoint without recomputation.

All transformations are the same Catalyst expressions as the batch path —
one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from karta_spark.functions import cells
from karta_spark.operators.pip_join import PolygonSpec, _expr_able, polygon_contains_col


def with_cells_and_polys(stream: DataFrame, polys: list[PolygonSpec],
                         zoom: int = 8, lon: str = "x", lat: str = "y") -> DataFrame:
    """Attach tile ids and polygon membership to a (possibly streaming)
    point DataFrame using only expression-compilable polygons (streaming
    plans shouldn't carry driver-collected covers)."""
    out = stream.withColumn("tile", cells.tile_id(F.col(lon), F.col(lat), zoom))
    match = F.lit(None).cast("string")
    for p in reversed([p for p in polys if _expr_able(p)]):
        match = F.when(polygon_contains_col(p, F.col(lon), F.col(lat)),
                       F.lit(p.poly_id)).otherwise(match)
    return out.withColumn("poly_id", match)


def streaming_tile_counts(stream: DataFrame, polys: list[PolygonSpec],
                          zoom: int = 8, window: str = "1 minute",
                          watermark: str = "2 minutes",
                          ts_col: str = "ts") -> DataFrame:
    """Windowed per-(polygon, tile) counts with late-data watermarking."""
    enriched = with_cells_and_polys(stream, polys, zoom)
    return (
        enriched.where(F.col("poly_id").isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "poly_id", "tile")
        .agg(F.count("*").alias("n"))
    )


def streaming_sessionize(stream: DataFrame, gap: str = "30 minutes",
                         ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Session windows (inactivity gap) over an event stream —
    session_window + watermark (the streaming twin of batch q31)."""
    return (
        stream.withWatermark(ts_col, gap)
        .groupBy(F.session_window(ts_col, gap), user_col)
        .agg(F.count("*").alias("n_events"))
    )


def run_foreach_batch_checkpoint(query_df: DataFrame, root: str, stage: str,
                                 checkpoint_dir: str):
    """Start the stream with a foreachBatch sink that appends each
    micro-batch as parquet under <root>/<stage>/data; Spark's streaming
    checkpoint (offsets + state) makes the whole pipeline resumable."""
    import os

    def sink(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("append").parquet(os.path.join(root, stage, "data"))

    return (
        query_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )


def streaming_dedup(stream: DataFrame, keys: list[str], ts_col: str = "ts",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with a
    watermark bounding the dedup state (keys older than the watermark are
    evicted — the streaming twin of dedup.exact_dedup, and the shape every
    continuous-ingest training pipeline needs in front of its sinks)."""
    return stream.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(keys)
