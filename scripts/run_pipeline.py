"""spark-submit entry point for the flagship pipeline.

    spark-submit --py-files dist/karta_spark.zip scripts/run_pipeline.py \
        --images 100000000 --zoom 8 --tile-zoom 8 --out /tmp/karta_out

Runs: synthetic (or parquet) image table -> lonlat from phash -> broadcast
cell-cover PIP join -> tile assign -> per-(polygon, tile) counts, with every
stage checkpointed through plans.lineage so a killed job resumes without
recomputation. Identical code runs at N and 4N executors — only
`--conf spark.executor.instances` changes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1_000_000,
                    help="rows to synthesize (ignored with --input)")
    ap.add_argument("--input", default=None,
                    help="parquet path of an existing image table")
    ap.add_argument("--out", default="/tmp/karta_pipeline")
    ap.add_argument("--zoom", type=int, default=8, help="PIP cover zoom")
    ap.add_argument("--tile-zoom", type=int, default=8, help="output tile zoom")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    from karta_spark.functions import cells
    from karta_spark.operators import pip_join
    from karta_spark.plans import lineage
    from karta_spark.fixtures import flagship_polys
    FLAGSHIP_POLYS = flagship_polys()

    spark = SparkSession.builder.appName("karta-flagship").getOrCreate()
    t0 = time.monotonic()

    if args.input:
        imgs = spark.read.parquet(args.input)
        pts = imgs.select(
            "image_id", "phash",
            cells.lon_from_phash(F.col("phash")).alias("x"),
            cells.lat_from_phash(F.col("phash")).alias("y"))
    else:
        n = args.images
        parts = max(spark.sparkContext.defaultParallelism * 3, 8)
        pts = spark.range(0, n, 1, parts).select(
            F.col("id").alias("image_id"),
            ((F.col("id") * 2246822519 % F.lit(2 ** 31).cast("long"))
             * F.lit(2 ** 32).cast("long")
             + (F.col("id") * 2654435761 % F.lit(2 ** 32).cast("long"))).alias("phash"),
        ).select(
            "image_id", "phash",
            cells.lon_from_phash(F.col("phash")).alias("x"),
            cells.lat_from_phash(F.col("phash")).alias("y"))

    def stage_join():
        return pip_join.point_in_polygon_join(pts, FLAGSHIP_POLYS, zoom=args.zoom)

    joined = lineage.resume_or_run(stage_join, args.out, "pip_join", spark)

    def stage_tiles():
        return (
            joined.withColumn("tile", cells.tile_id(F.col("x"), F.col("y"), args.tile_zoom))
            .groupBy("poly_id", "tile").agg(F.count("*").alias("n_images"))
        )

    counts = lineage.resume_or_run(stage_tiles, args.out, "tile_counts", spark)
    total = counts.agg(F.sum("n_images")).collect()[0][0]
    dt = time.monotonic() - t0
    print(json.dumps({
        "joined_images": int(total or 0),
        "tiles": counts.count(),
        "wall_sec": round(dt, 2),
        "parallelism": spark.sparkContext.defaultParallelism,
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
