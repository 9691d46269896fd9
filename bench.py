"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

--scaling mode: run the flagship spatial-join pipeline (images -> cell
encode -> PIP -> tile assign -> agg) at two parallelism levels (local[8] vs
local[32]) on identical input and report throughput at both plus scaling
efficiency — the sandbox evidence for the north rule's N -> 4N criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    try:
        return float(d.rstrip("/").split("sf")[-1])
    except ValueError:
        return -1.0


def flagship_pipeline(spark, n_images: int, zoom: int = 8):
    """The benchmark kernel: synthetic image table -> lonlat from phash ->
    cell-keyed broadcast PIP join -> slippy tile assign -> per-(poly, tile)
    counts. Returns the number of joined rows (forces full execution)."""
    from pyspark.sql import functions as F
    from karta_spark.functions import cells
    from karta_spark.operators import pip_join
    from __spark_entry__ import FLAGSHIP_POLYS

    imgs = spark.range(0, n_images, 1, CPUS * 3).select(
        F.col("id"),
        (F.col("id") * 2654435761 % F.lit(2 ** 32).cast("long")).alias("_lo"),
        (F.col("id") * 2246822519 % F.lit(2 ** 31).cast("long")).alias("_hi"),
    ).select(
        "id",
        (F.col("_hi") * F.lit(2 ** 32).cast("long") + F.col("_lo")).alias("phash"),
    )
    pts = imgs.select(
        "id", "phash",
        cells.lon_from_phash(F.col("phash")).alias("x"),
        cells.lat_from_phash(F.col("phash")).alias("y"),
    )
    joined = pip_join.point_in_polygon_join(pts, FLAGSHIP_POLYS, zoom=zoom)
    tiled = joined.withColumn("tile", cells.tile_id(F.col("x"), F.col("y"), 8))
    agg = tiled.groupBy("poly_id", "tile").agg(F.count("*").alias("n"))
    return agg.agg(F.sum("n")).collect()[0][0]


def run_benchmark():
    from karta_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    sf = _sf_from_dir(SF_DIR)

    headline = [
        "q01_pricing_summary", "q02_revenue_by_nation", "q06_tile_assign",
        "q07_pip_heptagon", "q09_knn", "q11_gridpoints", "q13_path_length",
        "q14_dedup_exact", "q17_ngram_jaccard", "q18_cosine_topk",
        "q21_minhash_pairs", "q25_pip_join_full",
    ]
    qs = entry.queries()
    times: dict[str, float] = {}
    for name in headline:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        times[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {times[name]:.2f}s rows={n}", file=sys.stderr)

    # flagship image pipeline throughput (images/sec through encode+PIP+tile)
    n_images = 100_000_000
    flagship_pipeline(spark, 200_000)  # warm the codegen/JIT path
    t0 = time.monotonic()
    flagship_pipeline(spark, n_images)
    dt = time.monotonic() - t0
    times["flagship_images_100m"] = round(dt, 3)
    ips = n_images / dt
    print(f"# flagship: {dt:.2f}s = {ips:,.0f} images/sec", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "spatial-join + pipeline headline suite (images/sec via flagship)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "images_per_sec": round(ips, 1),
        "cpus": CPUS,
    }))
    spark.stop()


def run_scaling(n_images: int = 1_200_000_000, levels=(8, 32)):
    """Same job at two parallelism levels on identical input -> efficiency.

    Also measures the machine's own frequency-scaling ceiling with a pure
    compute job (sum of sin over 2B rows): on this box the all-core turbo
    drop caps ANY perfectly-parallel job below 1.0 from 8 -> 32 cores, so
    the report carries both the raw efficiency and the ceiling-normalized
    one.  On a real cluster (N vs 4N executors at fixed clock) the
    normalized figure is the relevant one: per-executor throughput is flat.
    """
    from karta_spark.session import get_spark
    from pyspark.sql import functions as F

    global CPUS
    results = {}
    ceiling = {}
    for cpus in levels:
        CPUS = cpus
        spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
        flagship_pipeline(spark, 200_000)  # warm up JVM/Arrow/JIT paths
        t0 = time.monotonic()
        flagship_pipeline(spark, n_images)
        dt = time.monotonic() - t0
        results[cpus] = {"sec": round(dt, 3),
                         "images_per_sec": round(n_images / dt, 1)}
        print(f"# local[{cpus}]: {dt:.2f}s = {n_images/dt:,.0f} images/sec",
              file=sys.stderr)
        # machine ceiling: embarrassingly-parallel pure-JVM compute
        cdf = spark.range(0, 2_000_000_000, 1, cpus * 3)
        t0 = time.monotonic()
        cdf.select(F.sin(F.col("id").cast("double")).alias("s")).agg(F.sum("s")).collect()
        ceiling[cpus] = time.monotonic() - t0
        spark.stop()
    lo, hi = levels
    eff = (results[hi]["images_per_sec"] / results[lo]["images_per_sec"]) / (hi / lo)
    ceil_eff = (ceiling[lo] / ceiling[hi]) / (hi / lo)
    out = {
        "metric": f"scaling efficiency local[{lo}] -> local[{hi}] (flagship pipeline)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_images": n_images,
        "levels": {str(k): v for k, v in results.items()},
        "machine_ceiling_efficiency": round(ceil_eff, 3),
        "normalized_efficiency": round(eff / ceil_eff, 3),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_benchmark()
