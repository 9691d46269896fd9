"""Skew handling: data-driven hot-cell salting.

phash-seeded coordinates (and any real geo corpus) pile onto few cells; AQE
skew-join splitting helps at shuffle time, but a broadcast cell join needs
explicit salting (SURVEY §4: salting must be data-driven, via a histogram,
not static).

Pattern: histogram the big side's cell_id; cells above *threshold* get a
salt fan-out k = ceil(count/threshold); the big side adds
``salt = pmod(hash(row), k)``; the small (replicated) side explodes each hot
cell x k.  Join key becomes (cell_id, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(df: DataFrame, cell: str = "cell_id") -> DataFrame:
    return df.groupBy(cell).agg(F.count("*").alias("cell_count"))


def salt_map(hist: DataFrame, threshold: int, cell: str = "cell_id") -> DataFrame:
    """(cell_id, n_salt) for hot cells only."""
    return (
        hist.where(F.col("cell_count") > threshold)
        .select(cell, F.ceil(F.col("cell_count") / threshold).cast("int").alias("n_salt"))
    )


def salted_join(
    big: DataFrame, small: DataFrame, threshold: int = 2_000_000,
    cell: str = "cell_id", hash_cols: list | None = None,
    broadcast_small: bool = True,
) -> DataFrame:
    """big ⋈ small on cell_id with hot cells salted.

    *small* is the replicated side (e.g. polygon cover cells); rows for hot
    cells are exploded n_salt times. *big* rows in hot cells pick a stable
    pseudo-random salt from a hash of ``hash_cols`` (default: all columns).
    With ``broadcast_small=False`` the join is a salted shuffle hash join —
    the big-big form (both sides exchange on (cell_id, salt), hot keys
    split across n_salt reducers).
    """
    hist = cell_histogram(big, cell)
    salts = F.broadcast(salt_map(hist, threshold, cell))

    big_s = big.join(salts, cell, "left").withColumn(
        "salt",
        F.when(F.col("n_salt").isNull(), F.lit(0)).otherwise(
            F.pmod(F.xxhash64(*(hash_cols or big.columns)), F.col("n_salt")).cast("int")
        ),
    ).drop("n_salt")

    small_s = small.join(salts, cell, "left").withColumn(
        "salt",
        F.explode(F.sequence(F.lit(0), F.coalesce(F.col("n_salt") - 1, F.lit(0)))),
    ).drop("n_salt")

    if broadcast_small:
        small_s = F.broadcast(small_s)
    return big_s.join(small_s, [cell, "salt"]).drop("salt")
