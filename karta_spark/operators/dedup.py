"""Deduplication operators for the documents table.

First-class large-scale-pipeline ops (not in the reference, which has only
point-set duplicate bucketing at quadtree build, quadtree.pyx:88-95):

- exact dedup           — hash groupBy, keep lowest id
- n-gram Jaccard pairs  — explode distinct shingles, self-join, exact
                          |A∩B| / |A∪B| — fully SQL-expressible (oracle-able)
- MinHash + LSH         — numpy signature kernel in a pandas UDF, banded
                          bucket join, exact-Jaccard verify of candidates
- SimHash               — 64-bit token-hash sketch + hamming-band join
- embedding near-dup    — cosine over a normalized vector column

All shuffles are keyed on content hashes (uniform by construction — no skew
salting needed); candidate generation never crosses buckets, so the O(n^2)
blowup is bounded per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one row (lowest id) per distinct value of *cols*."""
    w = Window.partitionBy(*cols).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def duplicate_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """(canonical_id, n_dups) per content group with >= 1 row."""
    return df.groupBy(*cols).agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dups")
    ).select("canonical_id", "n_dups")


# ---------------------------------------------------------------------------
# character n-gram Jaccard (exact)
# ---------------------------------------------------------------------------

def ngrams(col, n: int = 3):
    """Distinct character n-grams of a string column — pure Catalyst
    (sequence + transform + substring), no UDF."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(n))))


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard >= threshold (id_a < id_b).

    Plan: explode distinct shingles -> self equi-join on shingle (only pairs
    sharing one shingle are generated) -> count intersections -> join set
    sizes -> Jaccard filter. Every step is a hash agg/join on a content key.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(ngrams(F.col(text_col), n)).alias("gram"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=num_perm, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.integers(0, 1 << 62, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Distinct character n-gram hashes (crc32 — C speed; 32-bit range is
    ample for minhash candidate generation)."""
    import zlib as _zlib
    data = text or ""
    if len(data) < n:
        data = data + "\x00" * (n - len(data))
    bs = data.encode("utf-8", "ignore")
    grams = {bs[i:i + n] for i in range(len(bs) - n + 1)}
    return np.fromiter((_zlib.crc32(g) for g in grams), dtype=np.uint64, count=len(grams))


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str,
    num_perm: int = 64, shingle: int = 3, seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures.

    Permutation family: odd-multiplier wraparound affine maps on uint64
    ((a*h + b) mod 2^64) — a standard practical MinHash family, fully
    vectorized (num_perm x n_shingles uint64 matrix per doc)."""
    a, b = _minhash_params(num_perm, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            hv = _shingle_hashes(t or "", shingle)
            m = hv[None, :] * a[:, None] + b[:, None]  # uint64 wraparound
            out.append(m.min(axis=1).view(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame, text_col: str, id_col: str,
    num_perm: int = 64, bands: int = 16, shingle: int = 3,
    threshold: float = 0.5, seed: int = 42, verify: bool = True,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH, optionally verified with exact
    n-gram Jaccard on candidates only (the classic shingle->minhash->band->
    bucket-join pipeline)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle, seed)
    banded = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band)
                           .cast("array<string>").cast("string")).alias("bucket"),
            )
            for i in range(bands)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if not verify:
        return cand
    texts = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    pairs = (
        cand.join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
        .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
    )

    @F.pandas_udf("double")
    def jaccard_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
        cache: dict[str, frozenset] = {}

        def sset(t):
            t = t or ""
            s = cache.get(t)
            if s is None:
                s = frozenset(t[j:j + shingle] for j in range(max(len(t) - shingle + 1, 1)))
                cache[t] = s
            return s

        out = np.empty(len(ta))
        for i in range(len(ta)):
            sa, sb = sset(ta.iloc[i]), sset(tb.iloc[i])
            u = len(sa | sb)
            out[i] = len(sa & sb) / u if u else 0.0
        return pd.Series(out)

    return (
        pairs.withColumn("jaccard", jaccard_udf("t_a", "t_b"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens (FNV token hashes; sign of the
    per-bit weighted sum). Returns (id, simhash long)."""
    import hashlib

    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                out[i] = 0
                continue
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(tok.encode("utf-8", "ignore"),
                                                digest_size=8).digest(), "little")
                 for tok in toks),
                dtype=np.uint64, count=len(toks))
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            acc = np.where(bits == 1, 1, -1).sum(axis=0)
            val = np.uint64(0)
            for bit in range(64):
                if acc[bit] > 0:
                    val |= np.uint64(1) << np.uint64(bit)
            out[i] = val.astype(np.int64) if hasattr(val, "astype") else np.int64(val)
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), sim_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str, id_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4-band
    exact-match blocking (any pair within hamming 3 shares >= 1 of 4 bands)."""
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for i in range(4)
        ])).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming) \
               .select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold. Small-table form is a
    self-join; scale path = LSH bucketing (similarity.hyperplane_lsh)."""
    from karta_spark.operators.similarity import cosine_expr
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr("v_a", "v_b"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
