"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      — exact brute-force top-k per query: cosine computed
  with Catalyst higher-order functions (zip_with + aggregate — JVM-side,
  no Python), window top-k.  The correctness baseline.
- ``hyperplane_lsh``   — random-hyperplane signatures (sign sketch) for
  bucketed ANN: candidates only within matching buckets; the 100 TB path.
- ``ivf_topk``         — inverted-file ANN: coarse quantize to the nearest
  of C centroids (broadcast), probe the query's nprobe nearest lists.

Scale notes: brute force is O(Q*N) — fine when one side broadcasts; both
LSH and IVF turn the cross join into an equi-join on bucket keys, which is
the only shape that survives 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType


def dot_expr(a, b):
    """Σ a_i * b_i via zip_with + aggregate (Catalyst HOFs, double math)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a):
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a, b):
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int,
    vec_col: str = "embedding", vid: str = "vec_id",
    q_vec: str = "q_embedding", qid: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query (ties broken by lowest vec id)."""
    q = F.broadcast(queries) if broadcast_queries else queries
    joined = vectors.crossJoin(q).withColumn("cosine", cosine_expr(vec_col, q_vec))
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(vid).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, vid, "cosine", "rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def hyperplane_signature(df: DataFrame, vec_col: str, dim: int,
                         nbits: int = 16, seed: int = 7, out: str = "lsh_bucket") -> DataFrame:
    """Sign-sketch bucket id per vector (random hyperplane LSH)."""
    H = _hyperplanes(dim, nbits, seed)

    @F.pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (M @ H.T) > 0
        vals = np.zeros(len(M), dtype=np.int64)
        for b in range(nbits):
            vals |= bits[:, b].astype(np.int64) << b
        return pd.Series(vals.astype(np.int32))

    return df.withColumn(out, bucket(F.col(vec_col)))


def lsh_topk(
    vectors: DataFrame, queries: DataFrame, k: int, dim: int,
    vec_col: str = "embedding", vid: str = "vec_id",
    q_vec: str = "q_embedding", qid: str = "query_id",
    nbits: int = 8, seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket. Recall is
    tunable via nbits (fewer bits = bigger buckets = higher recall)."""
    v = hyperplane_signature(vectors, vec_col, dim, nbits, seed)
    q = hyperplane_signature(queries, q_vec, dim, nbits, seed)
    joined = v.join(q, "lsh_bucket").withColumn("cosine", cosine_expr(vec_col, q_vec))
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(vid).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, vid, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# hyperplane LSH, portable variant (engine-agnostic arithmetic)
# ---------------------------------------------------------------------------
#
# Gaussian hyperplanes need float dot products whose sign near zero can
# differ across engines (summation order).  The portable variant uses
# seeded Rademacher (+/-1) hyperplanes over floor-quantized components
# s_i = floor(v_i * 2^20): every intermediate is an integer far below
# 2^53, so double arithmetic on them is EXACT and order-independent —
# identical bucket assignments in Spark and DuckDB, which moves the LSH
# top-k gate query under the exact oracle.  Multiplying by 2^20 is itself
# exact (power of two), as is float32 -> double widening.

_Q_SCALE = 1 << 20


def _rademacher_planes(dim: int, nbits: int, seed: int = 7) -> list[list[int]]:
    import random as _random
    rng = _random.Random(seed)
    return [[rng.randrange(2) * 2 - 1 for _ in range(dim)] for _ in range(nbits)]


def portable_bucket_expr(vec_col, dim: int, nbits: int, seed: int = 7):
    """'0'/'1' bucket string from sign(Σ r_i * floor(v_i * 2^20))."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _rademacher_planes(dim, nbits, seed)
    s = F.transform(v, lambda x: F.floor(x.cast("double") * _Q_SCALE).cast("double"))
    bits = []
    for r in planes:
        lit_r = F.array(*[F.lit(float(c)) for c in r])
        dot = F.aggregate(F.zip_with(s, lit_r, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk_portable(
    vectors: DataFrame, queries: DataFrame, k: int, dim: int,
    vec_col: str = "embedding", vid: str = "vec_id",
    q_vec: str = "q_embedding", qid: str = "query_id",
    nbits: int = 8, seed: int = 7,
) -> DataFrame:
    """lsh_topk with portable (Rademacher/quantized) bucketing — identical
    semantics, oracle-replicable candidates.  Cosine + ranking follow the
    proven q18 discipline (double HOF dot product, ties by vec id)."""
    v = vectors.withColumn("_bk", portable_bucket_expr(vec_col, dim, nbits, seed))
    q = queries.withColumn("_bk", portable_bucket_expr(q_vec, dim, nbits, seed))
    joined = v.join(q, "_bk").withColumn("cosine", cosine_expr(vec_col, q_vec))
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(vid).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, vid, "cosine", "rank")
    )


def lsh_topk_portable_sql(
    k: int, dim: int, nbits: int = 8, seed: int = 7,
    table: str = "embeddings", vec_col: str = "embedding", vid: str = "vec_id",
    query_filter: str = "vec_id < 5", vector_filter: str = "vec_id >= 5",
) -> str:
    """DuckDB twin of lsh_topk_portable: same planes, same quantization,
    bit-identical buckets; cosine/rank mirror the q18 oracle form."""
    planes = _rademacher_planes(dim, nbits, seed)

    def bucket_sql(col: str) -> str:
        parts = []
        for r in planes:
            lit = "[" + ", ".join(f"{float(c):.1f}" for c in r) + "]::DOUBLE[]"
            parts.append(
                "(CASE WHEN list_dot_product("
                f"list_transform(CAST({col} AS DOUBLE[]), x -> floor(x * {_Q_SCALE})), {lit})"
                " > 0 THEN '1' ELSE '0' END)")
        return "||".join(parts)

    return f"""
WITH q AS (
  SELECT {vid} AS query_id, CAST({vec_col} AS DOUBLE[]) AS qv,
         {bucket_sql(vec_col)} AS bk
  FROM {table} WHERE {query_filter}
),
v AS (
  SELECT {vid}, CAST({vec_col} AS DOUBLE[]) AS ev,
         {bucket_sql(vec_col)} AS bk
  FROM {table} WHERE {vector_filter}
),
joined AS (
  SELECT query_id, {vid},
         list_dot_product(ev, qv)
           / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS cosine
  FROM v JOIN q USING (bk)
),
ranked AS (
  SELECT query_id, {vid}, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, {vid} ASC) AS BIGINT) AS rank
  FROM joined
)
SELECT query_id, {vid}, round(cosine, 6) AS cosine, rank FROM ranked WHERE rank <= {k}
"""


def train_centroids(vectors: DataFrame, vec_col: str, c: int, iters: int = 3,
                    seed: int = 11) -> np.ndarray:
    """Tiny driver-side k-means on a sample (centroids broadcast afterwards).

    Sampling uses df.sample (uniform across partitions) rather than limit()
    — limit() would take only the first partitions' rows, biasing the
    centroids toward whatever keys sort first."""
    n_target = max(c * 50, 1000)
    total = vectors.count()
    frac = min(1.0, 3.0 * n_target / max(total, 1))
    sample = np.array([
        np.asarray(r[0], dtype=np.float64)
        for r in vectors.select(vec_col).sample(fraction=frac, seed=seed)
                        .limit(n_target).collect()
    ])
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(c, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                cent[j] = sample[m].mean(0)
    return cent


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray,
               out: str = "ivf_list") -> DataFrame:
    C = centroids

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        return pd.Series(d.argmin(1).astype(np.int32))

    return df.withColumn(out, assign(F.col(vec_col)))


def ivf_probe_lists(queries: DataFrame, q_vec: str, centroids: np.ndarray,
                    nprobe: int = 2, out: str = "ivf_list") -> DataFrame:
    C = centroids

    @F.pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d, axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in idx])

    return queries.withColumn(out, F.explode(probes(F.col(q_vec))))


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, k: int, c: int = 16, nprobe: int = 2,
    vec_col: str = "embedding", vid: str = "vec_id",
    q_vec: str = "q_embedding", qid: str = "query_id",
) -> DataFrame:
    """IVF ANN top-k: equi-join on the coarse list id."""
    cent = train_centroids(vectors, vec_col, c)
    v = ivf_assign(vectors, vec_col, cent)
    q = ivf_probe_lists(queries, q_vec, cent, nprobe)
    joined = v.join(q, "ivf_list").withColumn("cosine", cosine_expr(vec_col, q_vec))
    w = Window.partitionBy(qid).orderBy(F.col("cosine").desc(), F.col(vid).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, vid, "cosine", "rank")
        .dropDuplicates([qid, vid])
    )
