"""Trained-IVF replica stability (round 7).

train_centroids samples by a hash of the vector CONTENT (xxhash64),
so the codebook is a pure function of the corpus: any repartitioning,
coalescing, or cluster resize yields bit-identical centroids, list
assignments, and trained top-k results.  df.sample's per-partition
seeding broke this (same seed + different layout = different sample).
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from karta_spark.operators import similarity


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(96)
    rows = [(i, rng.normal(size=16).astype(float).tolist())
            for i in range(400)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").persist()


class TestTrainedIvfDeterminism:
    def test_centroids_bit_identical_across_layouts(self, spark, corpus):
        a = similarity.train_centroids(corpus.repartition(3),
                                       "embedding", 6)
        b = similarity.train_centroids(corpus.repartition(17, "vec_id"),
                                       "embedding", 6)
        c = similarity.train_centroids(corpus.coalesce(1), "embedding", 6)
        assert np.array_equal(a, b) and np.array_equal(a, c)

    def test_assignment_and_topk_identical_across_layouts(self, spark,
                                                          corpus):
        queries = corpus.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"))
        vectors = corpus.where(F.col("vec_id") >= 4)
        outs = []
        for layout in (vectors.repartition(2),
                       vectors.repartition(11, "vec_id")):
            top = similarity.ivf_topk(layout, queries, k=3, c=6, nprobe=2)
            outs.append(sorted((r["query_id"], r["rank"], r["vec_id"],
                                round(r["cosine"], 12))
                               for r in top.collect()))
        assert outs[0] == outs[1] and len(outs[0]) == 12

    def test_seed_changes_sample(self, spark, corpus):
        a = similarity.train_centroids(corpus, "embedding", 6, seed=11)
        b = similarity.train_centroids(corpus, "embedding", 6, seed=12)
        assert not np.array_equal(a, b)


class TestIvfListStats:
    def test_skewed_list_surfaces(self, spark):
        # 90 vectors near one centroid direction, 10 near another: the
        # hot list must lead the stats and clear a max_list filter
        import numpy as np
        rng = np.random.default_rng(3)
        hot = rng.normal(size=8)
        cold = -hot
        rows = [(i, (hot + rng.normal(scale=0.01, size=8)).tolist())
                for i in range(90)]
        rows += [(100 + i, (cold + rng.normal(scale=0.01, size=8)).tolist())
                 for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cent = np.stack([hot, cold])
        assigned = similarity.ivf_assign(df, "embedding", cent)
        stats = similarity.ivf_list_stats(assigned).collect()
        assert stats[0]["members"] == 90
        assert abs(stats[0]["corpus_share"] - 0.9) < 1e-9
        flagged = similarity.ivf_list_stats(assigned, max_list=50).collect()
        assert len(flagged) == 1 and flagged[0]["members"] == 90
        assert similarity.ivf_list_stats(assigned, max_list=200).count() == 0
