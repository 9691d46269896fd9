"""Pipeline-granular resume (round 7): a multi-stage pipeline run
through plans/lineage.resume_or_run re-runs ONLY the stage whose
checkpoint is missing — killing a job and restarting with the same
root skips completed stages entirely (north rule resumability;
q99_multimodal_pipeline_resume runs the production-shaped chain)."""
import os
import shutil

import pytest
from pyspark.sql import functions as F

from karta_spark.plans import lineage


@pytest.fixture()
def root(tmp_path):
    p = str(tmp_path / "ckpt")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _pipeline(spark, root, calls):
    """Three dependent stages; `calls` records which builders ran."""
    def build_a():
        calls.append("a")
        return spark.range(100).select(
            F.col("id"), (F.col("id") * 3).alias("v"))

    a = lineage.resume_or_run(build_a, root, "stage_a", spark=spark)

    def build_b():
        calls.append("b")
        return a.where(F.col("v") % 2 == 0).withColumn(
            "w", F.col("v") + 1)

    b = lineage.resume_or_run(build_b, root, "stage_b", spark=spark)

    def build_c():
        calls.append("c")
        return b.agg(F.count("*").alias("n"), F.sum("w").alias("s"))

    return lineage.resume_or_run(build_c, root, "stage_c", spark=spark)


class TestPipelineResume:
    def test_fresh_run_builds_all_and_result_is_correct(self, spark, root):
        calls = []
        out = _pipeline(spark, root, calls).collect()[0]
        assert calls == ["a", "b", "c"]
        # ids with v=3*id even -> even ids: 50 rows; w = 6k+1
        assert out["n"] == 50 and out["s"] == sum(6 * k + 1
                                                  for k in range(50))

    def test_completed_run_rebuilds_nothing(self, spark, root):
        _pipeline(spark, root, [])
        calls = []
        out = _pipeline(spark, root, calls).collect()[0]
        assert calls == []            # every stage resumed from parquet
        assert out["n"] == 50

    def test_deleting_one_marker_reruns_only_that_stage(self, spark, root):
        _pipeline(spark, root, [])
        os.remove(os.path.join(root, "stage_b", "_SUCCESS_STAGE"))
        calls = []
        out = _pipeline(spark, root, calls).collect()[0]
        assert calls == ["b"]         # a and c resumed, b rebuilt
        assert out["n"] == 50

    def test_killed_mid_stage_resumes_from_last_marker(self, spark, root):
        # simulate a kill between stage_a and stage_b: only stage_a's
        # checkpoint exists
        calls = []

        def build_a():
            calls.append("a")
            return spark.range(100).select(
                F.col("id"), (F.col("id") * 3).alias("v"))

        lineage.resume_or_run(build_a, root, "stage_a", spark=spark)
        assert lineage.stage_complete(root, "stage_a")
        assert not lineage.stage_complete(root, "stage_b")
        # "restart": full pipeline over the same root
        calls2 = []
        _pipeline(spark, root, calls2)
        assert calls2 == ["b", "c"]   # stage_a rescued (even though its
        # contents came from the pre-kill run)

    def test_lineage_metrics_recorded_per_stage(self, spark, root):
        _pipeline(spark, root, [])
        lt = lineage.lineage_table(spark, root, "stage_a")
        rows = lt.collect()
        assert len(rows) >= 1
        assert sum(r["row_count"] for r in rows) == 100
        assert all(r["stage"] == "stage_a" for r in rows)
