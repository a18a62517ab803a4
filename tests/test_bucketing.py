"""Bucketed-layout tests: co-located joins must not shuffle the fact side."""

import pytest

from ragstudio_spark.operators import bucketing
from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline
from ragstudio_spark.sources import transcripts as tsrc


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # tables land in the session's default warehouse dir (./spark-warehouse,
    # gitignored); spark.sql.warehouse.dir is static and can't move mid-session
    out = run_pipeline(
        tsrc.transcripts_df(spark, 200, seed=81, partitions=4), PipelineConfig()
    )
    bucketing.write_bucketed(out.chunks, "chunks_b", n_buckets=8)
    bucketing.write_bucketed(out.metrics, "metrics_b", n_buckets=8)
    yield "chunks_b", "metrics_b"
    spark.sql("DROP TABLE IF EXISTS chunks_b")
    spark.sql("DROP TABLE IF EXISTS metrics_b")


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the bucket layout (not a broadcast of the
    toy-sized dim) is what eliminates shuffles — at 100 TB neither side
    broadcasts."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


class TestBucketedJoin:
    def test_colocated_join_has_no_shuffle(self, spark, bucketed_tables, no_broadcast):
        left, right = bucketed_tables
        joined = bucketing.colocated_join(spark, left, right, on=("conv_id",))
        sel = joined.select("conv_id", "chunk_id", "status")
        assert bucketing.plan_shuffle_exchanges(sel) == 0, "bucketed join must not shuffle"
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert sel.count() > 0

    def test_unbucketed_join_does_shuffle(self, spark, bucketed_tables, no_broadcast):
        """Control: the same join with the bucket layout stripped needs
        shuffle Exchanges — proves the layout is what removes them."""
        left, right = bucketed_tables
        a = spark.table(left).repartition(4)
        b = spark.table(right).repartition(4)
        joined = a.join(b, on="conv_id").select("conv_id", "chunk_id", "status")
        assert bucketing.plan_shuffle_exchanges(joined) > 0

    def test_join_result_matches_unbucketed(self, spark, bucketed_tables):
        left, right = bucketed_tables
        fast = bucketing.colocated_join(spark, left, right, on=("conv_id",))
        slow = spark.table(left).repartition(4).join(
            spark.table(right).repartition(4), on="conv_id"
        )
        assert fast.count() == slow.count()

    def test_broadcast_still_wins_for_tiny_dims(self, spark, bucketed_tables):
        """With default thresholds the planner broadcasts the toy-sized dim
        (optimal locally); bucketing matters when nothing fits in memory."""
        left, right = bucketed_tables
        sel = bucketing.colocated_join(spark, left, right).select("conv_id", "chunk_id")
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
        assert bucketing.plan_shuffle_exchanges(sel) == 0
