"""Learned quality filter (operators/quality_model.py): shipped-model
behavior, trainer label-reproduction, determinism, NULL handling."""

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators import quality_model as qm

PROSE = ("The committee said that it would review the proposal with care "
         "and publish the findings for everyone to read. It is not a "
         "simple question, but the answer is in the documents.")
GARBAGE = "0x9A$@! 77##%% 123456 @@@)(*&^ 999 $$$ ~~|||##"
LONGTOK = "pneumonoultramicroscopicsilicovolcanoconiosis " * 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestShippedModel:
    def test_prose_kept_garbage_dropped(self, spark):
        out = {r["doc_id"]: r for r in qm.with_quality_score(
            _docs(spark, [(0, PROSE), (1, GARBAGE), (2, LONGTOK)])
        ).collect()}
        assert out[0]["qm_keep"] is True
        assert out[1]["qm_keep"] is False
        assert out[2]["qm_keep"] is False
        assert out[0]["qm_score"] > 0 > out[1]["qm_score"]

    def test_null_text_scores_bias_only(self, spark):
        r = qm.with_quality_score(_docs(spark, [(0, None)])).first()
        assert r["qm_score"] == qm.PUBLISHED_WEIGHTS["bias"]
        assert r["qm_keep"] is False

    def test_score_is_one_projection(self, spark):
        from ragstudio_spark.operators import bucketing

        scored = qm.with_quality_score(_docs(spark, [(0, PROSE)]))
        assert bucketing.plan_shuffle_exchanges(scored) == 0
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan


class TestTrainer:
    def _fixture(self, spark):
        rows = ([(i, PROSE + f" extra tail {i}.", True) for i in range(8)]
                + [(100 + i, GARBAGE * (1 + i % 3), False)
                   for i in range(8)])
        return spark.createDataFrame(rows,
                                     "doc_id int, text string, keep boolean")

    def test_reproduces_labels_on_separable_data(self, spark):
        df = self._fixture(spark)
        weights, epochs = qm.train_quality_model(df)
        assert epochs < 20                  # converged, not exhausted
        ev = {r["label"]: r for r in qm.evaluate(df, weights).collect()}
        assert ev[True]["correct"] == ev[True]["n"]
        assert ev[False]["correct"] == ev[False]["n"]

    def test_deterministic_across_partitionings(self, spark):
        df = self._fixture(spark)
        a, _ = qm.train_quality_model(df)
        b, _ = qm.train_quality_model(df.repartition(7))
        assert a == b

    def test_published_weights_as_init_converge_immediately_when_right(
            self, spark):
        """Warm-starting from a separator that already labels the data
        correctly must return it unchanged after zero update epochs."""
        df = self._fixture(spark)
        trained, _ = qm.train_quality_model(df)
        again, epochs = qm.train_quality_model(df, init=trained)
        assert again == trained and epochs == 0

    def test_null_label_rejected(self, spark):
        df = spark.createDataFrame([(0, PROSE, None)],
                                   "doc_id int, text string, keep boolean")
        with pytest.raises(ValueError, match="NULL label"):
            qm.train_quality_model(df)
