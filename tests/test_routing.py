"""Routing-analyzer operator tests (§2.6 scoring semantics)."""

from pyspark.sql import functions as F

from ragstudio_spark.operators import routing


def _route(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return routing.with_routing(df, **kw).toPandas().set_index("doc_id")


class TestScientificDetector:
    def test_math_density_and_engine(self, spark):
        mathy = ("∫ x² dx = π ∑ α β γ ∂ ∇ théorème équation matrice "
                 "intégrale dérivée formule")
        plain = "une phrase parfaitement ordinaire sans aucun contenu spécial"
        out = _route(spark, [(0, mathy), (1, plain)])
        assert out.loc[0, "math_score"] > 0.5
        assert bool(out.loc[0, "is_scientific"])
        assert not bool(out.loc[1, "is_scientific"])
        assert out.loc[1, "scientific_engine"] == "classic_ocr"

    def test_structural_indicators_unlock_nougat(self, spark):
        mathy = "∫ x² dx = π ∑ α β γ ∂ ∇ théorème équation matrice intégrale"
        out = _route(
            spark, [(0, mathy)],
            image_text_ratio=F.lit(0.8), ocr_coverage=F.lit(0.5),
            file_size_mb=F.lit(8.0),
        )
        assert out.loc[0, "scientific_score"] > 0.7
        assert out.loc[0, "scientific_engine"] == "nougat"


class TestQualityCategory:
    def test_categories_and_dictionary_override(self, spark):
        good = "des mots normaux avec une phrase valide et claire pour le test complet"
        garbage = "aJANe0 B,) x9TR4qz UONeIOeNEJ zzz qqq JSWXK bcdfgk ppqqrr wxyzkq"
        mixed = garbage + " des mots normaux ici avec une phrase valide et claire"
        out = _route(spark, [(0, good), (1, garbage), (2, mixed)])
        assert out.loc[0, "quality_category"] == "HIGH"
        assert out.loc[1, "quality_category"] == "LOW"  # dictionary override
        assert out.loc[2, "quality_category"] == "MEDIUM"


class TestComplexity:
    def test_ladder_reaches_qwen_vl(self, spark):
        # zero valid words (digit-letter mixes, vowel-less ç tokens) + all
        # short lines + table rules + non-ASCII density → score ≥ 0.7.
        # NB with readable words the text-payload ceiling is ~0.665 (the
        # image-density factor has no text signal), mirroring the reference
        # where qwen_vl routing needs genuinely degraded input.
        text = ("ç9x\nz8ç\nq7ç\n|--|--|\n") * 30
        good = "une phrase parfaitement ordinaire écrite sur une seule longue ligne de texte"
        out = _route(spark, [(0, text), (1, good)])
        assert out.loc[0, "complexity_strategy"] == "qwen_vl"
        assert out.loc[0, "complexity_score"] >= 0.7
        assert out.loc[1, "complexity_strategy"] == "classic_ocr"

    def test_multilingual_score_bounds(self, spark):
        out = _route(spark, [(0, "ascii only text here"), (1, "àâäéèêëïîôöùûüÿç")])
        assert out.loc[0, "multilingual_score"] == 0.0
        assert out.loc[1, "multilingual_score"] == 1.0


class TestAudit:
    def test_routing_decisions_array(self, spark):
        out = _route(spark, [(0, "texte simple et lisible pour vérifier le routage")])
        decisions = out.loc[0, "routing_decisions"]
        steps = [d["step"] for d in decisions]
        assert steps == ["quality_test", "scientific_detect", "complexity"]
        assert all("decision" in d and "score" in d for d in decisions)
