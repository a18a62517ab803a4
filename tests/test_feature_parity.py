"""Structural-feature parity vs the reference's feature-engineering tier
(reference: src/workflows/ml/feature_engineering.py:51-109
extract_structural_features, :112-140 normalize_features, :10-48
combine_features). Ground truth is an independent transcription of the
reference listing — the non-twin check CLAUDE.md invariant 6 requires.
The embedding half of combine_features stays container-blocked
(SURVEY §7.2); the concat semantics are tested with the deterministic
fake embedder."""

import numpy as np
from pyspark.sql import functions as F

from ragstudio_spark.kernel import profile as kprofile
from ragstudio_spark.operators import ml_strategy, profiler


def _reference_structural_features(profile: dict) -> np.ndarray:
    """Transcription of extract_structural_features
    (feature_engineering.py:51-109)."""
    features = []
    features.extend([
        profile.get("length_tokens", 0),
        profile.get("length_chars", 0),
        profile.get("hierarchy_depth", 1),
        profile.get("structure_score", 0.0),
        profile.get("avg_sentence_length", 0.0),
    ])
    features.extend([
        int(profile.get("has_headings", False)),
        int(profile.get("has_tables", False)),
        int(profile.get("has_lists", False)),
    ])
    lang = profile.get("lang", "unknown").lower()
    lang_features = [0.0] * 4
    if lang == "fr":
        lang_features[0] = 1.0
    elif lang == "en":
        lang_features[1] = 1.0
    elif lang == "es":
        lang_features[2] = 1.0
    else:
        lang_features[3] = 1.0
    features.extend(lang_features)
    doc_type = profile.get("type", "unknown").lower()
    type_features = [0.0] * 5
    if doc_type == "fiche_technique":
        type_features[0] = 1.0
    elif doc_type == "rapport":
        type_features[1] = 1.0
    elif doc_type == "article":
        type_features[2] = 1.0
    elif doc_type == "document_court":
        type_features[3] = 1.0
    else:
        type_features[4] = 1.0
    features.extend(type_features)
    return np.array(features, dtype=np.float32)


_PROFILES = [
    {"type": "rapport", "lang": "fr", "length_tokens": 1200,
     "length_chars": 4800, "has_headings": True, "has_tables": False,
     "has_lists": True, "hierarchy_depth": 3,
     "avg_sentence_length": 84.5, "structure_score": 0.8},
    {"type": "fiche_technique", "lang": "en", "length_tokens": 300,
     "length_chars": 1200, "has_headings": False, "has_tables": True,
     "has_lists": False, "hierarchy_depth": 1,
     "avg_sentence_length": 40.0, "structure_score": 0.0},
    {"type": "article", "lang": "es", "length_tokens": 2500,
     "length_chars": 10000, "has_headings": True, "has_tables": True,
     "has_lists": True, "hierarchy_depth": 2,
     "avg_sentence_length": 61.25, "structure_score": 1.0},
    {"type": "document_court", "lang": "de", "length_tokens": 50,
     "length_chars": 200, "has_headings": False, "has_tables": False,
     "has_lists": False, "hierarchy_depth": 1,
     "avg_sentence_length": 0.0, "structure_score": 0.0},
    # out-of-vocab type and missing lang → both 'other' slots
    {"type": "unknown", "lang": None, "length_tokens": 700,
     "length_chars": 2800, "has_headings": True, "has_tables": False,
     "has_lists": False, "hierarchy_depth": 4,
     "avg_sentence_length": 33.0, "structure_score": 0.5},
]


def _profile_df(spark):
    rows = [(i, p["type"], p["lang"], p["length_tokens"],
             p["length_chars"], p["has_headings"], p["has_tables"],
             p["has_lists"], p["hierarchy_depth"],
             p["avg_sentence_length"], p["structure_score"])
            for i, p in enumerate(_PROFILES)]
    return spark.createDataFrame(
        rows,
        "id int, profile_type string, language string, "
        "profile_length_tokens int, profile_length_chars int, "
        "profile_has_headings boolean, profile_has_tables boolean, "
        "profile_has_lists boolean, profile_hierarchy_depth int, "
        "profile_avg_sentence_length double, "
        "profile_structure_score double")


class TestStructuralVector:
    def test_vector_matches_reference_transcription(self, spark):
        got = {r["id"]: r["f"] for r in _profile_df(spark).select(
            "id", ml_strategy.structural_features().alias("f")).collect()}
        for i, p in enumerate(_PROFILES):
            expected = _reference_structural_features(
                {**p, "lang": p["lang"] or "unknown"})
            assert len(got[i]) == ml_strategy.STRUCTURAL_DIM == 17
            assert [np.float32(x) for x in got[i]] \
                == list(expected), (i, got[i], expected)

    def test_composes_with_with_profile(self, spark):
        """End-to-end over real text: with_profile → structural vector
        equals the transcription over the Python kernel's
        analyze_text profile (the two profile paths are parity-pinned
        in test_operator_kernel_parity)."""
        text = ("# Chapitre 1\n\nIntroduction générale du rapport. "
                "Table des matières incluse.\n\n## Section\n\n"
                "- point un\n- point deux\n\n" + "Une phrase. " * 40)
        df = spark.createDataFrame([(text, "fr")],
                                   "extracted_text string, language string")
        got = (profiler.with_profile(df)
               .select(ml_strategy.structural_features().alias("f"))
               .first()["f"])
        kp = kprofile.analyze_text(text, language="fr")
        expected = _reference_structural_features(kp)
        assert [np.float32(x) for x in got] == list(expected)

    def test_exactly_one_hot_per_block(self, spark):
        rows = _profile_df(spark).select(
            ml_strategy.structural_features().alias("f")).collect()
        for r in rows:
            lang_block = r["f"][8:12]
            type_block = r["f"][12:17]
            assert sum(lang_block) == 1.0 and set(lang_block) <= {0.0, 1.0}
            assert sum(type_block) == 1.0 and set(type_block) <= {0.0, 1.0}


class TestNormalization:
    def test_standardizer_matches_sklearn_semantics(self, spark):
        """StandardScaler.fit_transform replica (normalize_features,
        feature_engineering.py:112-140): population mean/std per
        dimension, zero-variance dims scale by 1."""
        df = _profile_df(spark).select(
            ml_strategy.structural_features().alias("f"))
        means, scales = ml_strategy.fit_standardizer(df, "f")
        got = np.array([r["z"] for r in df.select(
            ml_strategy.standardize(F.col("f"), means, scales)
            .alias("z")).collect()])
        x = np.array([_reference_structural_features(
            {**p, "lang": p["lang"] or "unknown"}) for p in _PROFILES],
            dtype=np.float64)
        mu = x.mean(axis=0)
        std = x.std(axis=0)          # ddof=0, sklearn's default
        std[std == 0.0] = 1.0        # _handle_zeros_in_scale
        expected = (x - mu) / std
        # fit_standardizer's one-pass variance (sumsq/n - mean²) and
        # numpy's two-pass formulation agree to ~1e-8 relative on these
        # magnitudes — the tolerance reflects formulation, not a bug
        assert np.allclose(got, expected, rtol=1e-6, atol=1e-9)

    def test_zero_variance_dimension_scales_by_one(self, spark):
        """sklearn's _handle_zeros_in_scale: a constant feature is
        centered but NOT divided by its zero std — output exactly 0."""
        df = spark.createDataFrame(
            [([7.0, 1.0],), ([7.0, 3.0],)], "f array<double>")
        means, scales = ml_strategy.fit_standardizer(df, "f")
        assert means[0] == 7.0 and scales[0] == 1.0
        got = [r["z"] for r in df.select(
            ml_strategy.standardize(F.col("f"), means, scales)
            .alias("z")).collect()]
        assert all(row[0] == 0.0 for row in got)
        assert sorted(row[1] for row in got) == [-1.0, 1.0]

    def test_combine_features_concatenates(self, spark):
        from ragstudio_spark.operators import vectorstore

        df = spark.createDataFrame([("hello world", "en")],
                                   "extracted_text string, language string")
        emb = vectorstore.fake_embedding_col(F.col("extracted_text"))
        row = (profiler.with_profile(df)
               .select(ml_strategy.combine_features(
                   emb, ml_strategy.structural_features()).alias("c"),
                   F.size(emb).alias("edim"))
               .first())
        assert len(row["c"]) == row["edim"] + 17