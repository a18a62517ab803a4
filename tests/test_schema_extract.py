"""Mathematical-schema extraction (reference MathematicalSchemaExtractor,
src/workflows/analyzer/schema_extractor.py:84-292)."""

import pytest

from ragstudio_spark.operators import schema_extract

MATH_TEXT = (
    "Soit le cercle de centre A et de rayon 5 et le triangle ABC.\n"
    "La droite (AB) coupe le segment [BC]. triangle ABC encore.\n"
    "L'asymptote de la courbe C est horizontale.\n"
    "Voir Figure 3 et le tableau de variation.\n"
    "\\\\x = y + 2 longer equation\\\\ et \\\\ab\\\\ trop court."
)


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(
        [(1, MATH_TEXT), (2, "plain prose without any math at all")],
        "doc_id int, text string")
    return schema_extract.extract_math_schemas(df).collect()


class TestSchemaExtraction:
    def test_geometric_elements(self, out):
        ids = [r["schema_id"] for r in out if r["doc_id"] == 1]
        assert "circle_A_5" in ids
        assert ids.count("triangle_ABC") == 2  # findall semantics: no dedup
        assert "line_AB" in ids and "segment_BC" in ids

    def test_types_and_confidences(self, out):
        by_id = {r["schema_id"]: r for r in out if r["doc_id"] == 1}
        assert by_id["circle_A_5"]["confidence"] == 0.9
        assert by_id["circle_A_5"]["schema_type"] == "geometric"
        assert by_id["asymptote"]["confidence"] == 0.7
        assert by_id["table"]["description"] == "Tableau de variation"
        assert by_id["figure_3"]["schema_type"] == "figure"
        assert by_id["curve_C"]["confidence"] == 0.8

    def test_latex_equation_indexing_and_length_filter(self, out):
        """The reference enumerates raw matches and filters short ones
        inside the loop — a skipped equation still consumes an index."""
        eqs = [r for r in out if r["doc_id"] == 1 and r["schema_type"] == "algebraic"]
        assert len(eqs) == 1
        assert eqs[0]["schema_id"] == "equation_1"
        assert eqs[0]["description"] == "Équation: \\\\x = y + 2 longer equation\\\\"

    def test_reference_counts(self, out):
        by_id = {r["schema_id"]: r for r in out if r["doc_id"] == 1}
        assert by_id["triangle_ABC"]["n_references"] == 2  # two lines mention it
        assert by_id["circle_A_5"]["n_references"] == 1

    def test_plain_doc_yields_nothing(self, out):
        assert not [r for r in out if r["doc_id"] == 2]

    def test_rollup(self, spark):
        df = spark.createDataFrame(
            [(1, MATH_TEXT), (2, MATH_TEXT), (3, "plain")],
            "doc_id int, text string")
        got = {r["schema_type"]: (r["n_schemas"], r["n_docs"])
               for r in schema_extract.schema_type_counts(df).collect()}
        assert got["geometric"] == (10, 2)  # (1 circle + 2 triangles + 1 line + 1 segment) × 2
        assert got["table"] == (2, 2)
