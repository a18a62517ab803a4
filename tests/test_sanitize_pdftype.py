"""Metadata sanitization + PDF-type detector tests."""

from pyspark.sql import functions as F

from ragstudio_spark.operators import routing, sanitize


class TestSanitize:
    def test_denied_keys_dropped_values_cleaned(self, spark):
        df = spark.createDataFrame(
            [(1,)], "id int"
        ).withColumn(
            "metadata",
            F.create_map(
                F.lit("api_key"), F.lit("sk-123"),
                F.lit("Password"), F.lit("hunter2"),
                F.lit("engine"), F.lit("pdf\x00\x01cleaner"),
                F.lit("note"), F.lit("x" * 5000),
            ),
        )
        out = sanitize.with_sanitized_metadata(df).collect()[0]["metadata"]
        assert "api_key" not in out
        assert "Password" not in out  # case-insensitive deny
        assert out["engine"] == "pdfcleaner"  # control chars stripped
        assert len(out["note"]) == sanitize.MAX_VALUE_LEN


class TestPdfTypeDetector:
    def _types(self, spark, rows):
        df = spark.createDataFrame(rows, "id int, text string")
        cols = routing.pdf_type_cols(F.col("text"))
        return {
            r["id"]: (r["t"], r["ratio"])
            for r in df.select(
                "id", cols["pdf_doc_type"].alias("t"),
                cols["extractible_ratio"].alias("ratio"),
            ).collect()
        }

    def test_classification_thresholds(self, spark):
        long_block = "paragraph with plenty of extractible text content here. " * 4
        out = self._types(spark, [
            (0, "\n\n".join([long_block] * 5)),          # all long → TEXT_BASED
            (1, "ab\n\ncd\n\nef"),                        # all short → SCANNED
            (2, f"{long_block}\n\nxx\n\n{long_block}\n\nyy"),  # 0.5 → HYBRID
            (3, "   "),                                   # no blocks → EMPTY
        ])
        assert out[0] == ("TEXT_BASED", 1.0)
        assert out[1][0] == "SCANNED"
        assert out[2][0] == "HYBRID" and abs(out[2][1] - 0.5) < 1e-9
        assert out[3][0] == "EMPTY"

    def test_samples_first_five_blocks_only(self, spark):
        long_block = "x" * 150
        # 5 long blocks then 20 short ones: sample = first 5 → TEXT_BASED
        text = "\n\n".join([long_block] * 5 + ["ab"] * 20)
        out = self._types(spark, [(0, text)])
        assert out[0] == ("TEXT_BASED", 1.0)
