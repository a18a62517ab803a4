"""Per-row error-mode plumbing (reference interactive.py STOP/IGNORE/
CONTINUE → fail_fast / skip / quarantine) + kernel totality fuzz.

The kernel is deliberately *total* on str inputs (never raises), so the
row-level fault barrier in operators/fused.py is defense in depth for
executor-side surprises (codec bugs, pathological regex behavior on future
operators). We verify: (a) mode validation, (b) healthy rows carry a null
error, (c) the kernel really is total under adversarial fuzz — the property
that makes the barrier's untriggered path acceptable.
"""

import pytest

from ragstudio_spark.operators import fused


def _input(spark):
    rows = [("c1", 0, "ok text that is long enough to chunk properly. " * 5, "plain"),
            ("c1", 1, "", "empty"),
            ("c1", 2, "<p>" + "short html prose for the extractor to keep. " * 8 + "</p>", "html")]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, content_type string"
    )


class TestErrorModes:
    def test_invalid_mode_rejected(self, spark):
        with pytest.raises(ValueError):
            fused.process_turns(_input(spark), on_error="explode")

    def test_healthy_rows_have_null_error(self, spark):
        for mode in ("quarantine", "skip", "fail_fast"):
            out = fused.process_turns(_input(spark), on_error=mode).toPandas()
            assert out["error"].isna().all()
            assert len(out) == 3


class TestKernelTotality:
    def test_kernel_total_on_adversarial_strings(self):
        import random

        from ragstudio_spark.kernel import chunk as kchunk
        from ragstudio_spark.kernel import html_extract, langid, quality, textops

        rng = random.Random(42)
        alphabet = "ab #\n\t.|=-–—é<>/\"'\\{}[]()!?0123456789ﬁﬂæœ■"
        samples = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 400)))
            for _ in range(300)
        ]
        samples += ["", " ", "\n" * 50, "<" * 100, "#" * 100, "\x00\x01\x02",
                    "a" * 20000, ("<p>" * 500)]
        for s in samples:
            textops.clean_text(s)
            textops.preprocess_before_chunking(s, "pdf")
            html_extract.extract_main_content(s)
            langid.detect_language(s)
            quality.check_text_quality(s)
            chunks, _ = kchunk.chunk_turn(s, "f:0", max_tokens=8, overlap=2)
            for c in chunks:
                assert c["char_end"] - c["char_start"] == c["char_length"]
