"""PII redaction semantics (operators/redact.py)."""

from ragstudio_spark.operators import redact


class TestRedaction:
    def test_all_categories(self, spark):
        df = spark.createDataFrame(
            [(1, "mail bob.smith+x@example.co.uk call +33 6 12 34 56 78 "
                 "card 4111111111111111 host 192.168.0.1 end"),
             (2, "clean text with number 42 and version 3.5 only")],
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in redact.with_redaction(df).collect()}
        r1 = out[1]["redacted_text"]
        assert "<EMAIL>" in r1 and "<PHONE>" in r1 and "<CARD>" in r1 and "<IP>" in r1
        assert "example" not in r1 and "4111" not in r1
        assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1
        # clean text untouched: short numbers are not cards/phones of interest
        assert out[2]["redacted_text"] == out[2]["text"]
        assert all(out[2][f"n_{c}"] == 0 for c, _p, _r in redact.REDACTIONS)

    def test_email_digits_not_double_counted_as_phone(self, spark):
        df = spark.createDataFrame(
            [(1, "reach 12345678901@example.com please")],
            "doc_id int, text string")
        row = redact.with_redaction(df).first()
        assert row["n_email"] == 1
        assert row["n_phone"] == 0  # counted on post-email text

    def test_phone_requires_intent_not_digit_density(self, spark):
        """Dates, page ranges, spaced thousands, ISBNs stay untouched;
        +-prefixed international and NANP 3-3-4 shapes still redact."""
        df = spark.createDataFrame(
            [(1, "released 2024-08-16 see pages 10-25 total 1 234 567"),
             (2, "ISBN 978-3-16-148410-0 and version 2.10.3"),
             (3, "call +33 6 12 34 56 78 or (415) 555-0132 or 415-555-0132")],
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in redact.with_redaction(df).collect()}
        assert out[1]["redacted_text"] == out[1]["text"]
        assert out[1]["n_phone"] == 0
        assert out[2]["redacted_text"] == out[2]["text"]
        assert out[2]["n_phone"] == 0
        assert out[3]["n_phone"] == 3
        assert "<PHONE>" in out[3]["redacted_text"]
        assert "415" not in out[3]["redacted_text"]

    def test_report_rollup(self, spark):
        df = spark.createDataFrame(
            [(1, "a@b.io and c@d.io"), (2, "a@b.io"), (3, "none")],
            "doc_id int, text string")
        got = {r["category"]: (r["n_matches"], r["n_docs"])
               for r in redact.redaction_report(df).collect()}
        assert got["email"] == (3, 2)
        assert got["card"] == (0, 0)
