"""Engine-native retrieval cache (pipeline/cache.py) — the reference
Redis tier's semantics (redis_cache.py:35-264) over an append-only
parquet log: key formula parity, TTL expiry, tombstones, prefix clears,
bulk put/lookup, and the vacuum fold through the maintenance swap."""

import hashlib
import os

from pyspark.sql import functions as F

from ragstudio_spark.pipeline import cache


def _path(tmp_path):
    return str(tmp_path / "cache")


class TestKeyFormula:
    def test_make_key_reproduces_reference_formula(self):
        """redis_cache.py:81-97 — md5 over f"{args}:{sorted(kwargs)}",
        namespaced. Computed independently here so a formula drift
        breaks the test, not just self-consistency."""
        args = ()
        kwargs = {"query": "what is spark", "top_k": 5}
        expected = hashlib.md5(
            f"{args}:{sorted(kwargs.items())}".encode(),
            usedforsecurity=False).hexdigest()
        assert cache.make_key("search", query="what is spark", top_k=5) \
            == f"rs:search:{expected}"
        # kwarg order never matters (sorted), args do
        assert cache.make_key("search", top_k=5, query="what is spark") \
            == f"rs:search:{expected}"
        assert cache.make_key("search", 1) != cache.make_key("search", 2)

    def test_bulk_key_col_matches_documented_twin_formula(self, spark):
        df = spark.range(3).select(F.col("id").alias("doc_id"))
        got = df.select(
            cache.bulk_key_col("chunk", "doc_id").alias("k")).collect()
        for row, i in zip(got, range(3)):
            expected = hashlib.md5(
                f"chunk\x1fv{i}".encode()).hexdigest()   # 'v' = non-NULL tag
            assert row["k"] == f"rs:chunk:{expected}"

    def test_bulk_key_null_fields_do_not_collide(self, spark):
        """concat_ws skips NULLs, so untagged ('x', NULL) and (NULL,
        'x') would hash identically and resolution would serve one
        entry's value for the other's lookup (review-found) — the
        null-tag encoding keeps every distinct input distinct."""
        df = spark.createDataFrame(
            [("x", None), (None, "x"), ("x", ""), ("", "x"), (None, None)],
            "a string, b string")
        keys = [r["k"] for r in df.select(
            cache.bulk_key_col("p", "a", "b").alias("k")).collect()]
        assert len(set(keys)) == len(keys)


class TestTtlSemantics:
    def test_set_get_roundtrip_and_counters(self, spark, tmp_path):
        c = cache.ParquetCache(spark, _path(tmp_path))
        key = cache.make_key("chunk", text="abc", strategy="recursive")
        assert c.get(key, now=100) is None           # miss on empty store
        c.set(key, [{"text": "chunk one"}], ttl=50, now=100)
        assert c.get(key, now=120) == [{"text": "chunk one"}]
        assert (c.hits, c.misses) == (1, 1)
        stats = c.get_stats(now=120)
        assert stats["total_keys"] == 1 and stats["hit_rate"] == 0.5

    def test_entry_expires_at_ts_plus_ttl(self, spark, tmp_path):
        c = cache.ParquetCache(spark, _path(tmp_path))
        c.set("rs:p:k1", "v", ttl=10, now=100)
        assert c.get("rs:p:k1", now=109) == "v"      # live: 100+10 > 109
        assert c.get("rs:p:k1", now=110) is None     # expired at the bound

    def test_latest_write_wins_and_del_beats_set_on_tie(self, spark,
                                                        tmp_path):
        c = cache.ParquetCache(spark, _path(tmp_path))
        c.set("rs:p:k", "v1", ttl=100, now=10)
        c.set("rs:p:k", "v2", ttl=100, now=20)
        assert c.get("rs:p:k", now=30) == "v2"
        c.delete("rs:p:k", now=20)                   # same ts as the set
        assert c.get("rs:p:k", now=30) is None

    def test_asof_read_ignores_future_events(self, spark, tmp_path):
        """Backfilled/event-time logs can carry future-stamped rows; an
        as-of read must not see them — a future delete must not hide a
        currently-live key, and a future set is invisible before its
        lease starts (review-found)."""
        c = cache.ParquetCache(spark, _path(tmp_path))
        c.set("rs:p:k", "v1", ttl=1000, now=10)
        c.delete("rs:p:k", now=120)                  # future del
        c.set("rs:p:k2", "later", ttl=60, now=1000)  # future set
        assert c.get("rs:p:k", now=90) == "v1"
        assert c.get("rs:p:k2", now=90) is None
        assert c.get("rs:p:k", now=130) is None      # del now visible

    def test_vacuum_of_fully_expired_store_folds_to_empty(self, spark,
                                                          tmp_path):
        """The exact case vacuum exists for: every entry expired (or
        tombstoned) — must fold to an empty, still-readable store, not
        crash on the file-less replacement (review-found)."""
        path = _path(tmp_path)
        c = cache.ParquetCache(spark, path)
        c.set("rs:p:k1", "v", ttl=5, now=10)
        c.delete("rs:p:k2", now=10)
        stats = cache.vacuum(spark, path, now=100)
        assert stats["rows"] == 0
        assert cache.resolve(spark, path, now=100).count() == 0
        c.set("rs:p:k3", "fresh", ttl=50, now=200)   # store still works
        assert c.get("rs:p:k3", now=210) == "fresh"

    def test_vacuum_preserves_future_events(self, spark, tmp_path):
        """A vacuum at now must NOT destroy events stamped after now
        (backfilled tombstones, event-time stream rows): review-found,
        second pass — a vacuum at 90 dropped a ts=120 delete and
        resurrected the key at 130."""
        path = _path(tmp_path)
        c = cache.ParquetCache(spark, path)
        c.set("rs:p:k", "v1", ttl=1000, now=10)
        c.delete("rs:p:k", now=120)                  # future tombstone
        c.set("rs:p:k2", "later", ttl=60, now=150)   # future lease
        cache.vacuum(spark, path, now=90)
        assert c.get("rs:p:k", now=95) == "v1"       # still live pre-120
        assert c.get("rs:p:k", now=130) is None      # del survived vacuum
        assert c.get("rs:p:k2", now=160) == "later"  # future set survived

    def test_malformed_keys_rejected(self, spark, tmp_path):
        """An empty prefix would land in the Hive default partition and
        read back as NULL — permanently unmatched by clear marks
        (review-found); the API rejects such keys up front."""
        import pytest

        c = cache.ParquetCache(spark, _path(tmp_path))
        for bad in ("plainkey", "rs::nohash", "a:b"):
            with pytest.raises(ValueError, match="non-empty prefix"):
                c.set(bad, "v", now=10)
            with pytest.raises(ValueError, match="non-empty prefix"):
                c.get(bad, now=10)
        with pytest.raises(ValueError, match="non-empty"):
            c.clear_prefix("", now=10)

    def test_clear_prefix_kills_then_later_set_revives(self, spark,
                                                       tmp_path):
        c = cache.ParquetCache(spark, _path(tmp_path))
        c.set("rs:chunk:a", "va", ttl=1000, now=10)
        c.set("rs:chunk:b", "vb", ttl=1000, now=10)
        c.set("rs:search:s", "vs", ttl=1000, now=10)
        assert c.clear_prefix("chunk", now=50) == 2  # live keys covered
        assert c.get("rs:chunk:a", now=60) is None
        assert c.get("rs:search:s", now=60) == "vs"  # other prefix intact
        c.set("rs:chunk:a", "va2", ttl=1000, now=70)
        assert c.get("rs:chunk:a", now=80) == "va2"  # revived

    def test_reference_high_level_methods(self, spark, tmp_path):
        """cache_chunks/get_cached_chunks key on text[:100] + params
        (redis_cache.py:215-259): differing past char 100 must HIT the
        same entry — the reference's documented (coarse) behavior."""
        c = cache.ParquetCache(spark, _path(tmp_path))
        long_a = "x" * 100 + "tail one"
        long_b = "x" * 100 + "different tail"
        c.cache_chunks(long_a, "recursive", 512, 64,
                       [{"text": "t"}], now=10)
        assert c.get_cached_chunks(long_b, "recursive", 512, 64,
                                   now=20) == [{"text": "t"}]
        assert c.get_cached_chunks(long_a, "token", 512, 64,
                                   now=20) is None
        c.cache_search_results("q", 5, [{"doc": 1}], now=10)
        assert c.get_cached_search("q", 5, now=20) == [{"doc": 1}]
        # search default TTL is 300 (redis_cache.py:266)
        assert c.get_cached_search("q", 5, now=311) is None


class TestBulkPath:
    def test_put_df_lookup_df_hits_and_misses(self, spark, tmp_path):
        path = _path(tmp_path)
        docs = spark.range(10).select(F.col("id").alias("doc_id"))
        cache.put_df(docs, path, "chunk",
                     cache.bulk_key_col("chunk", "doc_id"),
                     F.concat(F.lit("payload-"), F.col("doc_id")),
                     ttl=100, now=1000)
        queries = spark.range(8, 14).select(F.col("id").alias("doc_id"))
        got = {r["doc_id"]: r["cached_value"] for r in cache.lookup_df(
            queries, path, "chunk",
            cache.bulk_key_col("chunk", "doc_id"), now=1050).collect()}
        assert got[8] == "payload-8" and got[9] == "payload-9"
        assert all(got[i] is None for i in range(10, 14))
        # at now=1100 the lease (1000+100) is over for every key
        got2 = cache.lookup_df(
            queries, path, "chunk",
            cache.bulk_key_col("chunk", "doc_id"), now=1100)
        assert got2.filter(F.col("cached_value").isNotNull()).count() == 0

    def test_vacuum_folds_log_without_changing_reads(self, spark,
                                                     tmp_path):
        path = _path(tmp_path)
        c = cache.ParquetCache(spark, path)
        for i in range(6):
            c.set(f"rs:p:k{i}", f"v{i}", ttl=100, now=10)
        c.set("rs:p:k0", "v0-new", ttl=100, now=20)   # superseded version
        c.delete("rs:p:k1", now=30)                   # tombstone
        c.set("rs:p:k2", "short", ttl=5, now=10)      # expired by now=50
        before = sorted(
            (r["key"], r["value"])
            for r in cache.resolve(spark, path, now=50).collect())
        stats = cache.vacuum(spark, path, now=50)
        after = sorted(
            (r["key"], r["value"])
            for r in cache.resolve(spark, path, now=50).collect())
        assert after == before
        assert stats["rows"] == len(before)
        # the log physically shrank to its live state
        assert spark.read.parquet(path).count() == len(before)
        # TTL clocks kept running: original ts preserved, so k3..k5
        # still expire at 110
        assert cache.resolve(spark, path, now=200).count() == 0

    def test_vacuum_recovers_interrupted_attempt_first(self, spark,
                                                       tmp_path):
        """Crash between the two swap renames leaves only ._old_; the
        next vacuum restores it before rewriting (maintenance contract
        reused via swap_in)."""
        path = _path(tmp_path)
        c = cache.ParquetCache(spark, path)
        c.set("rs:p:k", "v", ttl=100, now=10)
        os.rename(path, path + "._old_deadbeef")
        stats = cache.vacuum(spark, path, now=20)
        assert stats["rows"] == 1
        assert c.get("rs:p:k", now=20) == "v"
