"""Streaming incremental near-dedup and streaming curation
(streaming/jobs.py): micro-batches banded against the growing committed
corpus via the decontamination join shape; row-local curation stages
lifted onto the file stream with fold-equality vs the batch operators."""

from ragstudio_spark.operators import dedupe
from ragstudio_spark.streaming import jobs as stream_jobs

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun")
OTHER = ("distributed query engines repartition shuffle data across many "
         "executor nodes to balance skewed aggregation workloads evenly")
THIRD = ("carefully curated training corpora require deduplication "
         "fingerprinting and contamination checks before any model sees "
         "a single token of text")


def _df(spark, rows):
    return spark.createDataFrame(rows, stream_jobs.DEDUP_DOC_SCHEMA)


class TestIncrementalNearDedupStream:
    def test_restart_and_batch_equality(self, spark, tmp_path):
        """Two triggers with a restart between them: (1) offsets are not
        re-read after restart, (2) the committed corpus equals the batch
        operator applied fold-wise (accept = no band match against the
        committed prefix), (3) within-batch near-dups both commit (the
        documented semantics)."""
        inp = str(tmp_path / "in")
        corpus = str(tmp_path / "corpus")
        pairs = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")

        seed = [(0, BASE)]
        _df(spark, seed).write.parquet(corpus)

        b1 = [(10, BASE.replace("warm", "cold")),           # near-dup of 0
              (11, OTHER)]                                  # novel
        b2 = [(20, OTHER.replace("evenly", "fairly")),      # near-dup of 11
              (21, THIRD)]                                  # novel
        _df(spark, b1).write.parquet(inp)

        q = stream_jobs.incremental_near_dedup_stream(
            spark, inp, corpus, pairs, ckpt)
        assert q.awaitTermination(120)
        _df(spark, b2).write.mode("append").parquet(inp)
        q = stream_jobs.incremental_near_dedup_stream(
            spark, inp, corpus, pairs, ckpt)
        assert q.awaitTermination(120)

        got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}

        # fold the batch operator by hand over the same arrival order
        c0 = _df(spark, seed)
        flag1 = {r["left_id"] for r in dedupe.cross_corpus_minhash_pairs(
            _df(spark, b1), c0).collect()}
        a1 = [r for r in b1 if r[0] not in flag1]
        c1 = c0.unionByName(_df(spark, a1))
        flag2 = {r["left_id"] for r in dedupe.cross_corpus_minhash_pairs(
            _df(spark, b2), c1).collect()}
        a2 = [r for r in b2 if r[0] not in flag2]
        expected = {0} | {r[0] for r in a1} | {r[0] for r in a2}

        assert got == expected
        assert 10 not in got and 20 not in got      # near-dups rejected
        assert {11, 21} <= got                       # novel docs committed
        # no double-commit: restart did not reprocess batch 1's file
        all_rows = spark.read.parquet(corpus).collect()
        assert len(all_rows) == len(got)

        # audit pairs name the committed near-dup sources
        audit = {(r["left_id"], r["right_id"])
                 for r in spark.read.parquet(pairs).collect()}
        assert (10, 0) in audit and (20, 11) in audit

    def test_crash_retry_does_not_self_flag(self, spark, tmp_path):
        """Simulated crash-after-append retry: the corpus already holds
        the batch's own rows when the batch re-runs. The self-match guard
        (left_id != right_id) must keep each document from flagging
        itself against its own copy — the audit table carries no (x, x)
        rows and truly-novel rows stay accepted (at-least-once: the
        retried append duplicates them; readers dedup on doc_id). The
        scenario DELIBERATELY includes the documented divergence window:
        13 is a within-batch near-dup of 11 (a clean run accepts both —
        see test_within_batch_near_dups_both_commit), but with 11's rows
        already appended pre-crash the retry flags (13, 11) and rejects
        13. That demotion is the stated crash-window semantics
        (incremental_near_dedup_stream docstring), pinned here so a
        future change to it is a conscious one."""
        inp = str(tmp_path / "in")
        corpus = str(tmp_path / "corpus")
        pairs = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")
        # corpus = prior prefix (0) PLUS the batch's own accepted row (11),
        # exactly what a crash between append and checkpoint-commit leaves
        _df(spark, [(0, BASE), (11, OTHER)]).write.parquet(corpus)
        batch = [(11, OTHER),                                # own copy
                 (12, THIRD),                                # novel
                 (13, OTHER.replace("evenly", "fairly"))]    # near-dup of 11
        _df(spark, batch).write.parquet(inp)
        q = stream_jobs.incremental_near_dedup_stream(
            spark, inp, corpus, pairs, ckpt)
        assert q.awaitTermination(120)
        audit = {(r["left_id"], r["right_id"])
                 for r in spark.read.parquet(pairs).collect()}
        assert all(left != right for left, right in audit)
        assert (13, 11) in audit                 # real near-dup still flagged
        got = spark.read.parquet(corpus).collect()
        assert {r["doc_id"] for r in got} == {0, 11, 12}
        assert 13 not in {r["doc_id"] for r in got}
        # at-least-once: 11 was appended twice, membership unchanged
        assert sum(1 for r in got if r["doc_id"] == 11) == 2

    def test_within_batch_near_dups_both_commit(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        corpus = str(tmp_path / "corpus")
        pairs = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")
        _df(spark, [(0, THIRD)]).write.parquet(corpus)
        batch = [(1, BASE), (2, BASE.replace("warm", "cold"))]
        _df(spark, batch).write.parquet(inp)
        q = stream_jobs.incremental_near_dedup_stream(
            spark, inp, corpus, pairs, ckpt)
        assert q.awaitTermination(120)
        got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert got == {0, 1, 2}  # both in-batch near-dups accepted


class TestIvfpqStreamIngest:
    def test_streamed_index_equals_batch_index_and_searches(
            self, spark, tmp_path):
        """Two micro-batches of vectors against frozen model artifacts:
        the on-disk cell-partitioned index must row-equal the batch
        ivfpq_index over the full corpus (assignment/encoding is a pure
        per-vector function of the frozen quantizer), restart must not
        re-ingest, and a search over the streamed index must match one
        over the batch index."""
        import random

        from ragstudio_spark.operators import similarity

        rng = random.Random(7)
        centers = [[8.0, 0, 0, 0], [0, 8.0, 0, 0],
                   [0, 0, 8.0, 0], [0, 0, 0, 8.0]]
        rows = [(i, [c + rng.uniform(-0.4, 0.4) for c in centers[i % 4]])
                for i in range(48)]
        full = spark.createDataFrame(rows, stream_jobs.EMBEDDING_SCHEMA)
        cents = similarity.kmeans_centroids(full, k=4, iters=2)
        books = similarity.pq_train(full, m=2, k=4, iters=1)
        cdir, bdir = str(tmp_path / "cents"), str(tmp_path / "books")
        cents.write.parquet(cdir)
        books.write.parquet(bdir)

        inp = str(tmp_path / "in")
        idx_dir = str(tmp_path / "index")
        ckpt = str(tmp_path / "ckpt")
        b1, b2 = rows[:20], rows[20:]
        spark.createDataFrame(b1, stream_jobs.EMBEDDING_SCHEMA) \
            .write.parquet(inp)
        q = stream_jobs.ivfpq_stream_ingest(
            spark, inp, idx_dir, cdir, bdir, ckpt, m=2)
        assert q.awaitTermination(120)
        spark.createDataFrame(b2, stream_jobs.EMBEDDING_SCHEMA) \
            .write.mode("append").parquet(inp)
        q = stream_jobs.ivfpq_stream_ingest(
            spark, inp, idx_dir, cdir, bdir, ckpt, m=2)
        assert q.awaitTermination(120)

        streamed = spark.read.parquet(idx_dir)
        batch = similarity.ivfpq_index(full, cents, books, m=2)
        key = lambda r: (r["vec_id"], r["cell"], tuple(r["codes"]))  # noqa: E731
        assert sorted(map(key, streamed.collect())) \
            == sorted(map(key, batch.collect()))     # restart: no dups

        queries = full.filter("vec_id < 2")
        s_res = similarity.ivfpq_topk(streamed, cents, books, queries,
                                      k=3, nprobe=2, m=2)
        b_res = similarity.ivfpq_topk(batch, cents, books, queries,
                                      k=3, nprobe=2, m=2)
        assert sorted(map(tuple, s_res.collect())) \
            == sorted(map(tuple, b_res.collect()))


GOOD = ("A first proper sentence right here. Another complete sentence "
        "follows now. A third one arrives. The fourth one lands. And a "
        "fifth closes the page.")
SPAMMY = "exact same spam line repeated verbatim\n" * 10
PIIFUL = ("Please contact me at bob@example.com about the rollout. "
          "A second sentence sits here. Then a third one. Also a fourth "
          "one. Finally a fifth one.")


class TestCurationStream:
    def test_restart_and_fold_equality_vs_batch_stages(self, spark, tmp_path):
        """Two triggers with a restart between them: (1) offsets are not
        re-read after restart, (2) the streamed output row-for-row equals
        curate_stream_batch over the WHOLE corpus (stages are row-local →
        micro-batching is exact), (3) the rep_keep flag agrees with the
        batch repetition_filter membership and redacted_text with the
        batch redaction stage — the batch-equality the curation tier
        promises."""
        from ragstudio_spark.operators import quality_signals
        from ragstudio_spark.operators import redact as redact_op

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        b1 = [(0, GOOD), (1, SPAMMY), (2, PIIFUL)]
        b2 = [(3, GOOD + " Extra tail sentence lives here."), (4, SPAMMY)]
        _df(spark, b1).write.parquet(inp)
        q = stream_jobs.curation_stream(spark, inp, out, ckpt)
        assert q.awaitTermination(120)
        _df(spark, b2).write.mode("append").parquet(inp)
        q = stream_jobs.curation_stream(spark, inp, out, ckpt)
        assert q.awaitTermination(120)

        got = {r["doc_id"]: r.asDict()
               for r in spark.read.parquet(out).collect()}
        assert len(got) == 5                       # restart: no re-reads

        full = _df(spark, b1 + b2)
        expected = {r["doc_id"]: r.asDict()
                    for r in stream_jobs.curate_stream_batch(full).collect()}
        assert got == expected                     # fold equality, all cols

        kept = {r["doc_id"]
                for r in quality_signals.repetition_filter(full).collect()}
        assert {i for i, r in got.items() if r["rep_keep"]} == kept
        red = {r["doc_id"]: r["redacted_text"]
               for r in redact_op.with_redaction(full).collect()}
        assert all(got[i]["redacted_text"] == red[i] for i in got)
        # non-vacuity: the fixtures exercise every stage both ways
        assert got[1]["rep_keep"] is False and got[0]["rep_keep"] is True
        assert got[2]["n_email"] == 1 and "bob@example.com" not in \
            got[2]["redacted_text"]
        assert got[0]["c4_keep"] is True and got[1]["c4_keep"] is False

    def test_contamination_flag_against_static_benchmark(self, spark,
                                                         tmp_path):
        """With a benchmark_dir, the stream stamps the 13-gram
        contamination flag per micro-batch against the STATIC suite —
        and the flag equals the batch decontamination operator's
        verdict (shared code, fixed side data ⇒ fold-exact)."""
        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        bdir = str(tmp_path / "bench")
        _df(spark, [(100, GOOD)]).write.parquet(bdir)
        batch = [(0, GOOD), (2, PIIFUL)]
        _df(spark, batch).write.parquet(inp)
        q = stream_jobs.curation_stream(spark, inp, out, ckpt,
                                        benchmark_dir=bdir)
        assert q.awaitTermination(120)
        got = {r["doc_id"]: r["contaminated"]
               for r in spark.read.parquet(out).collect()}
        assert got == {0: True, 2: False}
        batch_flags = {r["corpus_id"] for r in dedupe.ngram_decontaminate(
            _df(spark, batch), _df(spark, [(100, GOOD)])).collect()}
        assert {i for i, c in got.items() if c} == batch_flags


class TestCacheStreamIngest:
    def test_streamed_store_equals_batch_and_dup_retry_is_invisible(
            self, spark, tmp_path):
        """Two micro-batches into the cache event log: resolution must
        equal a one-shot batch put over the full input; restart must
        not change reads; and a simulated crash-retry (the same batch
        appended AGAIN) must leave resolution untouched — the
        append-only + max(struct) design makes at-least-once exact for
        readers (no reader-side dedup contract)."""
        from ragstudio_spark.pipeline import cache

        rows = [(i, f"text {i}", 10 + i % 7) for i in range(30)]
        inp = str(tmp_path / "in")
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        b1, b2 = rows[:12], rows[12:]
        spark.createDataFrame(b1, stream_jobs.CACHE_INGEST_SCHEMA) \
            .write.parquet(inp)
        q = stream_jobs.cache_stream_ingest(spark, inp, store, ckpt,
                                            ttl=100)
        assert q.awaitTermination(120)
        spark.createDataFrame(b2, stream_jobs.CACHE_INGEST_SCHEMA) \
            .write.mode("append").parquet(inp)
        q = stream_jobs.cache_stream_ingest(spark, inp, store, ckpt,
                                            ttl=100)
        assert q.awaitTermination(120)

        from pyspark.sql import functions as F

        batch_store = str(tmp_path / "batch_store")
        full = spark.createDataFrame(rows, stream_jobs.CACHE_INGEST_SCHEMA)
        cache.put_df(full, batch_store, "chunk",
                     cache.bulk_key_col("chunk", "doc_id"),
                     F.col("text"), ttl=100, now=F.col("ts"))
        resolve_set = lambda p: sorted(  # noqa: E731
            (r["key"], r["value"], r["ts"])
            for r in cache.resolve(spark, p, now=50).collect())
        assert resolve_set(store) == resolve_set(batch_store)
        assert len(resolve_set(store)) == 30

        # crash-retry: re-append batch 2's events verbatim → unchanged
        before = resolve_set(store)
        cache.put_df(
            spark.createDataFrame(b2, stream_jobs.CACHE_INGEST_SCHEMA),
            store, "chunk", cache.bulk_key_col("chunk", "doc_id"),
            F.col("text"), ttl=100, now=F.col("ts"))
        assert resolve_set(store) == before
        # vacuum collapses the physical duplicates without changing reads
        cache.vacuum(spark, store, now=50)
        assert resolve_set(store) == before


class TestHllStreamIngest:
    def test_streamed_registers_equal_batch_and_dup_append_invisible(
            self, spark, tmp_path):
        """Two micro-batches of grouped values into the register log:
        (1) the merged log equals batch-mode hll_registers over the full
        input (max-merge makes arrival order irrelevant), (2) restart
        does not re-read offsets, (3) a simulated crash-retry (one
        batch's partials appended AGAIN) changes nothing a reader sees —
        max is idempotent, the at-least-once story needs no reader-side
        dedup."""
        from ragstudio_spark.operators import sketches

        rows = [(f"s{i % 3}", f"w{i % 40}") for i in range(200)]
        inp = str(tmp_path / "in")
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        b1, b2 = rows[:90], rows[90:]
        spark.createDataFrame(b1, stream_jobs.SKETCH_INGEST_SCHEMA) \
            .write.parquet(inp)
        q = stream_jobs.hll_stream_ingest(spark, inp, store, ckpt)
        assert q.awaitTermination(120)
        spark.createDataFrame(b2, stream_jobs.SKETCH_INGEST_SCHEMA) \
            .write.mode("append").parquet(inp)
        q = stream_jobs.hll_stream_ingest(spark, inp, store, ckpt)
        assert q.awaitTermination(120)

        merged = {(r.source, r.bucket): r.rho
                  for r in stream_jobs.read_hll_registers(
                      spark, store).collect()}
        full = spark.createDataFrame(rows, stream_jobs.SKETCH_INGEST_SCHEMA)
        batch = {(r.source, r.bucket): r.rho
                 for r in sketches.hll_registers(
                     full, "w", ("source",)).collect()}
        assert merged == batch

        # crash retry: re-append batch 1's partials verbatim
        sketches.hll_registers(
            spark.createDataFrame(b1, stream_jobs.SKETCH_INGEST_SCHEMA),
            "w", ("source",)).write.mode("append").parquet(store)
        again = {(r.source, r.bucket): r.rho
                 for r in stream_jobs.read_hll_registers(
                     spark, store).collect()}
        assert again == batch

        # estimates off the streamed log match batch-mode estimates
        est_stream = {r.source: r.est_hll
                      for r in sketches.hll_estimate_from_registers(
                          stream_jobs.read_hll_registers(spark, store),
                          ("source",)).collect()}
        est_batch = {r.source: r.est_hll
                     for r in sketches.hll_estimate(
                         full, "w", ("source",)).collect()}
        assert est_stream == est_batch


class TestCmsStreamIngest:
    def test_streamed_counters_equal_batch_and_dup_append_invisible(
            self, spark, tmp_path):
        """Two micro-batches of values into the batch-tagged counter
        log: the deduped-then-summed read equals batch-mode cms_build
        over the full input; a simulated crash retry (one batch's
        partials re-appended VERBATIM under the same batch_id) changes
        nothing — per-batch dedup absorbs it (sum-merge alone would
        double-count, unlike the HLL max)."""
        from pyspark.sql import functions as F

        from ragstudio_spark.operators import sketches

        rows = [("s", f"w{i % 25}") for i in range(160)]
        inp = str(tmp_path / "in")
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        b1, b2 = rows[:70], rows[70:]
        spark.createDataFrame(b1, stream_jobs.SKETCH_INGEST_SCHEMA) \
            .write.parquet(inp)
        q = stream_jobs.cms_stream_ingest(spark, inp, store, ckpt,
                                          width=128, depth=2)
        assert q.awaitTermination(120)
        spark.createDataFrame(b2, stream_jobs.SKETCH_INGEST_SCHEMA) \
            .write.mode("append").parquet(inp)
        q = stream_jobs.cms_stream_ingest(spark, inp, store, ckpt,
                                          width=128, depth=2)
        assert q.awaitTermination(120)

        merged = {(r.row_idx, r.bucket): r.cnt
                  for r in stream_jobs.read_cms_counters(
                      spark, store).collect()}
        full = spark.createDataFrame(rows, stream_jobs.SKETCH_INGEST_SCHEMA)
        batch = {(r.row_idx, r.bucket): r.cnt
                 for r in sketches.cms_build(
                     full.select("w"), "w",
                     width=128, depth=2).collect()}
        assert merged == batch

        # crash retry: re-append one batch's partials with its batch_id
        one_batch = spark.read.parquet(store).filter("batch_id = 0")
        one_batch.write.mode("append").parquet(store)
        again = {(r.row_idx, r.bucket): r.cnt
                 for r in stream_jobs.read_cms_counters(
                     spark, store).collect()}
        assert again == batch

        # estimates off the streamed log match the batch sketch
        probes = spark.createDataFrame(
            [(f"w{i}",) for i in range(0, 30, 3)], "w string")
        est_stream = {r.value: r.est_count
                      for r in sketches.cms_query(
                          stream_jobs.read_cms_counters(spark, store),
                          probes, "w", width=128, depth=2).collect()}
        est_batch = {r.value: r.est_count
                     for r in sketches.cms_query(
                         sketches.cms_build(full.select("w"), "w",
                                            width=128, depth=2),
                         probes, "w", width=128, depth=2).collect()}
        assert est_stream == est_batch
