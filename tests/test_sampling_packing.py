"""Deterministic sampling, sequence packing, and cross-corpus dedup."""

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators import dedupe, packing, sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", 100 + (i * 37) % 900) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


class TestHashSampling:
    def test_rate_is_approximately_honored(self, spark, docs):
        kept = sampling.hash_sample(docs, 0.25).count()
        assert 0.15 * 400 < kept < 0.35 * 400

    def test_membership_is_deterministic_and_partition_independent(self, spark, docs):
        a = {r["doc_id"] for r in sampling.hash_sample(docs.coalesce(1), 0.3).collect()}
        b = {r["doc_id"] for r in sampling.hash_sample(docs.repartition(16), 0.3).collect()}
        assert a == b

    def test_membership_stable_under_corpus_growth(self, spark, docs):
        """A row's fate never changes when other rows appear — the property
        Bernoulli df.sample cannot give."""
        small = docs.filter("doc_id < 100")
        a = {r["doc_id"] for r in sampling.hash_sample(small, 0.3).collect()}
        full = {r["doc_id"] for r in sampling.hash_sample(docs, 0.3).collect()}
        assert a == {i for i in full if i < 100}

    def test_salt_gives_independent_draw(self, spark, docs):
        a = {r["doc_id"] for r in sampling.hash_sample(docs, 0.3, salt="x").collect()}
        b = {r["doc_id"] for r in sampling.hash_sample(docs, 0.3, salt="y").collect()}
        assert a != b

    def test_nested_rates(self, spark, docs):
        """With the same salt, a lower rate is a strict subset of a higher
        one (the fraction is fixed per row)."""
        lo = {r["doc_id"] for r in sampling.hash_sample(docs, 0.1).collect()}
        hi = {r["doc_id"] for r in sampling.hash_sample(docs, 0.4).collect()}
        assert lo <= hi

    def test_invalid_rate(self, spark, docs):
        with pytest.raises(ValueError):
            sampling.hash_sample(docs, 1.5)


class TestStratifiedAndSplit:
    def test_per_stratum_rates(self, spark, docs):
        out = sampling.stratified_sample(
            docs, "lang", {"lang0": 1.0, "lang1": 0.0}, default_rate=0.5)
        counts = {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts["lang0"] == docs.filter("lang = 'lang0'").count()
        assert "lang1" not in counts
        assert 0 < counts.get("lang2", 0) < docs.filter("lang = 'lang2'").count()

    def test_split_is_disjoint_exhaustive_and_stable(self, spark, docs):
        out = sampling.split(docs, heldout_rate=0.1)
        assert out.count() == 400
        held = {r["doc_id"] for r in out.filter("split = 'heldout'").collect()}
        assert 0 < len(held) < 400
        # stable when the corpus grows
        held_small = {r["doc_id"] for r in sampling.split(
            docs.filter("doc_id < 100"), heldout_rate=0.1)
            .filter("split = 'heldout'").collect()}
        assert held_small == {i for i in held if i < 100}

    def test_hash_top_n_exact_count_and_plan(self, spark, docs):
        out = sampling.hash_top_n(docs, 17)
        assert out.count() == 17
        a = sorted(r["doc_id"] for r in sampling.hash_top_n(docs.coalesce(1), 17).collect())
        b = sorted(r["doc_id"] for r in sampling.hash_top_n(docs.repartition(8), 17).collect())
        assert a == b
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestPacking:
    def test_sequences_respect_budget_semantics(self, spark):
        rows = [("c1", i, 0, 100) for i in range(10)]  # 10 × 100 tokens
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, chunk_index int, token_count int")
        packed = packing.pack_chunks(df, budget=250).collect()
        by_turn = {r["turn_idx"]: r for r in packed}
        # stream slicing: chunk starting at cum 200 belongs to seq 0
        assert [by_turn[i]["seq_index"] for i in range(10)] == \
            [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
        assert by_turn[0]["seq_token_offset"] == 0
        assert by_turn[3]["seq_token_offset"] == 300 - 250
        assert by_turn[2]["seq_token_offset"] == 200  # straddles, starts in seq 0

    def test_partition_independence_and_shard_isolation(self, spark):
        rows = [(f"c{i % 4}", i, 0, 50 + i) for i in range(80)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, chunk_index int, token_count int")
        a = sorted(map(tuple, packing.pack_chunks(df.coalesce(1), 300).collect()))
        b = sorted(map(tuple, packing.pack_chunks(df.repartition(8), 300).collect()))
        assert a == b
        stats = packing.sequence_stats(packing.pack_chunks(df, 300)).collect()
        assert all(r["n_tokens"] > 0 for r in stats)
        # token conservation: stats sum == input sum
        assert sum(r["n_tokens"] for r in stats) == sum(50 + i for i in range(80))

    def test_invalid_budget(self, spark):
        df = spark.createDataFrame(
            [("c", 0, 0, 10)],
            "conv_id string, turn_idx int, chunk_index int, token_count int")
        with pytest.raises(ValueError):
            packing.pack_chunks(df, budget=0)


class TestCrossCorpusDedup:
    def test_planted_cross_dup_found(self, spark):
        shared = ("the quick brown fox jumps over the lazy dog while the "
                  "cat watches from the warm windowsill today")
        left = spark.createDataFrame(
            [(0, shared), (1, "entirely different words about query engines "
                              "and shuffle partitioning strategies")],
            "doc_id int, text string")
        right = spark.createDataFrame(
            [(100, shared.replace("today", "tonight")),
             (101, "unrelated benchmark question about chemistry and "
                   "thermodynamics of ideal gases")],
            "doc_id int, text string")
        got = {(r["left_id"], r["right_id"])
               for r in dedupe.cross_corpus_minhash_pairs(left, right).collect()}
        assert (0, 100) in got
        assert (1, 101) not in got

    def test_exact_new_only_filters_seen(self, spark):
        seen = spark.createDataFrame(
            [(0, "alpha beta"), (1, "gamma delta")], "doc_id int, text string")
        new = spark.createDataFrame(
            [(10, "alpha beta"), (11, "fresh content"), (12, "gamma delta")],
            "doc_id int, text string")
        got = sorted(r["doc_id"] for r in dedupe.exact_new_only(new, seen).collect())
        assert got == [11]


class TestCapPerKey:
    def test_exact_quota_and_determinism(self, spark):
        from ragstudio_spark.operators import sampling

        rows = [(i, f"src{i % 3}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id int, source string")
        kept = sampling.cap_per_key(df, "source", 4,
                                    order_cols=("doc_id",), salt="t")
        got = {r["source"]: [] for r in kept.collect()}
        for r in kept.collect():
            got[r["source"]].append(r["doc_id"])
        assert all(len(v) == 4 for v in got.values())
        # membership = pure hash of (salt, id): same kept set regardless
        # of input order/partitioning
        again = sampling.cap_per_key(df.orderBy(F.desc("doc_id"))
                                     .repartition(7),
                                     "source", 4, order_cols=("doc_id",),
                                     salt="t")
        assert ({(r["source"], r["doc_id"]) for r in again.collect()}
                == {(s, d) for s, v in got.items() for d in v})

    def test_small_keys_pass_through(self, spark):
        from ragstudio_spark.operators import sampling

        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                                   "doc_id int, source string")
        assert sampling.cap_per_key(df, "source", 10).count() == 3

    def test_rejects_nonpositive_n(self, spark):
        import pytest

        from ragstudio_spark.operators import sampling

        df = spark.createDataFrame([(1, "a")], "doc_id int, source string")
        with pytest.raises(ValueError, match="positive"):
            sampling.cap_per_key(df, "source", 0)


class TestNgramDecontaminate:
    def test_verbatim_overlap_flagged_with_exact_counts(self, spark):
        from ragstudio_spark.operators import dedupe

        bench_sent = ("alpha bravo charlie delta echo foxtrot golf hotel "
                      "india juliett kilo lima mike")           # 13 words
        corpus = spark.createDataFrame(
            [(0, "prefix words here " + bench_sent + " and a suffix tail"),
             (1, "totally unrelated content that shares nothing at all "
                 "with any benchmark entry whatsoever in this corpus"),
             (2, "short doc")],
            "doc_id int, text string")
        bench = spark.createDataFrame([(100, bench_sent)],
                                      "doc_id int, text string")
        got = {(r["corpus_id"], r["benchmark_id"]): r["n_shared"]
               for r in dedupe.ngram_decontaminate(corpus, bench).collect()}
        # the benchmark sentence is exactly one 13-gram; doc 0 contains it
        assert got == {(0, 100): 1}

    def test_repeated_gram_counts_once(self, spark):
        from ragstudio_spark.operators import dedupe

        sent = " ".join(f"w{i}" for i in range(13))
        corpus = spark.createDataFrame(
            [(0, sent + " filler " + sent)], "doc_id int, text string")
        bench = spark.createDataFrame([(9, sent)], "doc_id int, text string")
        got = dedupe.ngram_decontaminate(corpus, bench).collect()
        assert len(got) == 1 and got[0]["n_shared"] == 1  # distinct grams


class TestMixturePlan:
    def test_integer_epoch_accounting(self, spark):
        from ragstudio_spark.operators import sampling

        rows = ([(i, "en", 10) for i in range(100)]        # 1000 tokens
                + [(1000 + i, "fr", 10) for i in range(30)]  # 300 tokens
                + [(2000 + i, "zh", 10) for i in range(5)])  # unweighted
        docs = spark.createDataFrame(
            rows, "doc_id int, lang string, token_count int")
        plan = {r["lang"]: r for r in sampling.mixture_plan(
            docs, "lang", {"en": 700000, "fr": 300000},
            token_budget=10_000).collect()}
        en, fr, zh = plan["en"], plan["fr"], plan["zh"]
        assert en["allocated_tokens"] == 7000
        assert en["full_epochs"] == 7 and en["remainder_tokens"] == 0
        assert fr["allocated_tokens"] == 3000
        assert fr["full_epochs"] == 10 and fr["remainder_tokens"] == 0
        assert zh["weight_ppm"] == 0 and zh["allocated_tokens"] == 0
        assert zh["full_epochs"] == 0

    def test_remainder_and_zero_token_domain(self, spark):
        from ragstudio_spark.operators import sampling

        docs = spark.createDataFrame(
            [(0, "en", 7), (1, "en", 6), (2, "empty", None)],
            "doc_id int, lang string, token_count int")
        plan = {r["lang"]: r for r in sampling.mixture_plan(
            docs, "lang", {"en": 600000, "empty": 400000},
            token_budget=100).collect()}
        assert plan["en"]["allocated_tokens"] == 60
        assert plan["en"]["full_epochs"] == 4      # 60 div 13
        assert plan["en"]["remainder_tokens"] == 60 - 4 * 13
        # NULL token counts coalesce to 0; a zero-token domain never
        # divides by zero and carries its allocation as remainder
        assert plan["empty"]["n_tokens"] == 0
        assert plan["empty"]["full_epochs"] == 0
        assert plan["empty"]["remainder_tokens"] == 40

    def test_weighted_domain_missing_from_corpus_surfaces(self, spark):
        """A weighted domain with ZERO corpus rows must appear as a
        zero-supply plan row — budget must never silently vanish
        (review-found)."""
        from ragstudio_spark.operators import sampling

        docs = spark.createDataFrame([(0, "en", 10)],
                                     "doc_id int, lang string, "
                                     "token_count int")
        plan = {r["lang"]: r for r in sampling.mixture_plan(
            docs, "lang", {"en": 500000, "ja": 500000},
            token_budget=1000).collect()}
        assert plan["ja"]["n_docs"] == 0 and plan["ja"]["n_tokens"] == 0
        assert plan["ja"]["allocated_tokens"] == 500
        assert plan["ja"]["remainder_tokens"] == 500
        total_alloc = sum(r["allocated_tokens"] for r in plan.values())
        assert total_alloc == 1000          # nothing vanished

    def test_over_allocated_weights_raise(self, spark):
        import pytest

        from ragstudio_spark.operators import sampling

        docs = spark.createDataFrame([(0, "en", 10)],
                                     "doc_id int, lang string, "
                                     "token_count int")
        with pytest.raises(ValueError, match="1,000,000"):
            sampling.mixture_plan(docs, "lang",
                                  {"en": 700000, "fr": 600000}, 100)

    def test_budget_past_bigint_ppm_ceiling_raises(self, spark):
        """budget·weight_ppm is a bigint product; a 15T-token budget
        (realistic LLM scale) would wrap silently to NEGATIVE
        allocations under ansi=false (review-found) — the entry check
        must raise instead. The largest legal budget still plans."""
        import pytest

        from ragstudio_spark.operators import sampling

        docs = spark.createDataFrame([(0, "en", 10)],
                                     "doc_id int, lang string, "
                                     "token_count int")
        with pytest.raises(ValueError, match="overflow"):
            sampling.mixture_plan(docs, "lang", {"en": 1_000_000},
                                  token_budget=15_000_000_000_000)
        cap = 2**63 // 1_000_000
        plan = {r["lang"]: r for r in sampling.mixture_plan(
            docs, "lang", {"en": 1_000_000}, token_budget=cap).collect()}
        assert plan["en"]["allocated_tokens"] == cap


class TestMixtureSample:
    def test_composition_tracks_targets(self, spark):
        from ragstudio_spark.operators import sampling

        rows = ([(i, "en") for i in range(600)]
                + [(1000 + i, "fr") for i in range(300)]
                + [(2000 + i, "de") for i in range(100)])
        df = spark.createDataFrame(rows, "doc_id int, lang string")
        out = sampling.mixture_sample(df, "lang",
                                      {"en": 0.5, "fr": 0.5},
                                      budget=200, salt="m")
        got = {r["lang"]: 0 for r in out.collect()}
        for r in out.collect():
            got[r["lang"]] += 1
        assert "de" not in got                      # share 0 → dropped
        # expected ~100 each; hash membership gives binomial spread
        assert 70 <= got["en"] <= 130
        assert 70 <= got["fr"] <= 130

    def test_small_key_fully_kept_rate_caps_at_one(self, spark):
        from ragstudio_spark.operators import sampling

        rows = [(i, "en") for i in range(400)] + [(900 + i, "fr")
                                                  for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id int, lang string")
        out = sampling.mixture_sample(df, "lang",
                                      {"en": 0.5, "fr": 0.5}, budget=200)
        fr = [r for r in out.collect() if r["lang"] == "fr"]
        assert len(fr) == 10                        # budget·share > n_fr

    def test_deterministic_across_partitionings(self, spark):
        from ragstudio_spark.operators import sampling

        rows = [(i, "en" if i % 2 else "fr") for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id int, lang string")
        kw = dict(key_col="lang", shares={"en": 0.6, "fr": 0.4},
                  budget=100, salt="d")
        a = {r["doc_id"] for r in sampling.mixture_sample(df, **kw).collect()}
        b = {r["doc_id"] for r in sampling.mixture_sample(
            df.repartition(9), **kw).collect()}
        assert a == b and len(a) > 0

    def test_rejects_bad_args(self, spark):
        import pytest

        from ragstudio_spark.operators import sampling

        df = spark.createDataFrame([(1, "a")], "doc_id int, lang string")
        with pytest.raises(ValueError, match="non-empty"):
            sampling.mixture_sample(df, "lang", {}, budget=10)
        with pytest.raises(ValueError, match="positive"):
            sampling.mixture_sample(df, "lang", {"a": 1.0}, budget=0)


class TestSelectToBudget:
    def _run(self, spark, rows, budget):
        from ragstudio_spark.operators import sampling

        df = spark.createDataFrame(
            rows, "source string, doc_id long, q long, tokens long")
        out = sampling.select_to_budget(df, budget, "q", "tokens")
        return [(r.doc_id, r.cum_tokens)
                for r in out.orderBy("source", "cum_tokens").collect()]

    def test_prefix_cap_stops_at_first_overflow(self, spark):
        # quality order: d1 (q9, 50), d2 (q8, 60), d3 (q7, 10).
        # budget 70: d1 fits (50), d2 would reach 110 -> STOP; d3
        # (which would individually fit at 60) is dropped too —
        # the documented prefix-cap rule, not skip-and-continue.
        rows = [("s", 1, 9, 50), ("s", 2, 8, 60), ("s", 3, 7, 10)]
        assert self._run(spark, rows, 70) == [(1, 50)]

    def test_budget_binds_per_group_independently(self, spark):
        rows = [("a", 1, 9, 50), ("a", 2, 8, 50),
                ("b", 3, 9, 90), ("b", 4, 8, 90)]
        assert self._run(spark, rows, 100) == [(1, 50), (2, 100), (3, 90)]

    def test_quality_ties_break_on_doc_id(self, spark):
        rows = [("s", 5, 7, 40), ("s", 2, 7, 40), ("s", 9, 7, 40)]
        assert self._run(spark, rows, 80) == [(2, 40), (5, 80)]

    def test_partition_independence(self, spark):
        from ragstudio_spark.operators import sampling

        rows = [("s%d" % (i % 7), i, i % 13, 10 + i % 17)
                for i in range(300)]
        df = spark.createDataFrame(
            rows, "source string, doc_id long, q long, tokens long")
        a = sorted(map(tuple, sampling.select_to_budget(
            df.repartition(1), 200, "q", "tokens").collect()))
        b = sorted(map(tuple, sampling.select_to_budget(
            df.repartition(32), 200, "q", "tokens").collect()))
        assert a == b and a

    def test_invalid_budget_raises(self, spark):
        import pytest

        from ragstudio_spark.operators import sampling

        df = spark.createDataFrame(
            [("s", 1, 1, 1)], "source string, doc_id long, q long, tokens long")
        with pytest.raises(ValueError):
            sampling.select_to_budget(df, 0, "q", "tokens")


class TestCurriculumOrder:
    def test_interleave_covers_spectrum_early(self, spark):
        df = spark.createDataFrame(
            [(i, i // 10) for i in range(100)], "doc_id bigint, diff int")
        out = sampling.curriculum_order(df, "diff", n_buckets=10).collect()
        # schedule positions are the dense prefix 0..99
        assert sorted(r.schedule_pos for r in out) == list(range(100))
        # the first 10 scheduled rows hit all 10 buckets once
        first = sorted(out, key=lambda r: r.schedule_pos)[:10]
        assert sorted(r.bucket for r in first) == list(range(10))
        # buckets respect difficulty order: max diff of bucket b <= min of b+1
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r.bucket, []).append(r.diff)
        for b in range(9):
            assert max(by_bucket[b]) <= min(by_bucket[b + 1])

    def test_deterministic_and_partition_invariant(self, spark):
        df = spark.createDataFrame(
            [(i, i % 7) for i in range(50)], "doc_id bigint, diff int")
        a = [(r.doc_id, r.schedule_pos) for r in
             sampling.curriculum_order(df, "diff", n_buckets=5).collect()]
        b = [(r.doc_id, r.schedule_pos) for r in
             sampling.curriculum_order(df.repartition(9), "diff",
                                       n_buckets=5).collect()]
        assert a == b


class TestSystematicWeightedSample:
    def test_hit_count_sums_to_n(self, spark):
        df = spark.createDataFrame(
            [(i, 1 + (i % 5)) for i in range(40)], "doc_id bigint, w int")
        out = sampling.systematic_weighted_sample(df, 12, "w").collect()
        assert sum(r.sws_hits for r in out) == 12
        assert all(r.sws_hits >= 1 for r in out)

    def test_heavy_row_always_selected_with_multiplicity(self, spark):
        # one row carries ~all the weight -> catches nearly every pointer
        rows = [(0, 1000)] + [(i, 1) for i in range(1, 11)]
        df = spark.createDataFrame(rows, "doc_id bigint, w int")
        out = {r.doc_id: r.sws_hits
               for r in sampling.systematic_weighted_sample(df, 10, "w").collect()}
        assert out[0] >= 9  # 1000/1010 of the wheel
        assert sum(out.values()) == 10

    def test_uniform_weights_reduce_to_every_kth(self, spark):
        df = spark.createDataFrame(
            [(i, 1) for i in range(100)], "doc_id bigint, w int")
        out = sampling.systematic_weighted_sample(df, 25, "w").collect()
        assert len(out) == 25 and all(r.sws_hits == 1 for r in out)

    def test_partition_invariance(self, spark):
        df = spark.createDataFrame(
            [(i, 1 + (i * 7) % 13) for i in range(60)], "doc_id bigint, w int")
        a = sorted((r.doc_id, r.sws_hits) for r in
                   sampling.systematic_weighted_sample(df, 9, "w").collect())
        b = sorted((r.doc_id, r.sws_hits) for r in
                   sampling.systematic_weighted_sample(
                       df.repartition(11), 9, "w").collect())
        assert a == b

    def test_growth_monotonicity_is_not_claimed_but_n_is_exact(self, spark):
        # doubling the corpus still yields exactly n total hits
        df = spark.createDataFrame(
            [(i, 1 + i % 3) for i in range(200)], "doc_id bigint, w int")
        out = sampling.systematic_weighted_sample(df, 17, "w").collect()
        assert sum(r.sws_hits for r in out) == 17

    def test_nonpositive_weight_fails_loudly(self, spark):
        from py4j.protocol import Py4JJavaError

        df = spark.createDataFrame(
            [(1, 0), (2, 3)], "doc_id bigint, w int")
        with pytest.raises(Exception) as ei:
            sampling.systematic_weighted_sample(df, 1, "w").collect()
        assert "positive" in str(ei.value)

    def test_invalid_n_raises(self, spark):
        df = spark.createDataFrame([(1, 1)], "doc_id bigint, w int")
        with pytest.raises(ValueError):
            sampling.systematic_weighted_sample(df, 0, "w")


class TestSusOverflowGuard:
    def test_numerator_bound_fails_loudly(self, spark):
        # total > (2^63-1)//(n+1) must trip the in-plan assert even when
        # total*n alone would not overflow (review finding: the ceil
        # numerator reaches total*(n+1)-1)
        w = (2 ** 63 - 1) // 3 + 10  # n=2 -> max_total = (2^63-1)//3
        df = spark.createDataFrame([(1, w)], "doc_id bigint, w bigint")
        with pytest.raises(Exception) as ei:
            sampling.systematic_weighted_sample(df, 2, "w").collect()
        assert "2^63" in str(ei.value)

    def test_guard_boundary_passes(self, spark):
        w = (2 ** 63 - 1) // 3 - 10
        df = spark.createDataFrame([(1, w)], "doc_id bigint, w bigint")
        out = sampling.systematic_weighted_sample(df, 2, "w").collect()
        assert [r.sws_hits for r in out] == [2]
