"""Round-6 property tier: seeded randomized differentials for the new
operators against independent pure-Python replicas — the non-twin
discipline CLAUDE.md invariant 6 mandates (twin equality proves
portability, not semantics; the r5 least(NULL) episode is why).

Each suite generates a random fixture from a fixed seed, computes the
expected result with a from-scratch Python model of the CONTRACT (not
the implementation), and compares the Spark operator's output exactly.
"""

import random

from pyspark.sql import functions as F

from ragstudio_spark.operators import rag_chain
from ragstudio_spark.pipeline import cache


class TestCacheResolutionProperties:
    """resolve() vs a dict-semantics replay of the event log."""

    def _python_resolve(self, events, now):
        """Contract replica: an as-of read sees only events with
        ts ≤ now (future-dated backfills do not exist yet —
        review-found); among those, latest event per key wins (ties:
        del beats set, then larger ttl, then larger value); live iff it
        is a set, ts+ttl > now, and ts postdates the prefix's latest
        visible clear."""
        events = [e for e in events if e["ts"] <= now]
        clears = {}
        for e in events:
            if e["op"] == "clear":
                clears[e["prefix"]] = max(
                    clears.get(e["prefix"], -1), e["ts"])
        best = {}
        for e in events:
            if e["op"] == "clear":
                continue
            rank = (e["ts"], 1 if e["op"] == "del" else 0,
                    e["ttl"], e["value"] or "")
            k = e["key"]
            if k not in best or rank > best[k][0]:
                best[k] = (rank, e)
        live = {}
        for k, (_r, e) in best.items():
            if (e["op"] == "set" and e["ts"] + e["ttl"] > now
                    and e["ts"] > clears.get(e["prefix"], -1)):
                live[k] = e["value"]
        return live

    def test_random_event_logs_resolve_identically(self, spark, tmp_path):
        rng = random.Random(0xC0FFEE)
        for trial in range(3):
            path = str(tmp_path / f"store{trial}")
            events = []
            for _ in range(200):
                op = rng.choices(["set", "del", "clear"],
                                 weights=[8, 2, 1])[0]
                prefix = rng.choice(["a", "b"])
                key = f"rs:{prefix}:k{rng.randrange(20)}"
                ts = rng.randrange(100)
                if op == "set":
                    events.append({"key": key, "prefix": prefix,
                                   "value": f"v{rng.randrange(1000)}",
                                   "ts": ts, "ttl": rng.randrange(1, 60),
                                   "op": "set"})
                elif op == "del":
                    events.append({"key": key, "prefix": prefix,
                                   "value": None, "ts": ts, "ttl": 0,
                                   "op": "del"})
                else:
                    events.append({"key": None, "prefix": prefix,
                                   "value": None, "ts": ts, "ttl": 0,
                                   "op": "clear"})
            spark.createDataFrame(
                [(e["key"], e["prefix"], e["value"], e["ts"], e["ttl"],
                  e["op"]) for e in events],
                "key string, prefix string, value string, ts bigint, "
                "ttl bigint, op string"
            ).repartition(7).write.partitionBy("prefix").parquet(path)
            now = rng.randrange(40, 120)
            got = {r["key"]: r["value"]
                   for r in cache.resolve(spark, path, now).collect()}
            assert got == self._python_resolve(events, now), \
                (trial, now)

    def test_vacuum_preserves_resolution_on_random_logs(self, spark,
                                                        tmp_path):
        rng = random.Random(7)
        path = str(tmp_path / "store")
        c = cache.ParquetCache(spark, path)
        for _ in range(60):
            k = f"rs:p:k{rng.randrange(15)}"
            if rng.random() < 0.8:
                c.set(k, f"v{rng.randrange(100)}",
                      ttl=rng.randrange(1, 50), now=rng.randrange(80))
            else:
                c.delete(k, now=rng.randrange(80))
        now = 60
        before = sorted((r["key"], r["value"]) for r in
                        cache.resolve(spark, path, now).collect())
        cache.vacuum(spark, path, now)
        after = sorted((r["key"], r["value"]) for r in
                       cache.resolve(spark, path, now).collect())
        assert after == before
        # idempotent: a second vacuum changes nothing
        cache.vacuum(spark, path, now)
        again = sorted((r["key"], r["value"]) for r in
                       cache.resolve(spark, path, now).collect())
        assert again == before


class TestContextAssemblyProperties:
    """assemble_context vs a Python replay of the budget contract."""

    def _python_assemble(self, chunks, k, budget):
        ordered = sorted(chunks, key=lambda c: c[0])[: k]
        ordered = [t for _r, t in ordered]
        kept, cum = [], 0
        for i, t in enumerate(ordered):
            toks = len(t) // 4
            cum += toks
            if i == 0 or cum <= budget:
                kept.append(t)
        return ("\n\n".join(kept), len(kept),
                sum(len(t) // 4 for t in kept))

    def test_random_hit_lists_assemble_identically(self, spark):
        rng = random.Random(42)
        rows, expected = [], {}
        for q in range(25):
            n = rng.randrange(1, 9)
            k = 4
            budget = rng.randrange(10, 400)
            chunks = [(r + 1,
                       "".join(rng.choices("abcde fgh\n", k=rng.randrange(0, 300))))
                      for r in range(n)]
            for r, t in chunks:
                rows.append((q, r, t))
            expected[q] = (budget, self._python_assemble(chunks, k, budget))
        # group queries by budget (operator takes one budget per call)
        for budget in {b for b, _ in expected.values()}:
            qids = [q for q, (b, _) in expected.items() if b == budget]
            df = spark.createDataFrame(
                [r for r in rows if r[0] in qids],
                "query_id int, rank int, text string")
            got = {r["query_id"]:
                   (r["context"], r["n_sources"], r["context_tokens"])
                   for r in rag_chain.assemble_context(
                       df, k=4, token_budget=budget).collect()}
            for q in qids:
                assert got[q] == expected[q][1], (q, budget)

    def test_budget_monotonicity(self, spark):
        """A larger budget never keeps FEWER sources (the cumulative
        rule is monotone in the bound)."""
        rng = random.Random(3)
        rows = [(q, r + 1,
                 "".join(rng.choices("xyz w", k=rng.randrange(10, 200))))
                for q in range(10) for r in range(6)]
        df = spark.createDataFrame(rows, "query_id int, rank int, text string")
        prev = None
        for budget in (20, 60, 120, 240, 10_000):
            ns = {r["query_id"]: r["n_sources"]
                  for r in rag_chain.assemble_context(
                      df, k=6, token_budget=budget).collect()}
            if prev is not None:
                assert all(ns[q] >= prev[q] for q in ns)
            prev = ns


class TestGreedyCompressionProperties:
    def _python_greedy(self, cands, q, sim_thr, red_thr):
        import math

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            return dot / (math.sqrt(sum(x * x for x in a))
                          * math.sqrt(sum(y * y for y in b)))

        kept = []
        for rank, doc_id, emb in sorted(cands):
            if not any(cos(k[2], emb) > red_thr for k in kept):
                kept.append((rank, doc_id, emb))
        return [d for r, d, e in kept if cos(e, q) >= sim_thr]

    def test_random_candidate_sets_match_python_greedy(self, spark):
        from ragstudio_spark.operators import rag_extras

        rng = random.Random(11)
        rows, expected = [], {}
        for qid in range(12):
            qvec = [rng.uniform(-1, 1) for _ in range(6)]
            cands = [(r + 1, qid * 100 + r,
                      [rng.uniform(-1, 1) for _ in range(6)])
                     for r in range(rng.randrange(2, 10))]
            for rank, doc_id, emb in cands:
                rows.append((qid, rank, doc_id, emb, qvec))
            expected[qid] = self._python_greedy(cands, qvec, 0.1, 0.6)
        df = spark.createDataFrame(
            rows, "query_id int, rank int, doc_id int, "
            "embedding array<double>, query_embedding array<double>")
        out = rag_extras.compression_retrieve(
            df, sim_threshold=0.1, redundancy_threshold=0.6)
        got = {}
        for r in out.orderBy("query_id", "rank").collect():
            got.setdefault(r["query_id"], []).append(r["doc_id"])
        assert got == {q: docs for q, docs in expected.items() if docs}


class TestMMRRerankProperties:
    """mmr_rerank vs a from-scratch Python MMR (langchain
    maximal_marginal_relevance contract: first pick = argmax query
    cosine; each next = argmax lam*qsim - (1-lam)*max-cos-to-selected,
    ties on original rank asc)."""

    def _python_mmr(self, cands, qvec, lam, k):
        import math

        def dot(a, b):
            s = 0.0
            for x, y in zip(a, b):
                s += x * y
            return s

        def cos(a, b):
            return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

        sel, rem = [], sorted(cands)
        while rem and len(sel) < k:
            best = None
            for c in rem:
                qs = cos(c[2], qvec)
                score = (qs if not sel
                         else lam * qs - (1 - lam)
                         * max(cos(s[2], c[2]) for s in sel))
                if (best is None or score > best[0]
                        or (score == best[0] and c[0] < best[1][0])):
                    best = (score, c)
            sel.append(best[1])
            rem.remove(best[1])
        return [c[1] for c in sel]

    def _run(self, spark, rows, lam, k):
        from ragstudio_spark.operators import rag_extras

        df = spark.createDataFrame(
            rows, "query_id int, rank int, doc_id int, "
            "embedding array<double>, query_embedding array<double>")
        got = {}
        out = rag_extras.mmr_rerank(df, lambda_mult=lam, k=k)
        for r in out.orderBy("query_id", "rank").collect():
            got.setdefault(r["query_id"], []).append(r["doc_id"])
        return got

    def test_random_candidate_sets_match_python_mmr(self, spark):
        rng = random.Random(23)
        for lam, k in ((0.5, 4), (0.3, 6), (1.0, 3), (0.0, 4)):
            rows, expected = [], {}
            for qid in range(10):
                qvec = [rng.uniform(-1, 1) for _ in range(6)]
                cands = [(r + 1, qid * 100 + r,
                          [rng.uniform(-1, 1) for _ in range(6)])
                         for r in range(rng.randrange(2, 12))]
                rows += [(qid, rank, doc_id, emb, qvec)
                         for rank, doc_id, emb in cands]
                expected[qid] = self._python_mmr(cands, qvec, lam, k)
            assert self._run(spark, rows, lam, k) == expected, (lam, k)

    def test_diversification_skips_near_duplicate(self, spark):
        # cand 1 is most query-similar; cand 2 is a near-duplicate of
        # cand 1 (cos ~.9999) with the next-best qsim; cand 3 is less
        # relevant but diverse (cos to cand 1 ~.45). Pure relevance
        # (lam=1) keeps the near-dup second; diversifying (lam=.5) must
        # jump to cand 3 instead. (cand 1 must NOT equal q itself —
        # then qsim == cos-to-selected for every candidate and the
        # two terms cancel identically.)
        q = [1.0, 0.0]
        rows = [(0, 1, 11, [0.9, 0.3], q),
                (0, 2, 12, [0.89, 0.31], q),
                (0, 3, 13, [0.6, -0.6], q)]
        assert self._run(spark, rows, 1.0, 2) == {0: [11, 12]}
        assert self._run(spark, rows, 0.5, 2) == {0: [11, 13]}

    def test_k_exceeding_candidates_returns_all(self, spark):
        q = [1.0, 0.0]
        rows = [(0, 1, 11, [1.0, 0.1], q), (0, 2, 12, [0.2, 0.9], q)]
        got = self._run(spark, rows, 0.5, 10)
        assert sorted(got[0]) == [11, 12]

    def test_invalid_params_raise(self, spark):
        import pytest

        from ragstudio_spark.operators import rag_extras

        df = spark.createDataFrame(
            [(0, 1, 1, [1.0], [1.0])],
            "query_id int, rank int, doc_id int, "
            "embedding array<double>, query_embedding array<double>")
        with pytest.raises(ValueError):
            rag_extras.mmr_rerank(df, k=0)
        with pytest.raises(ValueError):
            rag_extras.mmr_rerank(df, lambda_mult=1.5)
