"""Randomized differentials for the continuation-2 tier: every operator
vs a from-scratch pure-Python contract replica on seeded random inputs.

Twin equality proves portability, not semantics (CLAUDE.md invariant 6);
the hand-computed units pin small cases; this tier pins the CONTRACT on
inputs nobody hand-picked. Replicas are written from the documented
definitions, not from the Spark code."""

import hashlib
import math
import random

import pytest


def _frac(salt, key):
    h = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:8]
    return int(h, 16) / float(16 ** 8)


class TestSusReplica:
    def _replica(self, rows, n, salt="sws"):
        # rows: (doc_id, w). Hash order, integer wheel, pointer k at
        # floor(k*total/n); hits via ceil-division (the documented math)
        ordered = sorted(rows, key=lambda r: (_frac(salt, r[0]), r[0]))
        total = sum(w for _, w in ordered)
        out = {}
        cum = 0
        for doc, w in ordered:
            cum += w
            hi = (cum * n + total - 1) // total
            lo = ((cum - w) * n + total - 1) // total
            if hi - lo > 0:
                out[doc] = hi - lo
        return out

    @pytest.mark.parametrize("seed", [11, 37, 91])
    def test_matches_replica(self, spark, seed):
        from ragstudio_spark.operators import sampling

        rng = random.Random(seed)
        rows = [(i, rng.randint(1, 50)) for i in range(rng.randint(30, 120))]
        n = rng.randint(1, 25)
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        got = {r.doc_id: r.sws_hits for r in
               sampling.systematic_weighted_sample(df, n, "w").collect()}
        assert got == self._replica(rows, n)
        assert sum(got.values()) == n

    @pytest.mark.parametrize("seed", [5, 23])
    def test_hits_within_proportional_bounds(self, spark, seed):
        """SUS law: a row's hits differ from n·w/total by < 1 each way."""
        from ragstudio_spark.operators import sampling

        rng = random.Random(seed)
        rows = [(i, rng.randint(1, 500)) for i in range(60)]
        total = sum(w for _, w in rows)
        n = 17
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        got = {r.doc_id: r.sws_hits for r in
               sampling.systematic_weighted_sample(df, n, "w").collect()}
        for doc, w in rows:
            exact = n * w / total
            assert got.get(doc, 0) >= math.floor(exact) - 0 or exact < 1
            assert got.get(doc, 0) <= math.ceil(exact)


class TestCurriculumReplica:
    def _replica(self, rows, k, salt="curriculum"):
        # rows: (doc_id, diff) -> {doc_id: (bucket, schedule_pos)}
        ordered = sorted(rows, key=lambda r: (r[1], _frac(salt, r[0]), r[0]))
        n = len(ordered)
        base, rem = divmod(n, k)
        buckets, pos = [], 0
        for b in range(k):
            size = base + (1 if b < rem else 0)
            buckets.append(ordered[pos:pos + size])
            pos += size
        out = {}
        for b, members in enumerate(buckets):
            members = sorted(members, key=lambda r: (_frac(salt, r[0]), r[0]))
            for i, (doc, _) in enumerate(members):
                out[doc] = (b, i * k + b)
        return out

    @pytest.mark.parametrize("seed", [3, 59])
    def test_matches_replica(self, spark, seed):
        from ragstudio_spark.operators import sampling

        rng = random.Random(seed)
        rows = [(i, rng.randint(0, 9)) for i in range(rng.randint(20, 90))]
        k = rng.choice([3, 5, 8])
        df = spark.createDataFrame(rows, "doc_id bigint, diff int")
        got = {r.doc_id: (r.bucket, r.schedule_pos) for r in
               sampling.curriculum_order(df, "diff", n_buckets=k).collect()}
        assert got == self._replica(rows, k)


class TestFunnelReplica:
    def _replica(self, events, steps):
        # events: (user, ts_int, type) -> {user: [step_ts or None]}
        out = {}
        for u in {e[0] for e in events}:
            evs = [(t, ty) for (uu, t, ty) in events if uu == u]
            chain, prev = [], None
            for s in steps:
                cands = [t for (t, ty) in evs if ty == s
                         and (prev is None or t > prev)]
                if not cands:
                    break
                prev = min(cands)
                chain.append(prev)
            out[u] = chain
        return out

    @pytest.mark.parametrize("seed", [7, 41])
    def test_matches_replica(self, spark, seed):
        import datetime as dt

        from ragstudio_spark.operators.sessions import funnel

        rng = random.Random(seed)
        steps = ["view", "click", "purchase"]
        events = [(rng.randint(0, 15), rng.randint(0, 500),
                   rng.choice(steps + ["error"]))
                  for _ in range(rng.randint(50, 200))]
        rows = [(u, dt.datetime(2024, 1, 1)
                 + dt.timedelta(seconds=t), ty) for (u, t, ty) in events]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string")
        got = {r.user_id: [x for x in (r.step1_us, r.step2_us, r.step3_us)
                           if x is not None]
               for r in funnel(df, steps).collect()}
        base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                   .timestamp() * 1e6)
        exp = {u: [base + t * 1_000_000 for t in chain]
               for u, chain in self._replica(events, steps).items()}
        assert got == exp


class TestGroundingReplica:
    def _replica(self, turns, k=2):
        # turns: (conv, idx, role, text)
        def grams(text):
            ws = [w for w in text.lower().split() if w]
            return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
        out = {}
        for conv, idx, role, text in turns:
            if role != "assistant":
                continue
            gs = grams(text)
            user_prior = set()
            for c2, i2, r2, t2 in turns:
                if c2 == conv and r2 == "user" and i2 < idx:
                    user_prior |= grams(t2)
            n, g = len(gs), len(gs & user_prior)
            ppm = (1_000_000 * g) // n if n else None
            # Spark floors a double division; for our sizes it equals //
            out[(conv, idx)] = (n, g, ppm)
        return out

    @pytest.mark.parametrize("seed", [13, 67])
    def test_matches_replica(self, spark, seed):
        from ragstudio_spark.operators.grounding import turn_grounding

        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(18)]
        turns = []
        for c in range(6):
            for i in range(rng.randint(2, 10)):
                role = rng.choice(["user", "assistant", "tool"])
                text = " ".join(rng.choice(vocab)
                                for _ in range(rng.randint(0, 12)))
                turns.append((f"c{c}", i, role, text))
        df = spark.createDataFrame(
            turns, "conv_id string, turn_idx int, role string, text string")
        got = {(r.conv_id, r.turn_idx): (r.n_bigrams, r.n_grounded,
                                         r.grounded_ppm)
               for r in turn_grounding(df).collect()}
        assert got == self._replica(turns)


class TestPhraseReplica:
    def _replica(self, docs, phrase):
        out = {}
        k = len(phrase)
        for doc_id, text in docs:
            ws = [w for w in text.lower().split() if w]
            n = sum(1 for i in range(len(ws) - k + 1)
                    if ws[i:i + k] == phrase)
            if n:
                out[doc_id] = n
        return out

    @pytest.mark.parametrize("seed", [17, 73])
    def test_matches_replica(self, spark, seed):
        from ragstudio_spark.operators.index import phrase_search

        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d"]
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 30))))
                for i in range(40)]
        phrase = ["a", "b", "a"]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {r.doc_id: r.n_occurrences
               for r in phrase_search(df, phrase).collect()}
        assert got == self._replica(docs, phrase)


class TestQuantilesReplica:
    @pytest.mark.parametrize("seed", [29, 83])
    def test_matches_replica(self, spark, seed):
        from ragstudio_spark.operators.metrics import exact_quantiles

        rng = random.Random(seed)
        rows = [(f"g{rng.randint(0, 3)}", rng.randint(0, 1000))
                for _ in range(rng.randint(40, 150))]
        df = spark.createDataFrame(rows, "lang string, n_chars bigint")
        got = {r.lang: (r.n, r.p50, r.p90, r.p99)
               for r in exact_quantiles(df, "n_chars").collect()}
        groups = {}
        for g, v in rows:
            groups.setdefault(g, []).append(v)
        for g, vals in groups.items():
            vals.sort()
            n = len(vals)
            exp = tuple(vals[(n * p + 99) // 100 - 1] for p in (50, 90, 99))
            assert got[g] == (n,) + exp


class TestScd2Replica:
    @pytest.mark.parametrize("seed", [31, 97])
    def test_matches_replica(self, spark, seed):
        import datetime as dt

        from ragstudio_spark.operators.snapshot import scd2_history

        rng = random.Random(seed)
        events = [(rng.randint(0, 5), rng.randint(0, 300), i,
                   rng.choice(["a", "b", None]))
                  for i in range(rng.randint(30, 100))]
        rows = [(u, dt.datetime(2024, 1, 1)
                 + dt.timedelta(seconds=t), v, i)
                for (u, t, i, v) in events]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, value string, "
                  "event_id bigint")
        got = [(r.user_id, r.attr_value, r.valid_from_us, r.valid_to_us)
               for r in scd2_history(df, ["user_id"], "value",
                                     tiebreak_col="event_id").collect()]
        base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                   .timestamp() * 1e6)
        exp = []
        for u in sorted({e[0] for e in events}):
            evs = sorted([(t, i, v) for (uu, t, i, v) in events if uu == u])
            changes = []
            prev = object()
            for t, _i, v in evs:
                if v != prev:
                    changes.append((t, v))
                    prev = v
            for j, (t, v) in enumerate(changes):
                nxt = changes[j + 1][0] if j + 1 < len(changes) else None
                exp.append((u, v, base + t * 1_000_000,
                            None if nxt is None else base + nxt * 1_000_000))
        assert sorted(got, key=lambda x: (x[0], x[2])) == exp


class TestContainmentReplica:
    def _replica(self, docs, k=3):
        def shingles(text):
            ws = [w for w in text.lower().split() if w]
            return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
        sh = {d: shingles(t) for d, t in docs}
        out = {}
        for a, sa in sh.items():
            for b, sb in sh.items():
                if a < b and sa & sb:
                    inter = len(sa & sb)
                    out[(a, b)] = (inter, len(sa), len(sb),
                                   (1_000_000 * inter) // len(sa),
                                   (1_000_000 * inter) // len(sb))
        return out

    @pytest.mark.parametrize("seed", [19, 47])
    def test_matches_replica(self, spark, seed):
        from ragstudio_spark.operators.dedupe import containment_pairs

        rng = random.Random(seed)
        vocab = [f"v{i}" for i in range(12)]
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(3, 25))))
                for i in range(25)]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {(r.doc_a, r.doc_b): (r.inter, r.na, r.nb,
                                    r.contain_a_in_b_ppm,
                                    r.contain_b_in_a_ppm)
               for r in containment_pairs(df, k=3).collect()}
        assert got == self._replica(docs)


class TestStitchReplica:
    def _replica(self, docs, k=3):
        keyed = {}
        for d, t in docs:
            ws = [w for w in t.lower().split() if w]
            if len(ws) >= 2 * k:
                keyed[d] = (" ".join(ws[:k]), " ".join(ws[-k:]))
        return sorted(
            (a, b, keyed[a][1])
            for a in keyed for b in keyed
            if a != b and keyed[a][1] == keyed[b][0])

    @pytest.mark.parametrize("seed", [53, 89])
    def test_matches_replica(self, spark, seed):
        from ragstudio_spark.operators.dedupe import stitch_pairs

        rng = random.Random(seed)
        vocab = ["x", "y", "z"]  # tiny vocab -> boundary collisions occur
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(4, 12))))
                for i in range(30)]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = sorted((r.doc_a, r.doc_b, r.boundary)
                     for r in stitch_pairs(df, k=3).collect())
        assert got == self._replica(docs)
