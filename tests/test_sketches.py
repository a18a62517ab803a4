"""HLL sketch tier (operators/sketches.py): non-twin checks.

The oracle row (`distinct_hll`) proves engine portability; these prove
the SEMANTICS against an independent hashlib-based Python replica of
the published algorithm, plus the merge law and an accuracy bound.
"""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators import sketches


def _py_regs(values, b=2):
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket, tail = h[:b], h[b:b + 7]
        n = int(tail, 16)
        rho = 29 if n == 0 else bin(n)[2:].zfill(28).index("1") + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_est(values, b=2):
    m = 16 ** b
    regs = _py_regs(values, b)
    s = (sum(1 << (29 - r) for r in regs.values())
         + (m - len(regs)) * (1 << 29))
    alpha = 0.7213 / (1 + 1.079 / m)
    return (m, m - len(regs),
            math.floor(alpha * m * m * float(1 << 29) / float(s)))


class TestHLLReplica:
    def test_registers_match_hashlib_replica(self, spark):
        rng = random.Random(31)
        vals = [f"tok{rng.randrange(5000)}" for _ in range(8000)]
        df = spark.createDataFrame([(v,) for v in vals], "w string")
        got = {r.bucket: r.rho
               for r in sketches.hll_registers(df, "w").collect()}
        assert got == _py_regs(vals)

    def test_estimate_matches_replica_and_truth_bound(self, spark):
        rng = random.Random(32)
        vals = [f"tok{rng.randrange(60000)}" for _ in range(40000)]
        truth = len(set(vals))
        df = spark.createDataFrame([(v,) for v in vals], "w string")
        row = sketches.hll_estimate(df, "w").collect()[0]
        assert ((row.n_buckets, row.n_zero_registers, row.est_hll)
                == _py_est(vals))
        # 3 sigma for m=256 is ~19.5% (sigma = 1.04 / 16)
        assert abs(row.est_hll - truth) / truth < 0.2

    def test_grouped_estimates_are_per_group(self, spark):
        rows = [("a", f"x{i}") for i in range(300)] + \
               [("b", f"x{i}") for i in range(40)]
        df = spark.createDataFrame(rows, "g string, w string")
        out = {r.g: r for r in
               sketches.hll_estimate(df, "w", ("g",)).collect()}
        exp_a = _py_est([f"x{i}" for i in range(300)])
        exp_b = _py_est([f"x{i}" for i in range(40)])
        assert (out["a"].n_zero_registers, out["a"].est_hll) == exp_a[1:]
        assert (out["b"].n_zero_registers, out["b"].est_hll) == exp_b[1:]

    def test_merge_equals_union_sketch(self, spark):
        rng = random.Random(33)
        vals = [f"v{rng.randrange(3000)}" for _ in range(5000)]
        half = len(vals) // 2
        da = spark.createDataFrame([(v,) for v in vals[:half]], "w string")
        db = spark.createDataFrame([(v,) for v in vals[half:]], "w string")
        merged = sketches.hll_merge(sketches.hll_registers(da, "w"),
                                    sketches.hll_registers(db, "w"))
        got = {r.bucket: r.rho for r in merged.collect()}
        assert got == _py_regs(vals)

    def test_partition_independence(self, spark):
        vals = [(f"p{i % 997}",) for i in range(4000)]
        df = spark.createDataFrame(vals, "w string")
        a = sketches.hll_estimate(df.repartition(1), "w").collect()[0]
        b = sketches.hll_estimate(df.repartition(32), "w").collect()[0]
        assert a == b

    def test_null_values_ignored_and_bad_b_raises(self, spark):
        df = spark.createDataFrame(
            [("x",), (None,), ("y",)], "w string")
        row = sketches.hll_estimate(df, "w").collect()[0]
        assert row.n_zero_registers == 254  # only x and y hashed
        with pytest.raises(ValueError):
            sketches.hll_registers(df, "w", b_hex=4)

    def test_all_null_group_reports_zero(self, spark):
        # the group universe is df's keys: a group with only NULL
        # values reports (m zeros, est 0) instead of vanishing —
        # matching COUNT(DISTINCT x) GROUP BY g (review-found)
        df = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("b", None)], "g string, w string")
        out = {r.g: r for r in
               sketches.hll_estimate(df, "w", ("g",)).collect()}
        assert set(out) == {"a", "b"}
        assert out["b"].n_zero_registers == 256
        assert out["b"].est_hll == 0
        assert out["a"].est_hll > 0


class TestCountMinSketch:
    def _py_cms(self, values, width, depth):
        import hashlib
        from collections import Counter

        cms = Counter()
        for v in values:
            h = hashlib.md5(str(v).encode()).hexdigest()
            for i in range(depth):
                cms[(i, int(h[8 * i:8 * i + 8], 16) % width)] += 1
        return cms

    def _py_query(self, cms, value, width, depth):
        import hashlib

        h = hashlib.md5(str(value).encode()).hexdigest()
        return min(cms.get((i, int(h[8 * i:8 * i + 8], 16) % width), 0)
                   for i in range(depth))

    def test_counters_and_estimates_match_replica(self, spark):
        import random

        rng = random.Random(41)
        vals = [f"t{rng.randrange(200)}" for _ in range(3000)]
        df = spark.createDataFrame([(v,) for v in vals], "w string")
        cms = sketches.cms_build(df, "w", width=256, depth=3)
        got = {(r.row_idx, r.bucket): r.cnt for r in cms.collect()}
        assert got == dict(self._py_cms(vals, 256, 3))
        probes = spark.createDataFrame(
            [(f"t{i}",) for i in range(0, 400, 7)], "w string")
        est = {r.value: r.est_count
               for r in sketches.cms_query(cms, probes, "w",
                                           width=256, depth=3).collect()}
        pycms = self._py_cms(vals, 256, 3)
        from collections import Counter

        true = Counter(vals)
        for v, e in est.items():
            assert e == self._py_query(pycms, v, 256, 3)
            assert e >= true.get(v, 0)  # the CMS overcount bound

    def test_wide_sketch_is_exact_without_collisions(self, spark):
        vals = [f"x{i}" for i in range(30)] * 4
        df = spark.createDataFrame([(v,) for v in vals], "w string")
        cms = sketches.cms_build(df, "w", width=1 << 16, depth=3)
        probes = spark.createDataFrame(
            [(f"x{i}",) for i in range(30)], "w string")
        est = {r.value: r.est_count
               for r in sketches.cms_query(cms, probes, "w",
                                           width=1 << 16, depth=3).collect()}
        assert est == {f"x{i}": 4 for i in range(30)}

    def test_merge_equals_concatenated_build(self, spark):
        vals = [f"m{i % 50}" for i in range(1000)]
        half = 500
        a = spark.createDataFrame([(v,) for v in vals[:half]], "w string")
        b = spark.createDataFrame([(v,) for v in vals[half:]], "w string")
        merged = sketches.cms_merge(
            sketches.cms_build(a, "w", width=128, depth=2),
            sketches.cms_build(b, "w", width=128, depth=2))
        got = {(r.row_idx, r.bucket): r.cnt for r in merged.collect()}
        assert got == dict(self._py_cms(vals, 128, 2))

    def test_grouped_table_rejected_by_query(self, spark):
        df = spark.createDataFrame([("g", "v")], "g string, w string")
        cms = sketches.cms_build(df, "w", ("g",), width=64, depth=2)
        with pytest.raises(ValueError):
            sketches.cms_query(cms, df, "w", width=64, depth=2)

    def test_bucket_width_mismatch_yields_null_estimate(self, spark):
        # registers written at b_hex=1, read with the default b_hex=2:
        # est_hll must be NULL (loudly wrong), never a plausible number
        df = spark.createDataFrame(
            [("g", f"v{i}") for i in range(50)], "g string, w string")
        regs1 = sketches.hll_registers(df, "w", ("g",), b_hex=1)
        out = sketches.hll_estimate_from_registers(
            regs1, ("g",), b_hex=2).collect()[0]
        assert out.est_hll is None
        # matching width still estimates
        ok = sketches.hll_estimate_from_registers(
            regs1, ("g",), b_hex=1).collect()[0]
        assert ok.est_hll is not None and ok.est_hll > 0

    def test_cms_query_invalid_width_raises(self, spark):
        df = spark.createDataFrame([("v",)], "w string")
        cms = sketches.cms_build(df, "w", width=64, depth=2)
        with pytest.raises(ValueError):
            sketches.cms_query(cms, df, "w", width=0, depth=2)
