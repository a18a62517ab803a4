"""Batch-ingestion guards (pipeline/guards.py) vs the reference CLI
security tier (security.py:31-693): traversal/symlink/pattern/size/
batch caps driver-side, and the distributed listing guard."""

import os

import pytest

from ragstudio_spark.pipeline import guards


class TestDriverValidators:
    def test_path_traversal_blocked(self, tmp_path):
        inside = tmp_path / "doc.txt"
        inside.write_text("x")
        assert guards.validate_path_safe(tmp_path, inside) == inside
        with pytest.raises(ValueError, match="outside allowed"):
            guards.validate_path_safe(tmp_path / "sub",
                                      tmp_path / "doc.txt")
        with pytest.raises(ValueError, match="outside allowed"):
            guards.validate_path_safe(
                tmp_path, tmp_path / ".." / "etc" / "passwd")

    def test_symlinks_rejected_unless_allowed(self, tmp_path):
        real = tmp_path / "real.txt"
        real.write_text("x")
        link = tmp_path / "link.txt"
        link.symlink_to(real)
        with pytest.raises(ValueError, match="Symlinks"):
            guards.validate_no_symlinks(link)
        cfg = guards.SecurityConfig(allow_symlinks=True)
        assert guards.validate_no_symlinks(link, cfg) == link
        assert guards.validate_no_symlinks(real) == real

    def test_pattern_safety(self):
        """Reference checks in the reference order (security.py:
        187-243): '..' as a SUBSTRING anywhere, absolute paths, and
        the '~' home-expansion rejection (review-found, second pass:
        both had drifted)."""
        assert guards.validate_pattern_safe("docs/**/*.pdf")
        with pytest.raises(ValueError, match="Absolute"):
            guards.validate_pattern_safe("/etc/*.conf")
        with pytest.raises(ValueError, match="traversal"):
            guards.validate_pattern_safe("../secrets/*.txt")
        with pytest.raises(ValueError, match="traversal"):
            guards.validate_pattern_safe("..secrets/*.txt")  # substring
        with pytest.raises(ValueError, match="Home directory"):
            guards.validate_pattern_safe("~/secrets/*.txt")
        # for a pattern that is both absolute AND traversing, the
        # traversal error wins (reference order)
        with pytest.raises(ValueError, match="traversal"):
            guards.validate_pattern_safe("/etc/../x")
        cfg = guards.SecurityConfig(allow_parent_traversal=True,
                                    allow_absolute_patterns=True)
        assert guards.validate_pattern_safe("/abs/*.txt", cfg)
        assert guards.validate_pattern_safe("../up/*.txt", cfg)

    def test_size_and_batch_caps(self, tmp_path):
        small = tmp_path / "small.bin"
        small.write_bytes(b"x" * 1024)
        big = tmp_path / "big.bin"
        big.write_bytes(b"x" * (2 * 1024 * 1024))
        cfg = guards.SecurityConfig(max_file_size_mb=1, max_batch_files=2)
        assert guards.validate_file_size(small, cfg) == small
        with pytest.raises(ValueError, match="too large"):
            guards.validate_file_size(big, cfg)
        with pytest.raises(ValueError, match="Batch too large"):
            guards.validate_batch_size([small] * 3, cfg)
        # total size WARNS, never raises (reference security.py:303-342;
        # review-found, second pass: a hard cap had crept in)
        assert guards.validate_total_size([big, big], cfg) == [big, big]
        assert guards.total_size_warning([big, big], cfg) is not None
        assert guards.total_size_warning([small], cfg) is None

    def test_missing_file_maps_to_clean_error_and_total_skips_it(
            self, tmp_path):
        """OSError wraps to the guard tier's ValueError (reference
        security.py:298-301); total-size skips non-existent files
        (:321) — review-found, second pass."""
        ghost = tmp_path / "ghost.bin"
        with pytest.raises(ValueError, match="Cannot access"):
            guards.validate_file_size(ghost)
        real = tmp_path / "real.bin"
        real.write_bytes(b"x" * 1024)
        assert guards.total_size_warning([ghost, real]) is None

    def test_comprehensive_skips_invalid_files_with_warning(
            self, tmp_path):
        """security.py:679-691: a bad file is SKIPPED with a warning,
        never failing the whole batch (review-found, second pass: the
        port hard-failed). Stat happens once per file."""
        ok = tmp_path / "a.txt"
        ok.write_bytes(b"x" * 600 * 1024)        # 0.6 MB
        big = tmp_path / "big.txt"
        big.write_bytes(b"y" * (2 * 1024 * 1024))
        link = tmp_path / "link.txt"
        link.symlink_to(ok)
        cfg = guards.SecurityConfig(max_file_size_mb=1,
                                    warn_file_size_mb=0,
                                    max_batch_files=10,
                                    warn_batch_files=1)
        files, warnings = guards.validate_batch_comprehensive(
            tmp_path, [ok, big, link], cfg)
        assert files == [ok]
        assert any("large batch" in w for w in warnings)
        assert sum("Skipping invalid file" in w for w in warnings) == 2
        assert any("large file" in w for w in warnings)

    def test_env_loading_with_ragstudio_prefix(self, monkeypatch):
        monkeypatch.setenv("RAGSTUDIO_MAX_FILE_SIZE_MB", "7")
        monkeypatch.setenv("RAGSTUDIO_ALLOW_SYMLINKS", "true")
        cfg = guards.SecurityConfig.load_from_env()
        assert cfg.max_file_size_mb == 7
        assert cfg.allow_symlinks is True
        assert cfg.max_batch_files == 10000       # default preserved

    def test_disk_space_guard(self, tmp_path):
        assert guards.validate_disk_space(
            tmp_path, guards.SecurityConfig(require_disk_space_mb=1))
        with pytest.raises(ValueError, match="disk space"):
            guards.validate_disk_space(
                tmp_path,
                guards.SecurityConfig(require_disk_space_mb=10 ** 9))


class TestDistributedGuard:
    def test_listing_annotation_and_totals(self, spark):
        cfg = guards.SecurityConfig(max_file_size_mb=1,
                                    max_batch_files=100)
        rows = [
            ("/data/in/a.pdf", 1024),
            ("/data/in/sub//b.txt", 2048),            # // normalizes in
            ("/data/in/../../etc/passwd", 10),        # traversal
            ("/data/out/c.pdf", 10),                  # outside base
            ("/data/in/huge.pdf", 5 * 1024 * 1024),   # too big
            ("/data/in/run.exe", 10),                 # bad extension
        ]
        df = spark.createDataFrame(rows, "path string, size_bytes bigint")
        out = {r["path"]: (r["allowed"], r["reason"])
               for r in guards.guard_listing_df(
                   df, "/data/in", cfg,
                   allowed_extensions=("pdf", ".txt")).collect()}
        assert out["/data/in/a.pdf"] == (True, None)
        assert out["/data/in/sub//b.txt"] == (True, None)
        assert out["/data/in/../../etc/passwd"][1] == "parent_traversal"
        assert out["/data/out/c.pdf"][1] == "outside_base_dir"
        assert out["/data/in/huge.pdf"][1] == "file_too_large"
        assert out["/data/in/run.exe"][1] == "extension_not_allowed"

        guarded = guards.guard_listing_df(
            df, "/data/in", cfg, allowed_extensions=("pdf", "txt"))
        stats = guards.guard_listing_totals(guarded, cfg)
        assert stats == {"n_total": 6, "n_allowed": 2,
                         "allowed_bytes": 3072,
                         "total_size_warning": None}

    def test_null_metadata_fails_closed(self, spark):
        """NULL size/path make every rule NULL → untagged they fell
        through to allowed=true AND sum() skipped the unknown bytes
        (review-found): the gate must quarantine what it cannot
        judge."""
        df = spark.createDataFrame(
            [("/in/ok.txt", 10), ("/in/nosize.bin", None), (None, 5)],
            "path string, size_bytes bigint")
        out = {r["path"]: (r["allowed"], r["reason"])
               for r in guards.guard_listing_df(df, "/in").collect()}
        assert out["/in/ok.txt"] == (True, None)
        assert out["/in/nosize.bin"] == (False, "unknown_size")
        assert out[None] == (False, "null_path")
        stats = guards.guard_listing_totals(
            guards.guard_listing_df(df, "/in"))
        assert stats == {"n_total": 3, "n_allowed": 1,
                         "allowed_bytes": 10,
                         "total_size_warning": None}

    def test_symlink_check_scopes_below_base_dir(self, tmp_path):
        """Only the file and directories BELOW base_dir are checked —
        a symlinked mount ABOVE the base (macOS /tmp) must not reject
        every ingest (review-found); a link inside the tree still
        does."""
        base = tmp_path / "realbase"
        (base / "sub").mkdir(parents=True)
        f = base / "sub" / "doc.txt"
        f.write_text("x")
        linked_root = tmp_path / "link_to_base"
        linked_root.symlink_to(base)
        # ancestor-of-base symlink: fine (checked scope starts below base)
        assert guards.validate_no_symlinks(f, base_dir=linked_root / "..")
        # but a symlinked directory INSIDE the base is rejected
        lsub = base / "lsub"
        lsub.symlink_to(base / "sub")
        with pytest.raises(ValueError, match="Symlinks"):
            guards.validate_no_symlinks(lsub / "doc.txt", base_dir=base)

    def test_totals_raise_on_batch_caps(self, spark):
        cfg = guards.SecurityConfig(max_batch_files=2)
        df = spark.createDataFrame(
            [(f"/in/f{i}.txt", 10) for i in range(5)],
            "path string, size_bytes bigint")
        guarded = guards.guard_listing_df(df, "/in", cfg)
        with pytest.raises(ValueError, match="Batch too large"):
            guards.guard_listing_totals(guarded, cfg)

    def test_guard_plan_is_one_projection(self, spark):
        df = spark.createDataFrame([("/in/a.txt", 10)],
                                   "path string, size_bytes bigint")
        plan = guards.guard_listing_df(
            df, "/in")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestThirdPassRegressions:
    def test_relative_listing_paths_quarantined(self, spark):
        """A relative key resolves against the reader's CWD — a
        DIFFERENT file than the base-joined one; prefixing '/' let it
        impersonate an absolute path and pass containment
        (review-found, third pass)."""
        df = spark.createDataFrame(
            [("data/in/rel.pdf", 10), ("/data/in/abs.pdf", 10)],
            "path string, size_bytes bigint")
        out = {r["path"]: (r["allowed"], r["reason"])
               for r in guards.guard_listing_df(df, "/data/in").collect()}
        assert out["data/in/rel.pdf"] == (False, "relative_path")
        assert out["/data/in/abs.pdf"] == (True, None)

    def test_root_base_admits_everything_under_root(self, spark):
        """base '/' normalized to '//' and quarantined every row
        (review-found, third pass)."""
        df = spark.createDataFrame([("/x/a.pdf", 10)],
                                   "path string, size_bytes bigint")
        row = guards.guard_listing_df(df, "/").first()
        assert row["allowed"] is True

    def test_dotdot_through_symlink_cannot_bypass_check(self, tmp_path):
        """normpath('/base/link/../doc') lexically erases the link
        component without stat'ing it (review-found, third pass) —
        '..'-bearing paths fail closed in the symlink check."""
        base = tmp_path / "base"
        (base / "real").mkdir(parents=True)
        link = base / "link"
        link.symlink_to(base / "real")
        doc = base / "doc.txt"
        doc.write_text("x")
        with pytest.raises(ValueError, match="traversal"):
            guards.validate_no_symlinks(
                base / "link" / ".." / "doc.txt", base_dir=base)
        # clean paths still pass
        assert guards.validate_no_symlinks(doc, base_dir=base)

    def test_run_job_gate_reads_only_validated_files(self, spark,
                                                     tmp_path):
        """The gate has teeth: an oversized parquet file is excluded
        from the read, not merely warned about (review-found, third
        pass: the filtered list was discarded). Uses the shared session
        fixture to write the fixture data (fourth pass: a second
        get_spark here silently ignored its master/shuffle args)."""
        import json
        import os
        import subprocess
        import sys as _sys

        from ragstudio_spark.sources import transcripts as tsrc

        inp = str(tmp_path / "in")
        tsrc.transcripts_df(spark, 40, partitions=1).write.parquet(inp)
        # an oversized decoy parquet alongside the real data
        big = os.path.join(inp, "decoy.parquet")
        with open(big, "wb") as f:
            f.write(b"x" * (2 * 1024 * 1024))
        env = dict(os.environ, RAGSTUDIO_MAX_FILE_SIZE_MB="1")
        out = subprocess.run(
            [_sys.executable, "scripts/run_job.py", "--input", inp,
             "--output", str(tmp_path / "out"), "--run-id", "g1"],
            capture_output=True, text=True, env=env, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(
                guards.__file__))) + "/..")
        assert "Skipping invalid file" in out.stderr
        summary = json.loads(out.stdout.strip().splitlines()[-1])
        assert summary["total_turns"] == 40   # decoy never read


class TestFourthPassRegressions:
    def test_relative_base_accepts_bucket_relative_keys(self, spark):
        """The module's headline use case — S3 inventory keys are
        bucket-relative (no leading '/'); against a relative base they
        must pass containment, and an ABSOLUTE key is the anomaly
        (review-found, fourth pass: the relative quarantine killed
        every object-store listing)."""
        df = spark.createDataFrame(
            [("corpus/in/a.txt", 10),
             ("corpus/out/b.txt", 10),
             ("/abs/c.txt", 10)],
            "path string, size_bytes bigint")
        out = {r["path"]: (r["allowed"], r["reason"])
               for r in guards.guard_listing_df(
                   df, "corpus/in").collect()}
        assert out["corpus/in/a.txt"] == (True, None)
        assert out["corpus/out/b.txt"] == (False, "outside_base_dir")
        assert out["/abs/c.txt"] == \
            (False, "absolute_path_for_relative_base")

    def test_allow_parent_traversal_knob_reaches_symlink_check(
            self, tmp_path):
        """With the knob ON, a '..'-bearing path is admitted by the
        symlink check (only the direct-file check applies — the walk
        cannot be done soundly without resolve()); OFF keeps the
        fail-closed third-pass behavior (review-found, fourth
        pass)."""
        base = tmp_path / "base"
        (base / "sub").mkdir(parents=True)
        doc = base / "doc.txt"
        doc.write_text("x")
        p = base / "sub" / ".." / "doc.txt"
        with pytest.raises(ValueError, match="traversal"):
            guards.validate_no_symlinks(p, base_dir=base)
        cfg = guards.SecurityConfig(allow_parent_traversal=True)
        assert guards.validate_no_symlinks(p, cfg, base_dir=base) == p

    def test_total_size_warning_reuses_precomputed_sizes(self, tmp_path):
        f = tmp_path / "a.bin"
        f.write_bytes(b"x" * 1024)
        cfg = guards.SecurityConfig(max_file_size_mb=1)
        # precomputed sizes drive the same threshold and message as
        # the stat path (one source of truth)
        direct = guards.total_size_warning([f, f, f], cfg)
        via_sizes = guards.total_size_warning(
            [f, f, f], cfg, sizes_mb=[2.0, 2.0, None])
        assert direct is None
        assert via_sizes is not None and "4.0MB" in via_sizes
