"""Batch-ingestion guard rail — the reference CLI's security tier
(reference: src/core/cli/utils/security.py:31-693) re-expressed for a
Spark ingest job. ``typer.BadParameter`` becomes ``ValueError``; the
limits, environment variables (``RAGSTUDIO_`` prefix in place of
``ATLAS_``), check order, and raise-vs-warn behavior are preserved:
batch-size raises, total-size only WARNS (its threshold is the
reference's dynamic ``max_file_size_mb × len(files)``), and per-file
failures SKIP the file with a warning instead of failing the batch
(security.py:679-691).

Two tiers, matching how file discovery actually happens at scale:

* **driver-side validators** (``validate_*`` — a Path or a list):
  the direct ports, used by scripts/run_job.py-style discovery where
  the driver globs a directory. Cheap; the file COUNT is bounded by
  max_batch_files before anything heavier runs.
* **distributed guards** (``guard_listing_df``): when the listing
  itself is a DataFrame (object-store inventory at 10^9 objects, the
  100-TB shape), the same rules become column expressions — prefix
  containment, extension allow-list, per-file size cap — annotating
  each row ``allowed``/``reason`` so quarantine is auditable rather
  than silent, failing CLOSED on NULL metadata. Totals (batch count
  raise + the reference's dynamic total-size warn) are one aggregate.

MIME validation: python-magic is container-blocked (the reference
DEFAULTS it off and degrades too, security.py:56); the engine's own
content sniffer (operators/sniff.py) plays the magic-number role —
extension/content disagreement surfaces through the pipeline's
content_type column.
"""

from __future__ import annotations

import os
import posixpath
import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class SecurityConfig:
    """Mirrors reference SecurityConfig (security.py:31-62)."""

    max_file_size_mb: int = 100
    warn_file_size_mb: int = 50
    max_batch_files: int = 10000
    warn_batch_files: int = 1000
    allow_symlinks: bool = False
    allow_absolute_patterns: bool = False
    allow_parent_traversal: bool = False
    require_disk_space_mb: int = 100
    sanitize_metadata: bool = True

    @classmethod
    def load_from_env(cls) -> "SecurityConfig":
        """security.py:64-83 with the RAGSTUDIO_ prefix."""
        def b(name, default):
            return os.getenv(name, default).lower() == "true"

        return cls(
            max_file_size_mb=int(os.getenv("RAGSTUDIO_MAX_FILE_SIZE_MB",
                                           "100")),
            warn_file_size_mb=int(os.getenv("RAGSTUDIO_WARN_FILE_SIZE_MB",
                                            "50")),
            max_batch_files=int(os.getenv("RAGSTUDIO_MAX_BATCH_FILES",
                                          "10000")),
            warn_batch_files=int(os.getenv("RAGSTUDIO_WARN_BATCH_FILES",
                                           "1000")),
            allow_symlinks=b("RAGSTUDIO_ALLOW_SYMLINKS", "false"),
            allow_absolute_patterns=b("RAGSTUDIO_ALLOW_ABSOLUTE_PATTERNS",
                                      "false"),
            allow_parent_traversal=b("RAGSTUDIO_ALLOW_PARENT_TRAVERSAL",
                                     "false"),
            require_disk_space_mb=int(
                os.getenv("RAGSTUDIO_REQUIRE_DISK_SPACE_MB", "100")),
            sanitize_metadata=b("RAGSTUDIO_SANITIZE_METADATA", "true"),
        )


# -- driver-side validators (security.py ports) -----------------------------

def validate_path_safe(base_dir: Path, file_path: Path) -> Path:
    """Block path traversal out of base_dir (security.py:100-151)."""
    try:
        resolved = Path(file_path).resolve()
        base = Path(base_dir).resolve()
    except OSError as e:
        raise ValueError(f"Invalid path: {file_path}") from e
    if not resolved.is_relative_to(base):
        raise ValueError(
            f"Path is outside allowed directory: {file_path} "
            f"(base: {base_dir})")
    return file_path


def validate_no_symlinks(file_path: Path,
                         config: SecurityConfig | None = None,
                         base_dir: Path | None = None) -> Path:
    """security.py:153-185: reject symlinked files unless
    allow_symlinks. Like the reference, only the FILE itself (plus,
    when ``base_dir`` is given, the directories BELOW it) is checked —
    walking every ancestor to / would reject all ingests on hosts
    whose data mount sits behind a symlink (macOS /tmp →
    /private/tmp; review-found). Both sides of the below-base walk are
    lexically normalized first, so an unnormalized base (trailing
    ``..``, ``//``) cannot silently no-op the interior check
    (review-found, second pass)."""
    config = config or SecurityConfig()
    if config.allow_symlinks:
        return file_path
    p = Path(file_path)
    if p.is_symlink():
        raise ValueError(f"Symlinks not allowed: {file_path}")
    if base_dir is not None:
        # a '..' segment in the FILE path makes lexical normalization
        # unsound here: normpath('/data/link/../doc') erases the link
        # component without ever stat'ing it (review-found, third
        # pass) — fail closed UNLESS the operator explicitly enabled
        # parent traversal (the same SecurityConfig knob the pattern
        # check honors; fourth pass), in which case only the direct
        # file check above applies — a traversal-bearing path cannot
        # be walked soundly without resolve()
        abs_p = p if p.is_absolute() else p.absolute()
        if ".." in abs_p.parts:
            if not config.allow_parent_traversal:
                raise ValueError(
                    f"Parent traversal not allowed in path: {file_path}")
            return file_path
        # normpath on the BASE only (trusted input, and required so an
        # unnormalized base cannot no-op the walk); never resolve() —
        # resolving would follow the very symlinks we detect
        base = Path(os.path.normpath(Path(base_dir).absolute()))
        probe = abs_p.parent
        while probe != base and base in probe.parents:
            if probe.is_symlink():
                raise ValueError(f"Symlinks not allowed: {file_path} "
                                 f"(link at {probe})")
            probe = probe.parent
    return file_path


def validate_pattern_safe(pattern: str,
                          config: SecurityConfig | None = None) -> str:
    """security.py:187-243, same checks in the same order: ``..``
    ANYWHERE in the pattern (substring, as the reference), absolute
    paths (POSIX or drive-letter), home-directory ``~``."""
    config = config or SecurityConfig()
    if not config.allow_parent_traversal and ".." in pattern:
        raise ValueError(
            f"Pattern contains parent directory traversal (..): "
            f"{pattern}")
    if not config.allow_absolute_patterns and (
            pattern.startswith("/") or (len(pattern) > 1
                                        and pattern[1] == ":")):
        raise ValueError(f"Absolute paths in patterns are not allowed: "
                         f"{pattern}")
    if "~" in pattern:
        raise ValueError(f"Home directory expansion (~) is not allowed "
                         f"in patterns: {pattern}")
    return pattern


def _stat_size_mb(file_path: Path) -> float:
    """stat wrapped to the guard tier's ValueError contract
    (security.py:298-301 maps OSError to a clean error)."""
    try:
        return Path(file_path).stat().st_size / (1024 * 1024)
    except OSError as e:
        raise ValueError(f"Cannot access file: {file_path} ({e})") from e


def validate_file_size(file_path: Path,
                       config: SecurityConfig | None = None,
                       warn_only: bool = False) -> Path:
    """security.py:245-301: cap single-file size; warn tier surfaced by
    the comprehensive check's warning list."""
    config = config or SecurityConfig()
    size_mb = _stat_size_mb(file_path)
    if size_mb > config.max_file_size_mb and not warn_only:
        raise ValueError(
            f"File too large: {file_path} ({size_mb:.1f} MB > "
            f"{config.max_file_size_mb} MB)")
    return file_path


def validate_batch_size(files: list[Path],
                        config: SecurityConfig | None = None) -> list[Path]:
    """security.py:344-388: cap the number of files per batch (the one
    batch-level check that RAISES)."""
    config = config or SecurityConfig()
    if len(files) > config.max_batch_files:
        raise ValueError(
            f"Batch too large: {len(files)} files > "
            f"{config.max_batch_files}")
    return files


def total_size_warning(files: list[Path],
                       config: SecurityConfig | None = None,
                       sizes_mb: list[float | None] | None = None
                       ) -> str | None:
    """security.py:303-342: the total-size check WARNS, never raises;
    threshold = max_file_size_mb × len(files); non-existent files are
    skipped (the reference's ``if f.exists()`` guard). ``sizes_mb``
    lets a caller that already stat'ed the batch reuse those numbers
    (one source of truth for the threshold AND the message)."""
    config = config or SecurityConfig()
    if sizes_mb is None:
        total_mb = sum(Path(f).stat().st_size
                       for f in files if Path(f).exists()) / (1024 * 1024)
    else:
        total_mb = sum(s for s in sizes_mb if s is not None)
    max_total_mb = config.max_file_size_mb * len(files)
    if total_mb > max_total_mb:
        return (f"Total batch size is {total_mb:.1f}MB "
                f"(max {max_total_mb:.1f}MB). Processing may require "
                f"significant memory.")
    return None


def validate_total_size(files: list[Path],
                        config: SecurityConfig | None = None) -> list[Path]:
    """Reference signature (returns the files; the warning is the side
    channel — use total_size_warning to capture it)."""
    total_size_warning(files, config)
    return files


def validate_disk_space(output_dir: Path,
                        config: SecurityConfig | None = None) -> Path:
    """security.py:390-442: require free space at the output target."""
    config = config or SecurityConfig()
    probe = Path(output_dir)
    while not probe.exists() and probe.parent != probe:
        probe = probe.parent
    free_mb = shutil.disk_usage(probe).free / (1024 * 1024)
    if free_mb < config.require_disk_space_mb:
        raise ValueError(
            f"Insufficient disk space at {output_dir}: {free_mb:.0f} MB "
            f"free < {config.require_disk_space_mb} MB required")
    return output_dir


def validate_batch_comprehensive(
        base_dir: Path, files: list[Path],
        config: SecurityConfig | None = None) -> tuple[list[Path],
                                                       list[str]]:
    """security.py:648-693 in the reference's order: batch-size
    (raises) → total-size (warns) → per-file path/symlink/size, where
    an invalid file is SKIPPED with a warning instead of failing the
    batch (security.py:679-691). Each file is stat'ed ONCE. Returns
    (validated files, warning strings)."""
    config = config or SecurityConfig()
    warnings: list[str] = []
    validate_batch_size(files, config)
    if len(files) > config.warn_batch_files:
        warnings.append(f"large batch: {len(files)} files")
    # the one stat per file, shared by the total-size warn AND the
    # per-file cap (review-found, third pass: the warn helper re-stat'ed
    # everything); inaccessible files carry None and skip below
    sizes: dict[Path, float | None] = {}
    for f in files:
        try:
            sizes[f] = _stat_size_mb(f)
        except ValueError:
            sizes[f] = None
    w = total_size_warning(files, config,
                           sizes_mb=list(sizes.values()))
    if w:
        warnings.append(w)
    validated: list[Path] = []
    for f in files:
        size_mb = sizes[f]
        try:
            validate_path_safe(base_dir, f)
            validate_no_symlinks(f, config, base_dir=base_dir)
            if size_mb is None:
                raise ValueError(f"Cannot access file: {f}")
            if size_mb > config.max_file_size_mb:
                raise ValueError(
                    f"File too large: {f} ({size_mb:.1f} MB > "
                    f"{config.max_file_size_mb} MB)")
        except ValueError as e:
            warnings.append(f"Skipping invalid file: {f} - {e}")
            continue
        if size_mb > config.warn_file_size_mb:
            warnings.append(f"large file: {f} ({size_mb:.1f} MB)")
        validated.append(f)
    return validated, warnings


# -- distributed guards (the 10^9-object listing shape) ---------------------

def _norm_segments(col: Column) -> Column:
    """Path → its meaningful segments: drop empty (``//``) and ``.``
    segments. Idempotent by construction (a single-pass regexp replace
    left ``/./././`` residue — review-found, second pass); ``..``
    segments are kept so the traversal check can see them."""
    return F.filter(F.split(col, "/"),
                    lambda s: (s != "") & (s != "."))


def guard_listing_df(listing: DataFrame, base_dir: str,
                     config: SecurityConfig | None = None,
                     path_col: str = "path",
                     size_col: str = "size_bytes",
                     allowed_extensions: tuple[str, ...] = ()
                     ) -> DataFrame:
    """Annotate a (path, size_bytes) listing with ``allowed`` +
    ``reason`` under the same rules as the driver-side gate — one
    codegen'd projection, no shuffle. Quarantined rows stay visible
    (auditable), mirroring how the pipeline quarantines bad documents
    instead of dropping them; unknown metadata fails CLOSED."""
    config = config or SecurityConfig()
    # normalize BOTH sides identically (an unnormalized base would
    # mismatch every normalized path — review-found, second pass);
    # normpath of an absolute base already drops '' and '.' segments,
    # and a root base must normalize to '/', not '//' (third pass)
    base_norm = posixpath.normpath("/" + base_dir.strip("/"))
    if not base_norm.endswith("/"):
        base_norm += "/"
    segs = _norm_segments(F.col(path_col))
    p = F.concat(F.lit("/"), F.array_join(segs, "/"), F.lit("/"))
    # addressing must MATCH the base's: against an absolute base a
    # relative key resolves to the reader's CWD (third pass), while a
    # bucket-relative base (S3 inventory keys — the module's headline
    # use case) legitimately carries un-prefixed keys and an absolute
    # key there is the anomaly (fourth pass). Both sides normalize to
    # the same '/'-anchored form, so containment itself is shared.
    base_is_abs = base_dir.startswith("/")
    starts_slash = F.col(path_col).startswith("/")
    mismatched = (~starts_slash) if base_is_abs else starts_slash
    mismatch_reason = ("relative_path" if base_is_abs
                       else "absolute_path_for_relative_base")
    outside = ~p.startswith(base_norm)
    traversal = F.array_contains(segs, "..")
    too_big = (F.col(size_col)
               > F.lit(config.max_file_size_mb * 1024 * 1024))
    ext = F.lower(F.element_at(F.split(F.col(path_col), "\\."), -1))
    bad_ext = (~ext.isin(*[e.lstrip(".").lower()
                           for e in allowed_extensions])
               if allowed_extensions else F.lit(False))
    reason = (F.when(F.col(path_col).isNull(), F.lit("null_path"))
              .when(F.col(size_col).isNull(), F.lit("unknown_size"))
              .when(mismatched, F.lit(mismatch_reason))
              .when(traversal, F.lit("parent_traversal"))
              .when(outside, F.lit("outside_base_dir"))
              .when(too_big, F.lit("file_too_large"))
              .when(bad_ext, F.lit("extension_not_allowed"))
              .otherwise(F.lit(None).cast("string")))
    return listing.withColumn("reason", reason).withColumn(
        "allowed", F.col("reason").isNull())


def guard_listing_totals(guarded: DataFrame,
                         config: SecurityConfig | None = None,
                         size_col: str = "size_bytes") -> dict:
    """Batch-level checks over an annotated listing (ONE aggregate),
    with the reference's raise-vs-warn split: the COUNT cap raises
    (validate_batch_size), total size only warns at the dynamic
    ``max_file_size_mb × n_allowed`` threshold (validate_total_size).
    Returns the census dict (with ``total_size_warning``) for
    lineage."""
    config = config or SecurityConfig()
    row = guarded.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("allowed"), 1).otherwise(0)).alias("n_allowed"),
        F.sum(F.when(F.col("allowed"), F.col(size_col)).otherwise(0))
        .cast("bigint").alias("allowed_bytes")).first()
    stats = {"n_total": row["n_total"],
             "n_allowed": row["n_allowed"] or 0,
             "allowed_bytes": row["allowed_bytes"] or 0}
    if stats["n_allowed"] > config.max_batch_files:
        raise ValueError(
            f"Batch too large: {stats['n_allowed']} files > "
            f"{config.max_batch_files}")
    max_total = config.max_file_size_mb * 1024 * 1024 * stats["n_allowed"]
    stats["total_size_warning"] = (
        f"Total batch size {stats['allowed_bytes']} bytes exceeds "
        f"{max_total} — processing may require significant memory."
        if stats["allowed_bytes"] > max_total else None)
    return stats
