"""Batch-ingestion guard rail — the reference CLI's security tier
(reference: src/core/cli/utils/security.py:31-693) re-expressed for a
Spark ingest job. ``typer.BadParameter`` becomes ``ValueError``; the
limits, environment variables (``RAGSTUDIO_`` prefix in place of
``ATLAS_``) and check order are preserved.

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
  than silent. Totals (batch size/total bytes) are one aggregate.

MIME validation: python-magic is container-blocked (the reference
DEFAULTS it off and degrades too, security.py:56); the engine's own
content sniffer (operators/sniff.py) plays the magic-number role —
``mime_matches_extension`` flags extension/content disagreement.
"""

from __future__ import annotations

import os
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
    max_total_size_mb: int = 10000
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
            max_total_size_mb=int(
                os.getenv("RAGSTUDIO_MAX_TOTAL_SIZE_MB", "10000")),
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
    /private/tmp; review-found)."""
    config = config or SecurityConfig()
    if config.allow_symlinks:
        return file_path
    p = Path(file_path)
    if p.is_symlink():
        raise ValueError(f"Symlinks not allowed: {file_path}")
    if base_dir is not None:
        base = Path(base_dir).absolute()
        probe = (p if p.is_absolute() else p.absolute()).parent
        while probe != base and base in probe.parents:
            if probe.is_symlink():
                raise ValueError(f"Symlinks not allowed: {file_path} "
                                 f"(link at {probe})")
            probe = probe.parent
    return file_path


def validate_pattern_safe(pattern: str,
                          config: SecurityConfig | None = None) -> str:
    """security.py:187-243: glob patterns may not be absolute or climb
    out with ``..`` unless explicitly allowed."""
    config = config or SecurityConfig()
    if not config.allow_absolute_patterns and (
            pattern.startswith("/") or (len(pattern) > 1
                                        and pattern[1] == ":")):
        raise ValueError(f"Absolute patterns not allowed: {pattern}")
    if not config.allow_parent_traversal and ".." in pattern.split("/"):
        raise ValueError(f"Parent traversal not allowed: {pattern}")
    return pattern


def validate_file_size(file_path: Path,
                       config: SecurityConfig | None = None,
                       warn_only: bool = False) -> Path:
    """security.py:245-301: cap single-file size; warn tier logged by
    the caller (returned via the warning list in the comprehensive
    check)."""
    config = config or SecurityConfig()
    size_mb = Path(file_path).stat().st_size / (1024 * 1024)
    if size_mb > config.max_file_size_mb and not warn_only:
        raise ValueError(
            f"File too large: {file_path} ({size_mb:.1f} MB > "
            f"{config.max_file_size_mb} MB)")
    return file_path


def validate_batch_size(files: list[Path],
                        config: SecurityConfig | None = None) -> list[Path]:
    """security.py:344-388: cap the number of files per batch."""
    config = config or SecurityConfig()
    if len(files) > config.max_batch_files:
        raise ValueError(
            f"Batch too large: {len(files)} files > "
            f"{config.max_batch_files}")
    return files


def validate_total_size(files: list[Path],
                        config: SecurityConfig | None = None) -> list[Path]:
    """security.py:303-342: cap the batch's total bytes."""
    config = config or SecurityConfig()
    total_mb = sum(Path(f).stat().st_size for f in files) / (1024 * 1024)
    if total_mb > config.max_total_size_mb:
        raise ValueError(
            f"Batch total size {total_mb:.1f} MB > "
            f"{config.max_total_size_mb} MB")
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
    """security.py:648-693: the full discovery gate in the reference's
    order — count cap, then per-file path/symlink/size, then total
    size. Returns (validated files, warning strings for the warn
    tiers)."""
    config = config or SecurityConfig()
    warnings: list[str] = []
    validate_batch_size(files, config)
    if len(files) > config.warn_batch_files:
        warnings.append(f"large batch: {len(files)} files")
    for f in files:
        validate_path_safe(base_dir, f)
        validate_no_symlinks(f, config, base_dir=base_dir)
        validate_file_size(f, config)
        size_mb = Path(f).stat().st_size / (1024 * 1024)
        if size_mb > config.warn_file_size_mb:
            warnings.append(f"large file: {f} ({size_mb:.1f} MB)")
    validate_total_size(files, config)
    return files, warnings


# -- distributed guards (the 10^9-object listing shape) ---------------------

def _norm_path(col: Column) -> Column:
    """Collapse ``//`` and resolve ``.`` segments textually; any ``..``
    segment marks the path unsafe (an object-store key has no real
    filesystem resolution — textual containment is the contract)."""
    return F.regexp_replace(F.regexp_replace(col, "/{2,}", "/"),
                            "/\\./", "/")


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
    instead of dropping them."""
    config = config or SecurityConfig()
    base = base_dir.rstrip("/") + "/"
    p = _norm_path(F.col(path_col))
    outside = ~p.startswith(base)
    traversal = p.contains("/../") | p.endswith("/..")
    too_big = (F.col(size_col)
               > F.lit(config.max_file_size_mb * 1024 * 1024))
    ext = F.lower(F.element_at(F.split(F.col(path_col), "\\."), -1))
    bad_ext = (~ext.isin(*[e.lstrip(".").lower()
                           for e in allowed_extensions])
               if allowed_extensions else F.lit(False))
    # FAIL CLOSED on unknown metadata: NULL path/size make every rule
    # above evaluate to NULL, which would fall through to reason=NULL =
    # allowed (review-found) — a gate must quarantine what it cannot
    # judge, and a NULL size skipped by sum() would also under-report
    # allowed_bytes past the batch cap
    reason = (F.when(F.col(path_col).isNull(), F.lit("null_path"))
              .when(F.col(size_col).isNull(), F.lit("unknown_size"))
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
    """Batch-level caps over an annotated listing (ONE aggregate):
    raises like validate_batch_size/validate_total_size, returns the
    census dict for lineage."""
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
    if stats["allowed_bytes"] > config.max_total_size_mb * 1024 * 1024:
        raise ValueError(
            f"Batch total size {stats['allowed_bytes']} bytes > "
            f"{config.max_total_size_mb} MB")
    return stats
