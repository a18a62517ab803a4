"""Configuration resolution: CLI > ENV > YAML > defaults.

Mirrors the reference's unified config hierarchy (src/core/config/
atlas_config.py:1-15, 231-252: ``from_file`` then ``merge_from_env`` then
CLI kwargs, with typed getenv coercion at :301-313) for the engine's
``PipelineConfig``. Layers:

* defaults — the PipelineConfig dataclass field defaults;
* YAML     — a config file (``pipeline:`` section or flat keys);
* ENV      — ``RAGSTUDIO_<FIELD>`` variables (e.g. RAGSTUDIO_MAX_TOKENS);
* CLI      — explicit flags (only values the user actually passed).

Later layers win. Unknown keys fail loudly — a typoed setting silently
ignored is the classic config bug.
"""

from __future__ import annotations

import os
from dataclasses import fields
from typing import Any, Mapping

from ragstudio_spark.pipeline.job import PipelineConfig

ENV_PREFIX = "RAGSTUDIO_"

_FIELDS = {f.name: f for f in fields(PipelineConfig)}


def _coerce(name: str, raw: Any) -> Any:
    """Typed coercion per field (reference getenv_bool/int/float,
    atlas_config.py:301-313). Already-typed values pass through."""
    if name not in _FIELDS:
        raise ValueError(f"unknown PipelineConfig key: {name!r}")
    if raw is None:
        return None
    default = _FIELDS[name].default
    if name == "dedupe_chunks":
        if isinstance(raw, bool):
            return raw
        low = str(raw).strip().lower()
        if low in ("exact", "near"):
            return low
        return low in ("1", "true", "yes", "on")
    if name == "language_filter":
        if isinstance(raw, str):
            parts = tuple(x.strip() for x in raw.split(",") if x.strip())
            return parts or None
        return tuple(raw) if raw else None
    if isinstance(default, bool):
        if isinstance(raw, bool):
            return raw
        return str(raw).strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return str(raw)


def from_yaml(path: str) -> dict:
    """Settings dict from a YAML file — either flat keys or under a
    ``pipeline:`` section (the reference's config.example.yml shape)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    if not isinstance(data, dict):
        raise ValueError(f"config file {path} must hold a mapping")
    section = data.get("pipeline", data)
    if not isinstance(section, dict):
        raise ValueError(f"'pipeline' section in {path} must be a mapping")
    return {k: _coerce(k, v) for k, v in section.items()}


def from_env(environ: Mapping[str, str] | None = None) -> dict:
    """Settings from RAGSTUDIO_* environment variables."""
    environ = os.environ if environ is None else environ
    out = {}
    for key, raw in environ.items():
        if key.startswith(ENV_PREFIX):
            name = key[len(ENV_PREFIX):].lower()
            if name in _FIELDS:
                out[name] = _coerce(name, raw)
    return out


def resolve_config(cli: Mapping[str, Any] | None = None,
                   environ: Mapping[str, str] | None = None,
                   yaml_path: str | None = None) -> PipelineConfig:
    """Merge defaults ← YAML ← ENV ← CLI (later wins). ``cli`` should
    contain only explicitly-passed values; None values are skipped in
    every layer so a layer never erases a lower one with 'unset'."""
    merged: dict[str, Any] = {}
    layers = []
    if yaml_path:
        layers.append(from_yaml(yaml_path))
    layers.append(from_env(environ))
    if cli:
        layers.append({k: _coerce(k, v) for k, v in cli.items()})
    for layer in layers:
        for k, v in layer.items():
            if v is not None:
                merged[k] = v
    return PipelineConfig(**merged)
