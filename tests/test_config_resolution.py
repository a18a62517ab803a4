"""Config hierarchy CLI > ENV > YAML > defaults (reference atlas_config)."""

import pytest

from ragstudio_spark.pipeline.config import from_env, from_yaml, resolve_config
from ragstudio_spark.pipeline.job import PipelineConfig


@pytest.fixture()
def yaml_file(tmp_path):
    path = tmp_path / "cfg.yml"
    path.write_text(
        "pipeline:\n"
        "  strategy: semantic\n"
        "  max_tokens: 111\n"
        "  overlap: 11\n"
        "  adaptive: true\n"
        "  language_filter: fr,en\n"
    )
    return str(path)


class TestLayers:
    def test_defaults_only(self):
        assert resolve_config(environ={}) == PipelineConfig()

    def test_yaml_overrides_defaults(self, yaml_file):
        cfg = resolve_config(environ={}, yaml_path=yaml_file)
        assert cfg.strategy == "semantic"
        assert cfg.max_tokens == 111
        assert cfg.adaptive is True
        assert cfg.language_filter == ("fr", "en")
        assert cfg.min_readable_ratio == 0.9  # untouched default

    def test_env_overrides_yaml(self, yaml_file):
        env = {"RAGSTUDIO_MAX_TOKENS": "222", "RAGSTUDIO_ADAPTIVE": "false",
               "UNRELATED": "x"}
        cfg = resolve_config(environ=env, yaml_path=yaml_file)
        assert cfg.max_tokens == 222          # ENV beats YAML
        assert cfg.adaptive is False
        assert cfg.strategy == "semantic"     # YAML survives where ENV silent

    def test_cli_overrides_all(self, yaml_file):
        env = {"RAGSTUDIO_MAX_TOKENS": "222"}
        cfg = resolve_config(cli={"max_tokens": 333, "strategy": "recursive"},
                             environ=env, yaml_path=yaml_file)
        assert cfg.max_tokens == 333          # CLI beats ENV beats YAML
        assert cfg.strategy == "recursive"
        assert cfg.overlap == 11              # YAML survives below

    def test_flat_yaml_without_section(self, tmp_path):
        path = tmp_path / "flat.yml"
        path.write_text("max_tokens: 99\n")
        assert from_yaml(str(path)) == {"max_tokens": 99}


class TestCoercion:
    def test_env_typed_coercion(self):
        env = {
            "RAGSTUDIO_MAX_TOKENS": "500",
            "RAGSTUDIO_MIN_READABLE_RATIO": "0.5",
            "RAGSTUDIO_DEDUPE_CHUNKS": "yes",
            "RAGSTUDIO_EXTRACT_TOOLS": "0",
            "RAGSTUDIO_LANGUAGE_FILTER": "de , fr",
        }
        out = from_env(env)
        assert out == {
            "max_tokens": 500,
            "min_readable_ratio": 0.5,
            "dedupe_chunks": True,
            "extract_tools": False,
            "language_filter": ("de", "fr"),
        }

    def test_dedupe_chunks_tri_state(self):
        env = {"RAGSTUDIO_DEDUPE_CHUNKS": "near"}
        assert from_env(env)["dedupe_chunks"] == "near"
        assert from_env({"RAGSTUDIO_DEDUPE_CHUNKS": "exact"})["dedupe_chunks"] == "exact"
        assert from_env({"RAGSTUDIO_DEDUPE_CHUNKS": "true"})["dedupe_chunks"] is True
        assert from_env({"RAGSTUDIO_DEDUPE_CHUNKS": "false"})["dedupe_chunks"] is False

    def test_unknown_yaml_key_fails_loudly(self, tmp_path):
        path = tmp_path / "typo.yml"
        path.write_text("pipeline:\n  max_tokenz: 10\n")
        with pytest.raises(ValueError, match="max_tokenz"):
            from_yaml(str(path))

    def test_unknown_env_key_ignored(self):
        # ENV is a shared namespace — unknown RAGSTUDIO_* vars are skipped
        # (they may belong to other tools), unlike YAML/CLI typos
        assert from_env({"RAGSTUDIO_NOT_A_FIELD": "x"}) == {}
