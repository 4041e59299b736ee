"""Config-plane CRUD (§2.11): duplicate guards, filtered listing, masking,
settings diff."""

import pytest

from oaim_sandbox_spark.serving.config_plane import (
    DuplicateNameError,
    ModelDef,
    PromptDef,
    PromptRegistry,
    Registry,
    bootstrap_models,
    diff_settings,
    load_registry,
    mask_sensitive,
    save_registry,
)


def test_duplicate_model_rejected():
    reg = bootstrap_models()
    with pytest.raises(DuplicateNameError):
        reg.create(ModelDef(name="mock-llm"))


def test_model_filtering():
    reg = bootstrap_models()
    embeds = [m.name for m in reg.list(type="embed")]
    assert embeds[0] == "mock-embed" and "text-embedding-3-small" in embeds
    assert len(reg.list(type=None)) == 10  # 2 mocks + 8 provider examples
    # provider examples bootstrap disabled (no url/key supplied yet)
    assert {m.name for m in reg.list(enabled=True)} == {"mock-llm", "mock-embed"}
    reg.update("mock-llm", ModelDef(name="mock-llm", enabled=False))
    assert [m.name for m in reg.list(enabled=True)] == ["mock-embed"]


def test_crud_errors():
    reg = Registry("model")
    with pytest.raises(KeyError):
        reg.update("ghost", ModelDef(name="ghost"))
    with pytest.raises(KeyError):
        reg.delete("ghost")


def test_prompt_registry_keyed_by_category():
    reg = PromptRegistry("prompt")
    reg.create(PromptDef("basic", "sys", "you are helpful"))
    reg.create(PromptDef("basic", "ctx", "rephrase the question"))
    assert reg.get("basic", "sys").prompt == "you are helpful"
    assert reg.get("basic", "ctx").prompt == "rephrase the question"
    with pytest.raises(DuplicateNameError):
        reg.create(PromptDef("basic", "sys", "again"))


def test_mask_sensitive_recursive():
    cfg = {
        "database": {"password": "hunter2", "user": "scott"},
        "models": [{"api_key": "sk-123", "name": "m"}],
        "empty_key": {"api_key": ""},
    }
    masked = mask_sensitive(cfg)
    assert masked["database"]["password"] == "*****"
    assert masked["database"]["user"] == "scott"
    assert masked["models"][0]["api_key"] == "*****"
    assert masked["models"][0]["name"] == "m"
    assert masked["empty_key"]["api_key"] == ""  # empty values stay empty


def test_diff_settings():
    cur = {"rag": {"top_k": 4, "metric": "COSINE"}, "model": "a"}
    up = {"rag": {"top_k": 10, "metric": "COSINE"}, "model": "a", "new": 1}
    assert diff_settings(cur, up) == ["new", "rag.top_k"]
    assert diff_settings(cur, cur) == []


def test_registry_persistence(tmp_path):
    reg = bootstrap_models()
    path = str(tmp_path / "models.json")
    save_registry(reg, path)
    loaded = load_registry(path)
    assert sorted(m.name for m in loaded.list()) == sorted(m.name for m in reg.list())
