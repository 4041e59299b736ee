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


def test_prompt_update_and_rename_guards():
    """PromptRegistry.update must find 'category:name'-keyed items (the
    inherited bare-name update could never succeed), and a Registry rename
    must re-key the item and respect the duplicate guard."""
    import pytest

    from oaim_sandbox_spark.serving.config_plane import (
        DuplicateNameError,
        ModelDef,
        PromptDef,
        PromptRegistry,
        Registry,
    )

    pr = PromptRegistry("prompt")
    pr.create(PromptDef(name="greet", category="sys", prompt="hi"))
    pr.update("greet", PromptDef(name="greet", category="sys", prompt="hello"))
    assert pr.get("greet", "sys").prompt == "hello"

    reg = Registry("model")
    reg.create(ModelDef(name="a"))
    reg.update("a", ModelDef(name="b"))  # rename re-keys
    assert reg.get("a") is None and reg.get("b") is not None
    reg.create(ModelDef(name="c"))
    with pytest.raises(DuplicateNameError):
        reg.update("c", ModelDef(name="b"))  # rename onto an existing name


def test_mask_sensitive_containers_and_registry_roundtrip(tmp_path):
    """Secrets nested under a sensitive-named container are masked to the
    leaves, and save/load round-trips BOTH registry kinds."""
    from oaim_sandbox_spark.serving.config_plane import (
        PromptDef,
        PromptRegistry,
        load_registry,
        mask_sensitive,
        save_registry,
    )

    masked = mask_sensitive({"api_keys": {"openai": "sk-123"}, "tokens": ["t1", ""]})
    assert masked == {"api_keys": {"openai": "*****"}, "tokens": ["*****", ""]}
    assert mask_sensitive({"name": "m"}) == {"name": "m"}

    pr = PromptRegistry("prompt")
    pr.create(PromptDef(name="greet", category="sys", prompt="hi"))
    pr.create(PromptDef(name="greet", category="ctx", prompt="re"))
    p = str(tmp_path / "prompts.json")
    save_registry(pr, p)
    back = load_registry(p, kind="prompt")
    assert back.get("greet", "sys").prompt == "hi"
    assert back.get("greet", "ctx").prompt == "re"
