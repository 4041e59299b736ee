"""Config-plane CRUD parity (SURVEY §2.11 + P10/P11/P13/P14) — the
non-data-plane surface of the reference: model/prompt registries with
duplicate-name guards, sensitive-value masking, settings diff.

The reference keeps these as module-level Python lists (endpoints.py:45-49,
non-durable); we do the same in-memory registries with an optional JSON
persistence path — config is not a Spark concern.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class ModelDef:
    """Parity with the reference Model schema (schema.py:95-120): name,
    type (ll | embed | re-rank), provider/url/key, generation params."""

    name: str
    type: str = "ll"  # ll | embed | re-rank
    provider: str = "mock"
    url: str = ""
    api_key: str = ""
    enabled: bool = True
    context_length: int = 8192
    temperature: float = 1.0
    max_completion_tokens: int = 256
    max_chunk_size: int = 8192
    extra: dict = field(default_factory=dict)


@dataclass
class PromptDef:
    """Prompt entry (category sys | ctx, reference prompt_eng_def shape)."""

    name: str
    category: str  # sys | ctx
    prompt: str


class DuplicateNameError(ValueError):
    pass


class Registry:
    """Name-keyed CRUD with duplicate guards (P11: model_def.py:166-171,
    prompt_eng_def.py:60-65 reject duplicate definitions)."""

    def __init__(self, kind: str):
        self.kind = kind
        self._items: dict[str, object] = {}

    def create(self, item) -> None:
        key = self._key(item)
        if key in self._items:
            raise DuplicateNameError(f"{self.kind} {key!r} already exists")
        self._items[key] = item

    def _key(self, item) -> str:
        return getattr(item, "name")

    def get(self, name: str):
        return self._items.get(name)

    def update(self, name: str, item) -> None:
        if name not in self._items:
            raise KeyError(f"{self.kind} {name!r} not found")
        new_key = self._key(item)
        if new_key != name:
            # a rename: storing the renamed item under the OLD key would
            # leave it reachable only by its former name AND let a later
            # create() register a duplicate under the new one — exactly
            # what the P11 duplicate guard exists to prevent
            if new_key in self._items:
                raise DuplicateNameError(f"{self.kind} {new_key!r} already exists")
            del self._items[name]
            self._items[new_key] = item
            return
        self._items[name] = item

    def delete(self, name: str) -> None:
        if name not in self._items:
            raise KeyError(f"{self.kind} {name!r} not found")
        del self._items[name]

    def list(self, **filters):
        """P10 filtered listing (models by type/enabled, prompts by
        category — models.py:31-44, endpoints.py:509-519)."""
        out = list(self._items.values())
        for attr, want in filters.items():
            if want is not None:
                out = [i for i in out if getattr(i, attr, None) == want]
        return out


class PromptRegistry(Registry):
    """Prompts are keyed by (name, category) — same name may exist in both
    sys and ctx categories."""

    def _key(self, item) -> str:
        return f"{item.category}:{item.name}"

    def get(self, name: str, category: str = "sys"):
        return self._items.get(f"{category}:{name}")

    def delete(self, name: str, category: str = "sys") -> None:
        key = f"{category}:{name}"
        if key not in self._items:
            raise KeyError(f"{self.kind} {key!r} not found")
        del self._items[key]

    def update(self, name: str, item, category: str = "sys") -> None:
        # prompts are stored under 'category:name'; the base update keys by
        # bare name, so it could NEVER find an existing prompt
        key = f"{category}:{name}"
        if key not in self._items:
            raise KeyError(f"{self.kind} {key!r} not found")
        new_key = self._key(item)
        if new_key != key and new_key in self._items:
            raise DuplicateNameError(f"{self.kind} {new_key!r} already exists")
        if new_key != key:
            del self._items[key]
        self._items[new_key] = item


def mask_sensitive(obj, mark: str = "*****"):
    """P13 recursive masking of *password*/*key*/*token* values
    (reference api_call.py:129-135 masks '*password*' keys)."""
    sensitive = ("password", "api_key", "apikey", "token", "secret", "key")

    def _mask_all(v):
        # a sensitive-named CONTAINER ({'api_keys': {...}}, {'tokens': [...]})
        # holds credentials under arbitrary inner names — mask every string
        # leaf in the subtree, not just string values of sensitive keys
        if isinstance(v, dict):
            return {k: _mask_all(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_mask_all(x) for x in v]
        return mark if isinstance(v, str) and v else v

    if isinstance(obj, dict):
        return {
            k: (_mask_all(v) if any(s in k.lower() for s in sensitive) else mask_sensitive(v, mark))
            for k, v in obj.items()
        }
    if isinstance(obj, list):
        return [mask_sensitive(v, mark) for v in obj]
    return obj


def diff_settings(current: dict, uploaded: dict, prefix: str = "") -> list[str]:
    """P14 recursive settings diff (reference config/settings.py:204-240):
    returns dotted paths whose values differ, including keys present on only
    one side."""
    out: list[str] = []
    keys = sorted(set(current) | set(uploaded))
    for k in keys:
        path = f"{prefix}.{k}" if prefix else k
        if k not in current or k not in uploaded:
            out.append(path)
        elif isinstance(current[k], dict) and isinstance(uploaded[k], dict):
            out.extend(diff_settings(current[k], uploaded[k], path))
        elif current[k] != uploaded[k]:
            out.append(path)
    return out


def bootstrap_models() -> Registry:
    """Example-model bootstrap (reference model_def.py:17-173 ships 12
    catalog entries): the two in-repo mock providers plus one example per
    provider family wired in serving/providers.py — all disabled until the
    user supplies url/key, like the reference's bootstrap."""
    reg = Registry("model")
    reg.create(ModelDef(name="mock-llm", type="ll", provider="mock"))
    reg.create(ModelDef(name="mock-embed", type="embed", provider="mock", max_chunk_size=8192))
    examples = [
        ModelDef(name="gpt-4o-mini", type="ll", provider="openai",
                 url="https://api.openai.com/v1", enabled=False, context_length=128000),
        ModelDef(name="text-embedding-3-small", type="embed", provider="openai",
                 url="https://api.openai.com/v1", enabled=False, max_chunk_size=8191),
        ModelDef(name="embed-english-v3.0", type="embed", provider="cohere",
                 url="https://api.cohere.ai/v1", enabled=False, max_chunk_size=512),
        ModelDef(name="command-r", type="ll", provider="openai-compat",
                 url="https://api.cohere.ai/compatibility/v1", enabled=False),
        ModelDef(name="nomic-embed-text", type="embed", provider="ollama",
                 url="http://localhost:11434", enabled=False, max_chunk_size=8192),
        ModelDef(name="llama3.1", type="ll", provider="openai-compat",
                 url="http://localhost:11434/v1", enabled=False),
        ModelDef(name="bge-base-en", type="embed", provider="hf-tei",
                 url="http://localhost:8080", enabled=False, max_chunk_size=512),
        ModelDef(name="sonar", type="ll", provider="perplexity",
                 url="https://api.perplexity.ai", enabled=False),
    ]
    for m in examples:
        reg.create(m)
    return reg


def save_registry(reg: Registry, path: str) -> None:
    with open(path, "w") as fh:
        json.dump({k: asdict(v) for k, v in reg._items.items()}, fh)


def load_registry(path: str, kind: str = "model") -> Registry:
    """JSON round trip for BOTH registry kinds: a prompt registry must come
    back as a PromptRegistry of PromptDefs (category:name keying), not a
    base Registry of ModelDefs that TypeErrors on 'category'."""
    if kind == "prompt":
        reg: Registry = PromptRegistry(kind)
        cls = PromptDef
    else:
        reg = Registry(kind)
        cls = ModelDef
    if os.path.exists(path):
        with open(path) as fh:
            for _, item in json.load(fh).items():
                reg.create(cls(**item))
    return reg
