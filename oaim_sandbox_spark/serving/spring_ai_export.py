"""Spring AI client-config export — the last reference surface gap.

The reference's Streamlit client can package the user's current RAG settings
as a Spring AI application bundle: an ``application-obaas.yml`` + a
``start.sh`` env script rendered from templates and zipped with the Java
scaffold (reference src/client/content/config/settings.py:179-265,
src/client/spring_ai/templates/{obaas.yaml,start.sh}). This module renders
the same two config artifacts from this engine's ModelDef / DatabaseDef /
settings objects. The Java/Maven scaffold itself (mvnw, pom.xml, src/) is the
reference's client application and is NOT vendored — the zip carries the
rendered configs plus a README pointing at the upstream scaffold, which is
the part a user actually needs to migrate settings.

Provider resolution mirrors spring_ai_conf_check (settings.py:179-193): the
export is only well-defined when chat and embedding run on the SAME provider
family (both OpenAI-compatible or both Ollama); anything else is "hybrid"
and refuses to render.
"""

from __future__ import annotations

import io
import shlex
import zipfile

import yaml

from oaim_sandbox_spark.serving.config_plane import ModelDef

_README = """\
Spring AI export from oaim_sandbox_spark
========================================

Files:
  - application-obaas.yml : drop into src/main/resources/ of the upstream
    Spring AI client scaffold (oaim-sandbox src/client/spring_ai/).
  - start.sh              : exports the provider env vars and runs
    `mvn spring-boot:run -P <provider>`.

The Java scaffold (mvnw, pom.xml, src/) ships with the upstream client and
is not duplicated here.
"""


def spring_ai_conf_check(ll_model: ModelDef | None, embed_model: ModelDef | None) -> str:
    """'openai' / 'ollama' when chat + embedding share a provider family,
    else 'hybrid' (not exportable) — settings.py:179-193 parity."""
    if ll_model is None or embed_model is None:
        return "hybrid"
    ll, em = ll_model.provider.lower(), embed_model.provider.lower()
    if "openai" in ll and "openai" in em:
        return "openai"
    if "ollama" in ll and "ollama" in em:
        return "ollama"
    return "hybrid"


def _gen_params(ll_model: ModelDef) -> dict:
    """Generation params with the reference template's field set; the ones
    ModelDef doesn't model first-class come from its extra dict."""
    x = ll_model.extra or {}
    return {
        "model": ll_model.name,
        "url": ll_model.url,
        "api_key": ll_model.api_key,
        "temperature": ll_model.temperature,
        "max_tokens": ll_model.max_completion_tokens,
        "presence_penalty": x.get("presence_penalty", 0.0),
        "frequency_penalty": x.get("frequency_penalty", 0.0),
        "top_p": x.get("top_p", 1.0),
    }


def render_obaas_yaml(
    provider: str,
    ll_model: ModelDef,
    rag: dict,
    database: dict,
    ctx_prompt: str,
) -> str:
    """application-obaas.yml content (templates/obaas.yaml semantics): the
    Oracle vector-store block, ONE provider block (the other is pruned, as
    spring_ai_obaas does post-format), and the aims rag block."""
    if provider not in ("openai", "ollama"):
        raise ValueError(f"provider must be 'openai' or 'ollama', got {provider!r}")
    g = _gen_params(ll_model)
    ai: dict = {
        "vectorstore": {
            "oracle": {
                "distance-type": rag.get("distance_metric", "COSINE"),
                "remove-existing-vector-store-table": True,
                "initialize-schema": True,
                "index-type": rag.get("index_type", "HNSW"),
            }
        }
    }
    if provider == "openai":
        ai["openai"] = {
            "base-url": g["url"],
            "api-key": g["api_key"],
            "chat": {
                "options": {
                    "temperature": g["temperature"],
                    "presencePenalty": g["presence_penalty"],
                    "frequencyPenalty": g["frequency_penalty"],
                    "maxTokens": g["max_tokens"],
                    "topP": g["top_p"],
                    "model": g["model"],
                }
            },
            "embedding": {"options": {"model": rag.get("model", "")}},
        }
    else:
        ai["ollama"] = {
            "base-url": g["url"] or "http://ollama.ollama.svc.cluster.local:11434",
            "chat": {
                "options": {
                    "temperature": g["temperature"],
                    "presence-penalty": g["presence_penalty"],
                    "frequency-penalty": g["frequency_penalty"],
                    "num-predict": g["max_tokens"],
                    "top-p": g["top_p"],
                    "model": g["model"],
                }
            },
            "embedding": {"options": {"model": rag.get("model", "")}},
        }
    doc = {
        "server": {"servlet": {"context-path": "/v1"}},
        "spring": {
            "datasource": {
                "url": "${spring.datasource.url}",
                "username": "${spring.datasource.username}",
                "password": "${spring.datasource.password}",
            },
            "ai": ai,
        },
        "aims": {
            "context_instr": ctx_prompt,
            "vectortable": {"name": rag.get("vector_store", "")},
            "rag_params": {
                "search_type": "Similarity",
                "top_k": rag.get("top_k", 4),
            },
        },
    }
    return yaml.safe_dump(doc, sort_keys=False)


def render_start_sh(
    provider: str,
    ll_model: ModelDef,
    rag: dict,
    database: dict,
    ctx_prompt: str,
) -> str:
    """start.sh content (templates/start.sh semantics): provider env vars,
    generation params under the OP_/OL_ prefix, DB + rag exports, then
    `mvn spring-boot:run -P <provider>`. Every interpolated value is
    shlex-quoted — the script is sourced by a shell, so a password or
    context prompt containing backticks/$()/quotes must become inert data,
    not syntax (the upstream template's naive double-quoting does not
    guarantee that)."""
    if provider not in ("openai", "ollama"):
        raise ValueError(f"provider must be 'openai' or 'ollama', got {provider!r}")
    g = _gen_params(ll_model)
    prefix = "OP" if provider == "openai" else "OL"
    q = lambda v: shlex.quote(str(v))  # noqa: E731
    lines = ["#!/bin/bash", f"export PROVIDER={q(provider)}"]
    if provider == "openai":
        lines += [
            f"export OPENAI_CHAT_MODEL={q(g['model'])}",
            f"export OPENAI_EMBEDDING_MODEL={q(rag.get('model', ''))}",
            f"export OPENAI_URL={q(g['url'])}",
        ]
    else:
        lines += [
            f"export OLLAMA_BASE_URL={q(g['url'])}",
            f"export OLLAMA_CHAT_MODEL={q(g['model'])}",
            f"export OLLAMA_EMBEDDING_MODEL={q(rag.get('model', ''))}",
        ]
    lines += [
        f"export {prefix}_TEMPERATURE={q(g['temperature'])}",
        f"export {prefix}_FREQUENCY_PENALTY={q(g['frequency_penalty'])}",
        f"export {prefix}_PRESENCE_PENALTY={q(g['presence_penalty'])}",
        f"export {prefix}_MAX_TOKENS={q(g['max_tokens'])}",
        f"export {prefix}_TOP_P={q(g['top_p'])}",
        'export SPRING_AI_OPENAI_API_KEY=${OPENAI_API_KEY}',
        f"export DB_DSN={q('jdbc:oracle:thin:@' + str(database.get('dsn', '')))}",
        f"export DB_USERNAME={q(database.get('user', ''))}",
        f"export DB_PASSWORD={q(database.get('password', ''))}",
        f"export DISTANCE_TYPE={q(rag.get('distance_metric', 'COSINE'))}",
        f"export INDEX_TYPE={q(rag.get('index_type', 'HNSW'))}",
        f"export CONTEXT_INSTR={q(ctx_prompt)}",
        f"export TOP_K={q(rag.get('top_k', 4))}",
        f"export VECTOR_STORE={q(rag.get('vector_store', ''))}",
        f"mvn spring-boot:run -P {q(provider)}",
    ]
    return "\n".join(lines) + "\n"


def spring_ai_zip(
    ll_model: ModelDef,
    embed_model: ModelDef,
    rag: dict,
    database: dict,
    ctx_prompt: str = "",
) -> bytes:
    """The export bundle (settings.py:235-265 spring_ai_zip shape): rendered
    start.sh + src/main/resources/application-obaas.yml + README. Raises
    ValueError for hybrid provider configs, like the reference disables the
    download button."""
    provider = spring_ai_conf_check(ll_model, embed_model)
    if provider == "hybrid":
        raise ValueError("chat and embedding models must share a provider family (openai or ollama)")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("README.md", _README)
        zf.writestr("start.sh", render_start_sh(provider, ll_model, rag, database, ctx_prompt))
        zf.writestr(
            "src/main/resources/application-obaas.yml",
            render_obaas_yaml(provider, ll_model, rag, database, ctx_prompt),
        )
    return buf.getvalue()
