"""Spring AI export (serving/spring_ai_export.py) vs the reference's
settings.py:179-265 behavior: provider resolution, yaml shape with the
other provider pruned, start.sh env vars, zip bundle, hybrid refusal."""

import io
import zipfile

import pytest
import yaml

from oaim_sandbox_spark.serving.config_plane import ModelDef
from oaim_sandbox_spark.serving.spring_ai_export import (
    render_obaas_yaml,
    render_start_sh,
    spring_ai_conf_check,
    spring_ai_zip,
)

LL = ModelDef(name="gpt-x", type="ll", provider="openai-compat",
              url="https://api.example/v1", api_key="sk-1", temperature=0.3,
              max_completion_tokens=512, extra={"top_p": 0.9})
EMB = ModelDef(name="text-embed", type="embed", provider="openai-compat")
OLL = ModelDef(name="llama3", type="ll", provider="ollama", url="http://oll:11434")
OLL_EMB = ModelDef(name="mxbai", type="embed", provider="ollama")
RAG = {"distance_metric": "COSINE", "index_type": "HNSW", "model": "text-embed",
       "vector_store": "VS1", "top_k": 4}
DB = {"dsn": "host:1521/pdb", "user": "scott", "password": "tiger"}


def test_conf_check_families():
    assert spring_ai_conf_check(LL, EMB) == "openai"
    assert spring_ai_conf_check(OLL, OLL_EMB) == "ollama"
    assert spring_ai_conf_check(LL, OLL_EMB) == "hybrid"
    assert spring_ai_conf_check(None, EMB) == "hybrid"


def test_obaas_yaml_openai_prunes_ollama():
    doc = yaml.safe_load(render_obaas_yaml("openai", LL, RAG, DB, "Use context."))
    ai = doc["spring"]["ai"]
    assert "openai" in ai and "ollama" not in ai  # provider pruning
    assert ai["openai"]["chat"]["options"]["model"] == "gpt-x"
    assert ai["openai"]["chat"]["options"]["topP"] == 0.9
    assert ai["openai"]["embedding"]["options"]["model"] == "text-embed"
    assert ai["vectorstore"]["oracle"]["distance-type"] == "COSINE"
    assert doc["aims"]["vectortable"]["name"] == "VS1"
    assert doc["aims"]["context_instr"] == "Use context."
    assert doc["server"]["servlet"]["context-path"] == "/v1"


def test_obaas_yaml_ollama_prunes_openai():
    doc = yaml.safe_load(render_obaas_yaml("ollama", OLL, RAG, DB, ""))
    ai = doc["spring"]["ai"]
    assert "ollama" in ai and "openai" not in ai
    assert ai["ollama"]["chat"]["options"]["num-predict"] == 256


def _parse_exports(sh: str) -> dict:
    """Shell-parse the export lines the way bash would, proving the quoting
    round-trips values as inert data."""
    import shlex

    env = {}
    for line in sh.splitlines():
        if line.startswith("export ") and "=" in line and "${" not in line:
            k, v = line[len("export "):].split("=", 1)
            parts = shlex.split(v)
            env[k] = parts[0] if parts else ""
    return env


def test_start_sh_env_vars():
    sh = render_start_sh("openai", LL, RAG, DB, 'Say "hi"')
    env = _parse_exports(sh)
    assert env["PROVIDER"] == "openai"
    assert env["OPENAI_CHAT_MODEL"] == "gpt-x"
    assert env["OP_TEMPERATURE"] == "0.3"
    assert env["DB_DSN"] == "jdbc:oracle:thin:@host:1521/pdb"
    assert env["CONTEXT_INSTR"] == 'Say "hi"'
    assert sh.rstrip().endswith("mvn spring-boot:run -P openai")

    sh = render_start_sh("ollama", OLL, RAG, DB, "")
    env = _parse_exports(sh)
    assert env["OLLAMA_BASE_URL"] == "http://oll:11434"
    assert env["OL_MAX_TOKENS"] == "256"


def test_start_sh_hostile_values_stay_inert():
    """Backticks, $(), quotes, and $vars in user-controlled fields must come
    out as literal DATA when the script is shell-parsed — never syntax."""
    hostile_db = {"dsn": "h:1521/p", "user": "scott", "password": 'p$w"`id`x$(reboot)'}
    sh = render_start_sh("openai", LL, RAG, hostile_db, "Use `id` and $(whoami) now")
    env = _parse_exports(sh)
    assert env["DB_PASSWORD"] == 'p$w"`id`x$(reboot)'
    assert env["CONTEXT_INSTR"] == "Use `id` and $(whoami) now"
    # and bash agrees: sourcing the exports executes nothing
    import subprocess

    body = "\n".join(l for l in sh.splitlines() if l.startswith("export CONTEXT_INSTR"))
    out = subprocess.run(["bash", "-c", body + "\nprintf '%s' \"$CONTEXT_INSTR\""],
                         capture_output=True, text=True, timeout=10)
    assert out.returncode == 0
    assert out.stdout == "Use `id` and $(whoami) now"


def test_zip_bundle_and_hybrid_refusal():
    blob = spring_ai_zip(LL, EMB, RAG, DB, ctx_prompt="ctx")
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = set(zf.namelist())
        assert names == {"README.md", "start.sh", "src/main/resources/application-obaas.yml"}
        doc = yaml.safe_load(zf.read("src/main/resources/application-obaas.yml"))
        assert doc["aims"]["context_instr"] == "ctx"

    with pytest.raises(ValueError, match="provider family"):
        spring_ai_zip(LL, OLL_EMB, RAG, DB)
