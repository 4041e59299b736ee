"""Chat pipeline (§3.1 state machine): history cleaning rules (T5), RAG
routing, grading gate, OpenAI-compatible response shape, streaming sentinel."""

import pytest

from oaim_sandbox_spark.operators.embed import DeterministicProvider, mock_embed_column
from oaim_sandbox_spark.serving.chat import (
    ChatPipeline,
    Message,
    MockLLM,
    RagSettings,
    clean_messages,
)


def test_clean_messages_drops_system_and_tool():
    hist = [
        Message("system", "sys"),
        Message("user", "q1"),
        Message("assistant", "calls tool"),
        Message("tool", "tool result"),
        Message("assistant", "a1"),
        Message("user", "q2"),
    ]
    out = clean_messages(hist, use_history=True)
    # system gone, tool gone, the assistant message that triggered the tool gone
    assert [(m.role, m.content) for m in out] == [
        ("user", "q1"),
        ("assistant", "a1"),
        ("user", "q2"),
    ]


def test_clean_messages_no_history_keeps_last_user():
    hist = [Message("user", "q1"), Message("assistant", "a1"), Message("user", "q2")]
    out = clean_messages(hist, use_history=False)
    assert [(m.role, m.content) for m in out] == [("user", "q2")]


@pytest.fixture(scope="module")
def pipeline(spark):
    docs = spark.createDataFrame(
        [
            ("c1", "spark is a distributed compute engine for large data"),
            ("c2", "cats are small domesticated felines that sleep all day"),
            ("c3", "parquet is a columnar storage format used with spark"),
        ],
        "id STRING, text STRING",
    )
    store = mock_embed_column(docs, dim=32)
    embedder = DeterministicProvider(dim=32)
    return ChatPipeline(
        store,
        embed_query=lambda q: embedder.embed_documents([q])[0],
        llm=MockLLM(),
        settings=RagSettings(top_k=2),
    )


def test_chat_response_shape(pipeline):
    resp = pipeline.chat("tell me about spark compute", client_id="t1")
    assert resp.object == "chat.completion"
    assert resp.choices[0].finish_reason == "stop"
    assert resp.choices[0].message.role == "assistant"
    assert resp.usage.total_tokens == resp.usage.prompt_tokens + resp.usage.completion_tokens
    assert resp.choices[0].message.content.startswith("ANSWER(")


def test_history_kept_per_client(pipeline):
    pipeline.chat("first question about spark", client_id="h1")
    pipeline.chat("second question about parquet", client_id="h1")
    hist = pipeline.history("h1")
    assert [m.role for m in hist] == ["user", "assistant", "user", "assistant"]
    assert pipeline.history("other") == []


def test_stream_sentinel(pipeline):
    toks = list(pipeline.stream("stream me an answer please", client_id="s1"))
    assert toks[-1] == "[stream_finished]"
    assert "".join(toks[:-1]).strip().startswith("ANSWER(")


def test_rag_disabled_skips_retrieval(spark):
    p = ChatPipeline(
        None,
        embed_query=lambda q: [0.0],
        llm=MockLLM(),
        settings=RagSettings(rag_enabled=False),
    )
    resp = p.chat("anything at all works here")
    assert resp.choices[0].message.content.startswith("ANSWER(")


def test_grading_gate_drops_irrelevant(pipeline):
    # question shares no >3-char word with any stored chunk -> grader says no
    # -> generation runs ungrounded (still answers)
    resp = pipeline.chat("zzzz qqqq wwww", client_id="g1")
    assert resp.choices[0].message.content.startswith("ANSWER(")


def test_failed_turn_leaves_history_clean():
    """A provider failure mid-turn must not commit a dangling user message:
    the user/assistant pair lands in persistent history only after the turn
    succeeds, so a retry does not produce two consecutive user turns."""
    import pytest

    from oaim_sandbox_spark.serving.chat import ChatPipeline, LLMClient, Message, RagSettings

    class FlakyLLM(LLMClient):
        def __init__(self):
            self.calls = 0

        def complete(self, messages):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("provider timeout")
            return "recovered answer"

        def stream(self, messages):
            yield self.complete(messages)

    pipe = ChatPipeline(store=None, embed_query=None, llm=FlakyLLM(),
                        settings=RagSettings(rag_enabled=False))
    with pytest.raises(RuntimeError):
        pipe.chat("hello?", client_id="c1")
    assert pipe.history("c1") == []  # nothing dangling
    resp = pipe.chat("hello?", client_id="c1")  # retry succeeds
    assert resp.choices[0].message.content == "recovered answer"
    assert [m.role for m in pipe.history("c1")] == ["user", "assistant"]


def test_chat_without_llm_returns_apology_not_crash():
    """Reference parity (test_endpoints_chat test_chat_completion_model_error):
    an uninitialisable language model yields HTTP-200 semantics with the
    apology as the assistant content; history stays untouched."""
    pipe = ChatPipeline(store=None, embed_query=None, llm=None,
                        settings=RagSettings(rag_enabled=False))
    resp = pipe.chat("hello?", client_id="c-nollm")
    assert "unable to initialise the Language Model" in resp.choices[0].message.content
    assert pipe.history("c-nollm") == []
    # streaming path shares the fallback and still ends with the sentinel
    toks = list(pipe.stream("hello?", client_id="c-nollm"))
    assert toks[-1] == "[stream_finished]"
