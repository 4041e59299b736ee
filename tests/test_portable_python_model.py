"""THIRD-LEG fuzz of the dual-dialect fragment layer: DuckDB evaluation vs
an INDEPENDENT Python re-derivation. test_portable_parity.py proves Spark
and DuckDB agree on every fragment — but a fragment that is wrong the same
way on both engines sails through that gate and through every query-level
oracle built on it (the round-13 lesson: the shared-SQL oracle certified a
sum-where-mean-was-meant bug). The pin waves re-derived the primitives ad
hoc per query; this file does it systematically under hypothesis, so any
future fragment edit is fuzzed against a model that shares no code and no
engine with it."""

import hashlib
import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oaim_sandbox_spark.functions import portable as P

MOD = 1_000_000_007

_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_#:",
                min_size=0, max_size=8)
TEXTS = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
VECS = st.lists(
    st.integers(min_value=-64, max_value=64).map(lambda k: k / 16.0),
    min_size=1, max_size=9)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str):
    return [t for t in text.split(" ") if t]


def _ngrams(text: str, n: int):
    toks = _toks(text)
    if len(toks) >= n:
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)]


def _minhash(text: str, num_perm: int, ngram: int):
    hs = [_h64(g) % MOD for g in _ngrams(text, ngram)]
    out = []
    for i in range(num_perm):
        a = (_h64(f"minhash:a:{i}") % (MOD - 1)) + 1
        b = _h64(f"minhash:b:{i}") % MOD
        out.append(min((a * h + b) % MOD for h in hs))
    return out


def _simhash(text: str, bits: int) -> int:
    from collections import Counter
    votes = [0] * bits
    for tok, c in Counter(_toks(text)).items():
        h = _h64(tok)
        for j in range(bits):
            votes[j] += c if (h >> j) & 1 else -c
    return sum(1 << j for j in range(bits) if votes[j] > 0)


def _lit(text: str) -> str:
    return "'" + text.replace("'", "''") + "'"


@given(text=TEXTS)
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_text_fragments_match_python_model(duck, text):
    lit = _lit(text)
    row = duck.sql(
        f"SELECT {P.hash64(lit, 'duck')}, {P.hash_mod(lit, 'duck')}, "
        f"{P.hash_unit(lit, 'duck')}, {P.tokens(lit, 'duck')}, "
        f"{P.word_ngrams(lit, 3, 'duck')}, {P.shingle_hashes(lit, 3, 'duck')}, "
        f"{P.minhash_from_hashes(P.shingle_hashes(lit, 3, 'duck'), 4, 'duck')}, "
        f"{P.normalize_text(lit, 'duck')}, {P.simhash(lit, 16, 'duck')}"
    ).fetchone()
    h = _h64(text)
    assert row[0] == h
    assert row[1] == h % MOD
    assert row[2] == (h % 1000000) / 1000000.0
    assert row[3] == _toks(text)
    assert row[4] == _ngrams(text, 3)
    assert row[5] == [_h64(g) % MOD for g in _ngrams(text, 3)]
    assert row[6] == _minhash(text, 4, 3)
    import re
    assert row[7] == re.sub(r"\s+", " ", text.lower()).strip()
    assert row[8] == _simhash(text, 16)


@given(text=TEXTS)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_mock_embed_matches_python_model(duck, text):
    lit = _lit(text)
    row = duck.sql(f"SELECT {P.mock_embed(lit, 6, 'duck')}").fetchone()
    exp = [(_h64(f"{text}:{i}") % 2000001) / 1000000.0 - 1.0 for i in range(6)]
    assert row[0] == exp
    assert all(-1.0 <= x <= 1.0 for x in row[0])


@given(vec=VECS)
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_vector_fragments_match_python_model(duck, vec):
    arr = "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"
    n = len(vec)
    row = duck.sql(
        f"SELECT {P.dot(arr, arr, 'duck')}, {P.norm2(arr, 'duck')}, "
        f"{P.absmax(arr, 'duck')}, "
        f"{P.quantize_int8(arr, P.absmax(arr, 'duck'), 'duck')}, "
        f"{P.l2sq(arr, arr, 'duck')}, "
        f"{P.sign_pack(arr, 1, min(n, 60), 'duck')}"
    ).fetchone()
    dot = 0.0
    for x in vec:
        dot += x * x
    assert row[0] == dot
    assert row[1] == math.sqrt(dot)
    scale = max(max(abs(x) for x in vec), 1e-30)
    assert row[2] == scale
    assert row[3] == [math.floor(x / scale * 127.0 + 0.5) for x in vec]
    assert row[4] == 0.0
    assert row[5] == sum(1 << j for j, x in enumerate(vec[:60]) if x > 0)


@given(vals=st.lists(
    st.integers(min_value=-2_000_000, max_value=2_000_000).map(
        lambda k: k / 1000.0),
    min_size=1, max_size=12))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_exact_sum_avg_match_python_model(duck, vals):
    rows = ", ".join(f"({v!r})" for v in vals)
    s, a = duck.sql(
        f"SELECT {P.exact_sum('x', 'duck', 6)}, {P.exact_avg('x', 'duck', 6)} "
        f"FROM (VALUES {rows}) AS t(x)"
    ).fetchone()
    q = sum(math.floor(v * 1e6 + 0.5) for v in vals)
    assert s == q / 1e6
    assert a == q / (len(vals) * 1e6)
