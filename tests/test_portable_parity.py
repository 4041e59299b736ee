"""Cross-engine fuzz of the dual-dialect fragment layer
(functions/portable.py): the whole oracle methodology rests on these
fragments being bit-identical between Spark and DuckDB, so fuzz them
directly on adversarial strings instead of trusting the query-level gate to
surface every edge."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oaim_sandbox_spark.functions import portable as P

# printable-ish text with the separators and repeats our pipelines care
# about; excludes the quote chars we'd have to escape into SQL literals
_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_#:", min_size=0, max_size=8)
TEXTS = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)

FRAGMENTS = [
    ("hash64", lambda e, d: P.hash64(e, d)),
    ("hash_mod", lambda e, d: P.hash_mod(e, d)),
    ("hash_unit", lambda e, d: P.hash_unit(e, d)),
    ("tokens", lambda e, d: P.tokens(e, d)),
    ("ngram3", lambda e, d: P.word_ngrams(e, 3, d)),
    ("shingles", lambda e, d: P.shingle_hashes(e, 3, d)),
    ("minhash4", lambda e, d: P.minhash_signature(e, 4, 3, d)),
    ("simhash16", lambda e, d: P.simhash(e, 16, d)),
    ("normalize", lambda e, d: P.normalize_text(e, d)),
    ("mock_embed4", lambda e, d: P.mock_embed(e, 4, d)),
    ("rx_count_vowels", lambda e, d: P.regexp_count_portable(e, "[aeiou]", d)),
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _canon(v):
    if isinstance(v, list):
        return [_canon(x) for x in v]
    if isinstance(v, float):
        return round(v, 12)
    return v


@given(text=TEXTS)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_fragments_bit_identical_across_engines(spark, duck, text):
    lit = "'" + text.replace("'", "''") + "'"
    sels_s = ", ".join(f"{fn(lit, 'spark')} AS c{i}" for i, (_, fn) in enumerate(FRAGMENTS))
    sels_d = ", ".join(f"{fn(lit, 'duck')} AS c{i}" for i, (_, fn) in enumerate(FRAGMENTS))
    srow = spark.sql(f"SELECT {sels_s}").collect()[0]
    drow = duck.sql(f"SELECT {sels_d}").fetchone()
    for i, (name, _) in enumerate(FRAGMENTS):
        assert _canon(srow[i]) == _canon(drow[i]), f"{name} diverged on {text!r}"


VEC = st.lists(
    st.floats(min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False,
              width=32),
    min_size=2, max_size=6,
)


@given(a=VEC, b=VEC)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_vector_fold_math_bit_identical(spark, duck, a, b):
    """dot / norm / euclidean folds evaluate LEFT-TO-RIGHT on both engines —
    the float-addition order is part of the contract, so results must be
    bit-identical, not approximately equal."""
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    # string->double casts on BOTH engines: DuckDB parses bare numeric
    # literals as DECIMAL first, and the decimal round-trip can land one ulp
    # off the correctly-rounded double parse (engine fragments always read
    # parquet doubles, so the literal path exists only in this test)
    al = "array(" + ", ".join(f"cast('{x!r}' as double)" for x in a) + ")"
    bl = "array(" + ", ".join(f"cast('{x!r}' as double)" for x in b) + ")"
    ald = "[" + ", ".join(f"'{x!r}'::DOUBLE" for x in a) + "]"
    bld = "[" + ", ".join(f"'{x!r}'::DOUBLE" for x in b) + "]"
    srow = spark.sql(
        f"SELECT {P.dot(al, bl, 'spark')} AS d, {P.norm2(al, 'spark')} AS n, "
        f"{P.l2sq(al, bl, 'spark')} AS e"
    ).collect()[0]
    drow = duck.sql(
        f"SELECT {P.dot(ald, bld, 'duck')} AS d, {P.norm2(ald, 'duck')} AS n, "
        f"{P.l2sq(ald, bld, 'duck')} AS e"
    ).fetchone()
    assert srow[0] == drow[0] and srow[1] == drow[1] and srow[2] == drow[2]


def test_ngrams_null_and_empty_text_parity(spark, duck):
    """NULL and empty text take word_ngrams' fallback branch — both engines
    must agree on [''] (the cross-engine fuzz only generates non-NULL
    strings, so NULL is pinned explicitly)."""
    for lit in ("CAST(NULL AS STRING)", "''", "'   '"):
        dlit = lit.replace("AS STRING", "AS VARCHAR")
        srow = spark.sql(f"SELECT {P.word_ngrams(lit, 3, 'spark')}").collect()[0][0]
        drow = duck.sql(f"SELECT {P.word_ngrams(dlit, 3, 'duck')}").fetchone()[0]
        assert srow == drow == [""], (lit, srow, drow)


@given(a=VEC)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_sign_pack_bit_identical(spark, duck, a):
    """sign_pack packs element signs into an int64 identically on both
    engines, including zeros (not positive -> bit clear) and negative
    floats; the packed word feeds binary_quant_topk's oracle so any drift
    is a correctness bug, not a tolerance issue."""
    n = len(a)
    al = "array(" + ", ".join(f"cast('{x!r}' as double)" for x in a) + ")"
    ald = "[" + ", ".join(f"'{x!r}'::DOUBLE" for x in a) + "]"
    s = spark.sql(f"SELECT {P.sign_pack(al, 1, n, 'spark')} AS w").collect()[0][0]
    d = duck.sql(f"SELECT {P.sign_pack(ald, 1, n, 'duck')} AS w").fetchone()[0]
    expected = sum(1 << j for j in range(n) if a[j] > 0)
    assert s == d == expected


@given(
    xs=st.lists(
        st.floats(min_value=-30.0, max_value=30.0, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=12,
    ),
    scale=st.sampled_from([2, 9, 11, 12]),
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_exact_sum_avg_bit_identical(spark, duck, xs, scale):
    """P.exact_sum / P.exact_avg must be BIT-identical across engines on
    arbitrary doubles — that is their entire reason to exist (the r10
    coreset merge-order incident). floor(x*s + 0.5) quantization is the
    engine-independent idiom; the BIGINT sum is exact; the one division is
    IEEE-deterministic. The literal string->double cast mirrors the other
    fold tests (engine fragments always read parquet doubles)."""
    vals_s = " UNION ALL ".join(
        f"SELECT cast('{x!r}' as double) AS x" for x in xs)
    vals_d = " UNION ALL ".join(f"SELECT '{x!r}'::DOUBLE AS x" for x in xs)
    srow = spark.sql(
        f"SELECT {P.exact_sum('x', 'spark', scale)} AS s, "
        f"{P.exact_avg('x', 'spark', scale)} AS a FROM ({vals_s})"
    ).collect()[0]
    drow = duck.sql(
        f"SELECT {P.exact_sum('x', 'duck', scale)} AS s, "
        f"{P.exact_avg('x', 'duck', scale)} AS a FROM ({vals_d})"
    ).fetchone()
    assert srow["s"] == drow[0], (xs, scale, srow["s"], drow[0])
    assert srow["a"] == drow[1], (xs, scale, srow["a"], drow[1])
    # and against a direct python model of the same quantization
    import math as m

    s = 10 ** scale
    units = [m.floor(x * float(s) + 0.5) for x in xs]
    assert srow["s"] == sum(units) / float(s)
    assert srow["a"] == sum(units) / (len(xs) * float(s))
