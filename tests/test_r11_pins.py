"""Independent naive-Python pins for the round-11 oracle entries.

The DuckDB oracle certifies Spark-vs-DuckDB agreement on the SAME SQL
template — a wrong query certifies green on both engines (the r10
sweepline/Gopher incidents). Each new entry therefore also gets a direct
Python recomputation here, in the tests/test_extended_queries.py style."""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _mk_docs(con, docs):
    vals = ", ".join(
        f"({i}, 'src{s}', '{' '.join(words)}', 'en', {len(' '.join(words))})"
        for i, (s, words) in enumerate(docs)
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, source, text, lang, n_chars)"
    )


def _mk_events(con, rows):
    """rows: (event_id, user_id, event_type, ts_us)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', 0.5, '{{}}')"
        for eid, uid, et, ts in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def _mk_embeddings(con, vecs):
    """vecs: (vec_id, label, [floats])."""
    vals = ", ".join(
        f"({vid}, [{', '.join(repr(float(x)) for x in v)}]::FLOAT[], {lab})"
        for vid, lab, v in vecs
    )
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + vals + ") AS v(vec_id, embedding, label)"
    )


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 2),
                  st.lists(st.sampled_from("abcd"), min_size=1, max_size=12)),
        min_size=2, max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_distinct_ngram_diversity_matches_direct_python(docs):
    """d2/d3 equal the direct distinct/total n-gram ratios with docs
    shorter than n excluded from the n branch."""
    from oaim_sandbox_spark.queries_extended import distinct_ngram_diversity

    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: r[1:] for r in
           con.execute(distinct_ngram_diversity("duck")).fetchall()}
    per = {}
    for s, words in docs:
        per.setdefault(f"src{s}", []).append(words)
    for src, ds in per.items():
        g2 = [" ".join(w[i:i + 2]) for w in ds if len(w) >= 2
              for i in range(len(w) - 1)]
        g3 = [" ".join(w[i:i + 3]) for w in ds if len(w) >= 3
              for i in range(len(w) - 2)]
        n2, u2, n3, u3 = len(g2), len(set(g2)), len(g3), len(set(g3))
        if n2 == 0:
            assert src not in got  # a2 drops sources with no bigram docs
            continue
        r = got[src]
        assert (r[0], r[1], r[3], r[4]) == (n2, u2, n3, u3), (src, r)
        assert abs(r[2] - u2 / n2) < 2e-6
        if n3:
            assert abs(r[5] - u3 / n3) < 2e-6
        else:
            assert r[5] is None


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 2),
                  st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12)),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_hapax_ttr_matches_direct_python(docs):
    from collections import Counter

    from oaim_sandbox_spark.queries_extended import hapax_ttr_by_source

    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {r[0]: r[1:] for r in con.execute(hapax_ttr_by_source("duck")).fetchall()}
    per = {}
    for s, words in docs:
        per.setdefault(f"src{s}", []).extend(words)
    for src, toks in per.items():
        c = Counter(toks)
        total, vocab = len(toks), len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        r = got[src]
        assert (r[0], r[1], r[2]) == (total, vocab, hapax), (src, r)
        assert abs(r[3] - vocab / total) < 2e-6
        assert abs(r[4] - hapax / vocab) < 2e-6


def test_doc_length_tail_index_matches_direct_python():
    """Hill alpha over a hand-built Pareto-ish length ladder: k adapts to
    n-1 below 100 docs, reference is the (k+1)-th largest, and an
    all-equal source yields NULL alpha."""
    from oaim_sandbox_spark.queries_extended import doc_length_tail_index

    # src0: lengths 160, 80, 40, 20, 10 (exact powers; alpha known)
    # src1: all-equal lengths -> sum ln = 0 -> NULL alpha
    # src2: single doc -> kk = 1, no rnk < kk rows -> no output row
    docs, did = [], 0
    for ln in (160, 80, 40, 20, 10):
        docs.append((did, 0, "x" * ln)); did += 1
    for _ in range(3):
        docs.append((did, 1, "y" * 7)); did += 1
    docs.append((did, 2, "z" * 9)); did += 1
    con = duckdb.connect()
    vals = ", ".join(f"({i}, 'src{s}', '{t}', 'en', {len(t)})" for i, s, t in docs)
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " + vals +
                ") AS v(doc_id, source, text, lang, n_chars)")
    got = {r[0]: r[1:] for r in con.execute(doc_length_tail_index("duck")).fetchall()}
    s = sum(math.log(x / 10.0) for x in (160, 80, 40, 20))
    assert got["src0"][0] == 4 and got["src0"][1] == 10
    assert abs(got["src0"][2] - 4 / s) < 2e-6
    assert got["src1"][0] == 2 and got["src1"][2] is None
    assert "src2" not in got


def test_int8_saturation_matches_numpy():
    import numpy as np

    from oaim_sandbox_spark.queries_core import EMBED_DIM
    from oaim_sandbox_spark.queries_extended import int8_saturation_profile

    rng = np.random.RandomState(7)
    vecs = [(i, i % 2, rng.randn(EMBED_DIM).astype("float32")) for i in range(12)]
    con = duckdb.connect()
    _mk_embeddings(con, [(i, l, list(v)) for i, l, v in vecs])
    got = {r[0]: r[1:] for r in con.execute(int8_saturation_profile("duck")).fetchall()}
    for lab in (0, 1):
        qs = []
        for _, l, v in vecs:
            if l != lab:
                continue
            x = np.asarray(v, dtype="float64")
            s = max(np.abs(x).max(), 1e-30)
            qs.extend(abs(int(math.floor(xi / s * 127.0 + 0.5))) for xi in x)
        n, sat = len(qs), sum(1 for q in qs if q >= 127)
        r = got[lab]
        assert (r[0], r[1]) == (n, sat), (lab, r)
        assert abs(r[2] - sat / n) < 2e-6
        assert abs(r[3] - sum(qs) / (127.0 * n)) < 2e-6


def test_embedding_effective_rank_matches_numpy():
    """Participation ratio (tr C)^2 / tr(C^2) against numpy's covariance
    (population normalization), on anisotropic data so the rank is
    non-trivial: dim 0 dominates -> effective rank well below dim."""
    import numpy as np

    from oaim_sandbox_spark.queries_core import EMBED_DIM
    from oaim_sandbox_spark.queries_extended import embedding_effective_rank

    rng = np.random.RandomState(11)
    d = EMBED_DIM
    n = 30
    x = rng.randn(n, d) * 0.05
    x[:, 0] += rng.randn(n) * 0.9  # dominant dimension
    vecs = [(i, 0, x[i]) for i in range(n)]
    con = duckdb.connect()
    _mk_embeddings(con, [(i, l, list(v)) for i, l, v in vecs])
    (lab, nv, trace, eff) = con.execute(embedding_effective_rank("duck")).fetchone()
    # mirror the template's 1e-9 moment grid (floor(x+0.5) quantization,
    # the engine-independent idiom) before covariance
    xf = np.asarray([[float(np.float32(v)) for v in row] for row in x])
    m1 = np.floor(xf * 1e9 + 0.5).sum(axis=0) / (n * 1e9)
    m2 = np.floor(np.einsum("ni,nj->nij", xf, xf) * 1e9 + 0.5).sum(axis=0) / (n * 1e9)
    cov = m2 - np.outer(m1, m1)
    trc, trc2 = np.trace(cov), (cov * cov).sum()
    assert (lab, nv) == (0, n)
    assert abs(trace - trc) < 2e-5
    assert abs(eff - trc * trc / trc2) < 2e-4
    assert 1.0 <= eff < d / 4  # the planted anisotropy keeps rank low


def test_vocab_turnover_matches_direct_python():
    from collections import Counter

    from oaim_sandbox_spark.queries_extended import vocab_turnover_by_decile

    # 20 docs -> deciles of 2 docs each; shift vocabulary mid-stream
    docs = []
    for i in range(20):
        words = (["alpha", "beta", "gamma"] if i < 10 else
                 ["delta", "beta", "epsilon"]) * (i % 3 + 1)
        docs.append((0, words))
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {(r[0], r[1]): r[2:] for r in
           con.execute(vocab_turnover_by_decile("duck")).fetchall()}
    n = len(docs)
    buckets = {}
    for i, (_, words) in enumerate(docs):
        dec = min(1 + (i * 10) // n, 10)
        buckets.setdefault(dec, Counter()).update(words)
    tops = {
        dec: {t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]}
        for dec, c in buckets.items()
    }
    for dec in range(1, 10):
        a, b = tops[dec], tops[dec + 1]
        inter = len(a & b)
        r = got[(dec, dec + 1)]
        assert (r[0], r[1], r[2]) == (len(a), len(b), inter), (dec, r)
        assert abs(r[3] - inter / (len(a) + len(b) - inter)) < 2e-6


def test_stylometry_delta_matches_direct_python():
    from collections import Counter

    from oaim_sandbox_spark.queries_extended import source_stylometry_delta

    docs = [
        (0, ["the", "a", "of", "cat", "the"]),
        (0, ["the", "dog", "a", "a"]),
        (1, ["of", "of", "of", "the", "bird"]),
        (1, ["a", "bird", "bird"]),
        (2, ["cat", "dog", "bird", "the", "of", "a"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    got = {(r[0], r[1]): (r[2], r[3]) for r in
           con.execute(source_stylometry_delta("duck")).fetchall()}
    toks = {}
    for s, words in docs:
        toks.setdefault(f"src{s}", []).extend(words)
    allc = Counter(w for ws in toks.values() for w in ws)
    top = [t for t, _ in sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:50]]
    sources = sorted(toks)
    rates = {s: {w: Counter(toks[s])[w] / len(toks[s]) for w in top} for s in sources}
    z = {}
    kept = []
    for w in top:
        vals = [rates[s][w] for s in sources]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(max(sum(v * v for v in vals) / len(vals) - mu * mu, 0.0))
        if sd > 0:
            kept.append(w)
            for s in sources:
                z[(s, w)] = (rates[s][w] - mu) / sd
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            delta = sum(abs(z[(a, w)] - z[(b, w)]) for w in kept) / len(kept)
            nw, gd = got[(a, b)]
            assert nw == len(kept), (a, b, nw, len(kept))
            assert abs(gd - delta) < 2e-5, (a, b, gd, delta)


def test_markov_drift_matches_direct_python():
    from collections import Counter

    from oaim_sandbox_spark.queries_extended import markov_drift_halves

    # user 1: A A B A | (midpoint) | B B A B ; user 2 interleaved
    rows = [
        (1, 1, "A", 0), (2, 1, "A", 10_000_000), (3, 1, "B", 20_000_000),
        (4, 1, "A", 30_000_000), (5, 1, "B", 70_000_000), (6, 1, "B", 80_000_000),
        (7, 1, "A", 90_000_000), (8, 1, "B", 100_000_000),
        (9, 2, "A", 5_000_000), (10, 2, "B", 95_000_000),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = {r[0]: r[1:] for r in con.execute(markov_drift_halves("duck")).fetchall()}
    lo = min(r[3] for r in rows)
    hi = max(r[3] for r in rows)
    per_user = {}
    for eid, uid, et, ts in sorted(rows, key=lambda r: (r[1], r[3], r[0])):
        per_user.setdefault(uid, []).append((et, ts))
    trans = {1: Counter(), 2: Counter()}
    for seq in per_user.values():
        for (a, ts), (b, _) in zip(seq, seq[1:]):
            half = 1 if ts * 2 <= lo + hi else 2
            trans[half][(a, b)] += 1
    states = sorted({a for h in trans.values() for (a, _) in h} &
                    {a for (a, _) in trans[1]} & {a for (a, _) in trans[2]})
    for a in states:
        t1 = sum(c for (x, _), c in trans[1].items() if x == a)
        t2 = sum(c for (x, _), c in trans[2].items() if x == a)
        bs = {b for h in (1, 2) for (x, b) in trans[h] if x == a}
        drift = sum(abs(trans[1][(a, b)] / t1 - trans[2][(a, b)] / t2) for b in bs)
        r = got[a]
        assert (r[0], r[1]) == (t1, t2), (a, r)
        assert abs(r[2] - drift) < 2e-6, (a, r, drift)


def test_dup_rate_by_length_pins_bucketing():
    """Exact duplicates share every band, so the pair counts and the
    min-length bucket assignment are fully predictable; the unique fillers
    produce no candidate pairs on this fixed corpus (deterministic
    hashing — recorded once, stable forever)."""
    from oaim_sandbox_spark.queries_extended import dup_rate_by_length

    dup_short = "aa bb cc dd ee ff gg hh"                      # bucket 1
    dup_long = " ".join(f"w{i}" for i in range(40))            # bucket 4
    filler = [" ".join(f"u{i}k{j}" for i in range(12)) for j in range(4)]
    texts = [dup_short, dup_short, dup_long, dup_long, dup_long] + filler
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, 'src0', '{t}', 'en', {len(t)})" for i, t in enumerate(texts)
    )
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " + vals +
                ") AS v(doc_id, source, text, lang, n_chars)")
    got = {r[0]: r[1:] for r in con.execute(dup_rate_by_length("duck")).fetchall()}
    lens = [len(t) for t in texts]
    lo, hi = min(lens), max(lens)
    bucket = lambda v: min(1 + ((v - lo) * 4) // (hi - lo + 1), 4)  # noqa: E731
    ndocs = {b: sum(1 for v in lens if bucket(v) == b) for b in set(map(bucket, lens))}
    b_short, b_long = bucket(len(dup_short)), bucket(len(dup_long))
    assert b_short == 1 and b_long == 4
    expect_pairs = {b_short: 1, b_long: 3}  # C(2,2)=1, C(3,2)=3
    for b, nd in ndocs.items():
        r = got[b]
        assert r[0] == nd, (b, r)
        assert r[1] == expect_pairs.get(b, 0), (b, r)
        assert abs(r[2] - expect_pairs.get(b, 0) / nd) < 2e-6


def test_stylometry_excludes_constant_rate_words_exactly():
    """r11 regression pin: a word whose rate is IDENTICAL across all
    sources must be excluded by the exact MIN<MAX variance test — the
    grid-rounded sd is rounding noise there and sd>0 alone would inject
    junk z half the time (the heaps-pin fragility class)."""
    from oaim_sandbox_spark.queries_extended import source_stylometry_delta

    # 'same' appears exactly once per 4 tokens in BOTH sources (rate 1/4);
    # the other words differ
    docs = [
        (0, ["same", "aa", "aa", "bb"]),
        (1, ["same", "bb", "bb", "cc"]),
    ]
    con = duckdb.connect()
    _mk_docs(con, docs)
    rows = con.execute(source_stylometry_delta("duck")).fetchall()
    assert len(rows) == 1
    (a, b, n_words, delta) = rows[0]
    # 'same' (constant rate) excluded; aa/bb/cc all vary -> 3 words
    assert n_words == 3, rows
    assert delta is not None and delta > 0


def test_order_to_ship_latency_matches_direct_python():
    """Interpolated percentiles of integer day deltas against a direct
    numpy-free implementation of the shared linear-interpolation rule
    (quantile_cont / Spark percentile both use pos = q*(n-1))."""
    from oaim_sandbox_spark.queries_extended import order_to_ship_latency

    con = duckdb.connect()
    con.execute("CREATE TABLE nation AS SELECT * FROM (VALUES "
                "(0, 'ALPHA', 0), (1, 'BETA', 1)) v(n_nationkey, n_name, n_regionkey)")
    con.execute("CREATE TABLE customer AS SELECT * FROM (VALUES "
                "(1, 'c1', 0, 0.0, 'm'), (2, 'c2', 1, 0.0, 'm')"
                ") v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)")
    day = 86400_000_000
    # orders on day 0; customers 1/2 split the lineitems across nations
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                "(10, 1, 'O', 1.0, make_timestamp(0), 'p'),"
                "(11, 2, 'O', 1.0, make_timestamp(0), 'p')"
                ") v(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)")
    lats_a, lats_b = [1, 3, 5, 100], [2, 4]
    rows = [f"(10, 1, 1, {i}, 1.0, 1.0, 0.0, 0.0, 'N', 'O', make_timestamp({d * day}))"
            for i, d in enumerate(lats_a)]
    rows += [f"(11, 1, 1, {i}, 1.0, 1.0, 0.0, 0.0, 'N', 'O', make_timestamp({d * day}))"
             for i, d in enumerate(lats_b)]
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES " + ", ".join(rows) +
                ") v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
                "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)")
    got = {r[0]: r[1:] for r in con.execute(order_to_ship_latency("duck")).fetchall()}

    def interp(vals, q):
        vals = sorted(vals)
        pos = q * (len(vals) - 1)
        lo = int(math.floor(pos))
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (pos - lo) * (vals[hi] - vals[lo])

    for nat, lats in (("ALPHA", lats_a), ("BETA", lats_b)):
        r = got[nat]
        assert r[0] == len(lats)
        for col, q in ((1, 0.5), (2, 0.9), (3, 0.99)):
            assert abs(r[col] - interp(lats, q)) < 2e-6, (nat, q, r[col], interp(lats, q))
        assert r[4] == max(lats)


def test_approx_ngram_diversity_tracks_exact(spark):
    """The registered HLL scale path agrees with the certified exact twin:
    every source's within_bound audit holds and the approx diversity
    ratios track the exact entry's d2/d3 within the sketch envelope."""
    from oaim_sandbox_spark.queries_registry import NON_ORACLE
    from oaim_sandbox_spark.queries_extended import distinct_ngram_diversity
    from oaim_sandbox_spark.queries_core import register_views

    sf_dir = "/root/testdata/sf0.001"
    approx = {r["source"]: r for r in
              NON_ORACLE["approx_ngram_diversity"](spark, sf_dir).collect()}
    register_views(spark, sf_dir)
    exact = {r["source"]: r for r in
             spark.sql(distinct_ngram_diversity("spark")).collect()}
    assert set(approx) == set(exact)
    for src, a in approx.items():
        e = exact[src]
        assert a["within_bound"], (src, a)
        assert (a["n2"], a["n3"]) == (e["n_bigrams"], e["n_trigrams"]), src
        assert abs(a["approx_d2"] - e["d2"]) <= 0.07 * max(e["d2"], 0.01), src
        if e["d3"] is not None:
            assert abs(a["approx_d3"] - e["d3"]) <= 0.07 * max(e["d3"], 0.01), src
