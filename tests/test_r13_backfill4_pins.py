"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 4: the mock-embedder surface (the FIXTURES.md §3 hash embedder that
every retrieval entry rests on — pinned per-value here), the retrieval
threshold/top-k shapes, deterministic MLM masking, the chunking round-trip
and fixed-stride splitter, the OLAP reshaping family (pivot, CUBE,
GROUPING SETS, hourly windows, RANGE frames), fingerprints, the global
epoch shuffle, leakage-safe grouped splits, and the per-group cap/top-k
pair. Planted boundaries: a score landing EXACTLY on the 0.55 threshold
(|v| = 10 exact via 1+49+49+1), an event EXACTLY one hour back (RANGE
inclusive), a doc of exactly chunk-size chars, case/whitespace-only
fingerprint twins, and an n_chars tie inside the per-lang top-3."""

import hashlib
import math
import re
from collections import Counter

import duckdb

EMBED_DIM = 64
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _toks(text: str):
    return [t for t in text.split(" ") if t]


def _seqdot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _cosd(a, b):
    den = math.sqrt(_seqdot(a, a)) * math.sqrt(_seqdot(b, b))
    return 1.0 - (_seqdot(a, b) / den if den != 0 else 0.0)


def _mock_embed(text: str, dim: int):
    return [(_h64(f"{text}:{i}") % 2000001) / 1000000.0 - 1.0
            for i in range(dim)]


def _mk_documents(con, rows):
    """rows: (doc_id, text, lang, source)."""
    vals = ", ".join(
        f"({did}, '{text}', '{lang}', '{src}', {len(text)})"
        for did, text, lang, src in rows
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, text, lang, source, n_chars)"
    )


def _mk_events(con, rows):
    """rows: (event_id, user_id, event_type, ts_us, value)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
        f"CAST({val} AS DOUBLE), '{{}}')"
        for eid, uid, et, ts, val in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def _mk_embeddings(con, vecs):
    """vecs: (vec_id, label, list[float])."""
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({vid}, [{', '.join(repr(float(x)) for x in v)}]::FLOAT[], {lbl})"
            for vid, lbl, v in vecs)
        + ") AS v(vec_id, embedding, label)"
    )


def test_mock_embed_dims_matches_hash_python():
    from oaim_sandbox_spark.queries_relational import mock_embed_dims

    rows = [(0, "alpha beta", "en", "s"), (7, "gamma", "en", "s"),
            (49, "delta words here", "en", "s"),
            (50, "excluded by doc_id', '<', '50", "en", "s")]
    # doc 50 text contains quote-ish noise only if escaped — keep it plain:
    rows[3] = (50, "excluded doc", "en", "s")
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(mock_embed_dims("duck")).fetchall()

    exp = []
    for did, text, _, _ in rows:
        if did < 50:
            for i, v in enumerate(_mock_embed(text, 8)):
                exp.append((did, i, _r6(v)))
    assert sorted(got) == sorted(exp)
    assert all(-1.0 <= r[2] <= 1.0 for r in got)
    assert len(got) == 24


def test_rag_topk_mock_query_matches_python():
    from oaim_sandbox_spark.queries_relational import rag_topk_mock_query

    texts = ["spark vector search engine", "cats and dogs", "quantum flux",
             "vector search", "irrelevant words entirely", "spark search",
             "alpha beta gamma", "database index scan"]
    rows = [(i + 1, t, "en", "s") for i, t in enumerate(texts)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(rag_topk_mock_query("duck")).fetchall()

    q = _mock_embed("spark vector search", EMBED_DIM)
    scored = sorted(
        ((did, _r6(_cosd(_mock_embed(t, EMBED_DIM), q)))
         for did, t, _, _ in rows),
        key=lambda r: (r[1], r[0]))
    assert [tuple(r) for r in got] == scored[:5]


def test_topk_score_threshold_matches_python():
    from oaim_sandbox_spark.queries_relational import topk_score_threshold

    # |v|^2 = 1+49+49+1 = 100 -> |v| = 10 EXACT, cos = 0.1, distance 0.9,
    # score EXACTLY 0.55 -> kept by >=. The orthogonal vector scores 0.5
    # (cut). 8 close vectors + the boundary = 9 qualifiers, inside the
    # LIMIT — the boundary vector is by construction the WORST qualifying
    # distance, so it can only appear when the threshold, not the limit,
    # is the binding cut.
    vecs = [(0, 0, [1.0, 0.0, 0.0, 0.0]),
            (1, 0, [1.0, 7.0, 7.0, 1.0]),      # boundary: score == 0.55
            (2, 0, [0.0, 1.0, 0.0, 0.0]),      # score 0.5 -> cut
            (3, 0, [-1.0, 0.0, 0.0, 0.0])]     # opposite -> cut
    vecs += [(10 + k, 0, [2.0 + k, 1.0, 0.0, 0.0]) for k in range(8)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(topk_score_threshold("duck")).fetchall()

    q = [1.0, 0.0, 0.0, 0.0]
    exp = []
    for vid, _, v in vecs:
        if vid == 0:
            continue
        dist = _r6(_cosd(v, q))
        score = _r6(1.0 - dist / 2.0)
        if score >= 0.55:
            exp.append((vid, dist, score))
    exp.sort(key=lambda r: (r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:10]
    assert len(got) == 9
    assert (1, 0.9, 0.55) in {tuple(r) for r in got}   # boundary kept
    assert all(r[0] != 2 for r in got)


def test_mlm_masking_matches_hash_python():
    from oaim_sandbox_spark.queries_training import mlm_masking_q

    rows = [(0, "the quick brown fox jumps over the lazy dog again", "en", "s"),
            (25, "one two three four five six seven eight nine ten", "en", "s"),
            (50, "alpha beta gamma delta epsilon zeta eta theta", "en", "s"),
            (13, "filtered out completely", "en", "s")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(mlm_masking_q("duck")).fetchall()

    exp = []
    for did, text, _, _ in rows:
        if did % 25 != 0:
            continue
        toks = _toks(text)
        masked = ["<mask>" if _h64(f"{did}:{i}") % 100 < 15 else t
                  for i, t in enumerate(toks)]
        exp.append((did, sum(1 for t in masked if t == "<mask>"),
                    " ".join(masked)))
    exp.sort()
    assert [tuple(r) for r in got] == exp
    assert all(r[0] % 25 == 0 for r in got)
    assert sum(r[1] for r in got) > 0              # some masks fired


def test_doc_fingerprints_matches_hash_python():
    from oaim_sandbox_spark.queries_textstats import doc_fingerprints_q

    rows = [(1, "Hello   World", "en", "s"),
            (2, "hello world", "en", "s"),        # same fingerprint as 1
            (3, "hello world!", "en", "s"),       # different
            (4, "  hello world  ", "en", "s")]    # trim -> same as 1/2
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(doc_fingerprints_q("duck")).fetchall()

    exp = {did: _h64(re.sub(r"\s+", " ", text.lower()).strip())
           for did, text, _, _ in rows}
    assert {r[0]: r[1] for r in got} == exp
    fp = {r[0]: r[1] for r in got}
    assert fp[1] == fp[2] == fp[4] != fp[3]


def test_chunk_reassembly_matches_python():
    from oaim_sandbox_spark.queries_textstats import chunk_reassembly

    rows = [(1, "a" * 200, "en", "s"),        # exactly one chunk
            (2, "b" * 201, "en", "s"),        # 2 chunks (1-char tail)
            (3, "c", "en", "s"),              # tiny
            (4, "d" * 400, "en", "s")]        # exactly two chunks
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(chunk_reassembly("duck")).fetchall()

    exp = [(did, max(1, math.ceil(len(text) / 200)), 1)
           for did, text, _, _ in sorted(rows)]
    assert [tuple(r) for r in got] == exp


def test_split_fixed_chunks_matches_python():
    from oaim_sandbox_spark.queries_relational import split_fixed_chunks

    rows = [(1, "x" * 150, "en", "s"),        # single chunk
            (2, "y" * 200, "en", "s"),        # starts 0 and 180 (20-char tail)
            (3, "z" * 181, "en", "s")]        # second chunk = 1 char
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(split_fixed_chunks("duck")).fetchall()

    size, stride = 200, 180
    exp = []
    for did, text, _, _ in sorted(rows):
        n = math.floor((len(text) - 1) / stride) + 1
        for k in range(n):
            start = k * stride
            exp.append((did, f"{did}_{k + 1}", start, text[start:start + size]))
    assert sorted(map(tuple, got)) == sorted(exp)
    by = {(r[0], r[2]): r[3] for r in got}
    assert len(by[(2, 180)]) == 20            # overlap tail
    assert len(by[(3, 180)]) == 1


def test_pivot_event_counts_matches_python():
    from oaim_sandbox_spark.queries_training import pivot_event_counts

    rows = [(1, 1, "click", 1_000_000, 0.0), (2, 1, "click", 2_000_000, 0.0),
            (3, 1, "view", 3_000_000, 0.0), (4, 2, "purchase", 4_000_000, 0.0),
            (5, 2, "signup", 5_000_000, 0.0), (6, 3, "error", 6_000_000, 0.0)]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(pivot_event_counts("duck")).fetchall()

    exp = []
    for uid in (1, 2, 3):
        c = Counter(et for _, u, et, _, _ in rows if u == uid)
        exp.append((uid, *[c.get(t, 0) for t in EVENT_TYPES]))
    assert [tuple(r) for r in got] == exp


def test_cube_doc_counts_matches_python():
    from oaim_sandbox_spark.queries_training import cube_doc_counts

    rows = [(1, "aaa", "en", "s0"), (2, "bbbb", "en", "s1"),
            (3, "ccccc", "de", "s0"), (4, "dd", "de", "s0")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(cube_doc_counts("duck")).fetchall()

    exp = []
    groups = [(0, 0), (0, 1), (1, 0), (1, 1)]
    for gl, gs in groups:
        cells = {}
        for _, text, lang, src in rows:
            key = (lang if gl == 0 else "(all)", src if gs == 0 else "(all)")
            c = cells.setdefault(key, [0, 0])
            c[0] += 1
            c[1] += len(text)
        for (lg, sc), (n, tot) in cells.items():
            exp.append((lg, sc, gl, gs, n, tot))
    exp.sort(key=lambda r: (r[2], r[3], r[0], r[1]))
    assert [tuple(r) for r in got] == exp
    assert ("(all)", "(all)", 1, 1, 4, 14) in {tuple(r) for r in got}


def test_grouping_sets_docs_matches_python():
    from oaim_sandbox_spark.queries_textstats import grouping_sets_docs

    rows = [(1, "aaa", "en", "s0"), (2, "bbbb", "en", "s1"),
            (3, "ccccc", "de", "s0")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(grouping_sets_docs("duck")).fetchall()

    exp = []
    sets = [(0, 0), (0, 1), (1, 0), (1, 1)]   # (g_source, g_lang)
    for gs, gl in sets:
        cells = {}
        for _, text, lang, src in rows:
            key = (src if gs == 0 else "ALL", lang if gl == 0 else "ALL")
            c = cells.setdefault(key, [0, 0])
            c[0] += 1
            c[1] += len(text)
        for (sc, lg), (n, tot) in cells.items():
            exp.append((sc, lg, gs, gl, n, tot))
    exp.sort(key=lambda r: (r[2], r[3], r[0], r[1]))
    assert [tuple(r) for r in got] == exp


def test_events_hourly_windows_matches_python():
    from oaim_sandbox_spark.queries_relational import events_hourly_windows

    h = 3_600_000_000
    rows = [(1, 1, "click", 10, 1.5), (2, 2, "click", h - 1, 2.25),
            (3, 1, "click", h, 4.0),          # lands in hour 1
            (4, 1, "view", 20, 8.0), (5, 1, "click", 30, 0.5)]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(events_hourly_windows("duck")).fetchall()

    agg = {}
    for _, uid, et, ts, val in rows:
        key = (ts // h, et)
        a = agg.setdefault(key, [0, set(), 0.0])
        a[0] += 1
        a[1].add(uid)
        a[2] += val
    exp = {(hh, et, n, len(us), sv) for (hh, et), (n, us, sv) in agg.items()}
    assert {tuple(r) for r in got} == exp
    assert (1, "click", 1, 1, 4.0) in exp          # boundary event in hour 1


def test_trailing_hour_stats_matches_python():
    from oaim_sandbox_spark.queries_extended import trailing_hour_stats

    h = 3_600_000_000
    # user 7 (kept by user_id % 7 == 0): events at 0, h (EXACTLY one hour
    # later -> the RANGE frame INCLUDES the t=0 event), 2h+1 (frame drops
    # t=h? no: 2h+1 - h = h+1 > h -> only itself). user 14 also kept;
    # user 3 dropped.
    rows = [(1, 7, "view", 0, 1.0), (2, 7, "view", h, 3.0),
            (3, 7, "view", 2 * h + 1, 5.0),
            (4, 14, "view", 50, 2.5), (5, 3, "view", 60, 9.0)]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(trailing_hour_stats("duck")).fetchall()

    kept = sorted((r for r in rows if r[1] % 7 == 0),
                  key=lambda r: (r[1], r[3], r[0]))
    exp = []
    for eid, uid, _, ts, _ in kept:
        frame = [r[4] for r in kept
                 if r[1] == uid and ts - h <= r[3] <= ts]
        exp.append((uid, eid, ts, len(frame), _r6(sum(frame) / len(frame))))
    assert [tuple(r) for r in got] == exp
    by_eid = {r[1]: r for r in got}
    assert by_eid[2][3] == 2                   # exactly-one-hour-back included
    assert by_eid[3][3] == 1                   # h+1 back excluded
    assert 5 not in by_eid


def test_global_shuffle_order_matches_hash_python():
    from oaim_sandbox_spark.queries_textstats import global_shuffle_order

    rows = [(i, "t", "en", "s") for i in range(1, 41)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(global_shuffle_order("duck")).fetchall()

    keyed = sorted(((_h64(f"{did}:epoch:42"), did) for did, _, _, _ in rows))
    exp = [(did, k, pos) for pos, (k, did) in enumerate(keyed[:20], 1)]
    assert [tuple(r) for r in got] == exp


def test_grouped_split_leakage_safe_matches_python():
    from oaim_sandbox_spark.queries_training import grouped_split_leakage_safe

    rows = [(i, "t", "en", f"src{i % 12}") for i in range(1, 61)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(grouped_split_leakage_safe("duck")).fetchall()

    assign = {f"src{k}": ("train" if _h64(f"src{k}-gsplit-v1") % 10 < 9
                          else "test") for k in range(12)}
    per_split = {}
    for did, _, _, src in rows:
        s = assign[src]
        a = per_split.setdefault(s, [0, set()])
        a[0] += 1
        a[1].add(src)
    exp = sorted((s, n, len(srcs), 0) for s, (n, srcs) in per_split.items())
    assert [tuple(r) for r in got] == exp
    assert all(r[3] == 0 for r in got)         # leakage violations zero
    assert sum(r[1] for r in got) == 60


def test_topk_docs_per_lang_matches_python():
    from oaim_sandbox_spark.queries_training import topk_docs_per_lang

    # 'en' has an n_chars TIE at the rank-3 boundary -> doc_id ASC wins.
    rows = [(1, "a" * 50, "en", "s"), (2, "b" * 40, "en", "s"),
            (3, "c" * 40, "en", "s"), (4, "d" * 40, "en", "s"),
            (5, "e" * 9, "de", "s"), (6, "f" * 8, "de", "s")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(topk_docs_per_lang("duck")).fetchall()

    exp = []
    for lang in ("de", "en"):
        docs = sorted((r for r in rows if r[2] == lang),
                      key=lambda r: (-len(r[1]), r[0]))
        for rn, (did, text, _, _) in enumerate(docs[:3], 1):
            exp.append((lang, did, len(text), rn))
    assert [tuple(r) for r in got] == exp
    en_ids = [r[1] for r in got if r[0] == "en"]
    assert en_ids == [1, 2, 3]                 # tie at 40 chars -> id ASC, 4 cut


def test_domain_caps_topn_matches_python():
    from oaim_sandbox_spark.queries_textstats import domain_caps_topn

    rows = ([(i, "x" * (100 - i), "en", "big") for i in range(1, 9)]
            + [(20, "y" * 30, "en", "small")])
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(domain_caps_topn("duck")).fetchall()

    exp = []
    for src in ("big", "small"):
        n = sum(1 for r in rows if r[3] == src)
        exp.append((src, n, min(n, 5), max(0, n - 5)))
    assert [tuple(r) for r in got] == exp
    assert dict((r[0], r[3]) for r in got)["big"] == 3
