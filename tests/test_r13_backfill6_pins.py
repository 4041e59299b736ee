"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 6: the remaining ANN tier family — exact full-probe, single-bucket
LSH, Hamming-1 multi-probe LSH, the matryoshka prefix funnel (with a
planted prefix-misleading vector the 16-dim stage must misrank and the
full-dim re-rank must repair), and the complete PQ-ADC pipeline (codebook
sampling, argmin assignment, LUT, additive sub-distance, exact re-rank) —
plus the cross-encoder re-rank stage, the sha256 ingest/dedup composite,
and the two stream-shaped join oracles (stream-static enrich,
stream-stream interval join)."""

import hashlib
import math
from collections import Counter

import duckdb

EMBED_DIM = 64
MATRYOSHKA_DIM = 16
PQ_M, PQ_SUB, PQ_K = 4, 16, 16
N_PLANES = 6


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _seqdot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _cosd(a, b):
    den = math.sqrt(_seqdot(a, a)) * math.sqrt(_seqdot(b, b))
    return 1.0 - (_seqdot(a, b) / den if den != 0 else 0.0)


def _l2sq(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += (x - y) * (x - y)
    return s


def _mock_embed(text: str, dim: int):
    return [(_h64(f"{text}:{i}") % 2000001) / 1000000.0 - 1.0
            for i in range(dim)]


_PLANES = [[(_h64(f"lshplane:{h}:{j}") % 2000001) / 1000000.0 - 1.0
            for j in range(EMBED_DIM)] for h in range(N_PLANES)]


def _bucket(v):
    b = 0
    for h in range(N_PLANES):
        if _seqdot(v, _PLANES[h]) > 0:
            b += 1 << h
    return b


def _mk_documents(con, rows):
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
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({vid}, [{', '.join(repr(float(x)) for x in v)}]::FLOAT[], {lbl})"
            for vid, lbl, v in vecs)
        + ") AS v(vec_id, embedding, label)"
    )


def _grid_vec(i):
    """Deterministic 64-dim vector with binary-exact components in
    {-0.75, -0.5, ..., 1.0} — FLOAT[] storage is lossless."""
    return [((i * 13 + j * 7) % 8) / 4.0 - 0.75 for j in range(EMBED_DIM)]


def test_ivf_full_probe_topk_matches_python():
    from oaim_sandbox_spark.queries_textstats import ivf_full_probe_topk

    vecs = [(i, 0, _grid_vec(i)) for i in range(0, 30)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(ivf_full_probe_topk("duck")).fetchall()

    q = _grid_vec(0)
    exp = sorted(((vid, _r6(_cosd(v, q))) for vid, _, v in vecs if vid != 0),
                 key=lambda r: (r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:10]


def test_lsh_ann_topk_matches_python():
    from oaim_sandbox_spark.queries_relational import lsh_ann_topk

    vecs = [(i, 0, _grid_vec(i)) for i in range(0, 60)]
    vecs.append((191, 0, _grid_vec(191)))          # second query
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(lsh_ann_topk("duck")).fetchall()

    exp = []
    for qid, _, qv in vecs:
        if qid % 191 != 0:
            continue
        qb = _bucket(qv)
        cands = sorted(((_r6(_cosd(v, qv)), vid) for vid, _, v in vecs
                        if vid != qid and _bucket(v) == qb),
                       key=lambda r: (r[0], r[1]))
        for rk, (dist, vid) in enumerate(cands[:3], 1):
            exp.append((qid, vid, rk, dist))
    assert sorted(map(tuple, got)) == sorted(exp)
    assert len(exp) > 0                          # buckets actually matched


def test_lsh_multiprobe_topk_matches_python():
    from oaim_sandbox_spark.queries_relational import lsh_multiprobe_topk

    vecs = [(i, 0, _grid_vec(i)) for i in range(0, 60)]
    vecs.append((191, 0, _grid_vec(191)))
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(lsh_multiprobe_topk("duck")).fetchall()

    single = {}
    exp = []
    for qid, _, qv in vecs:
        if qid % 191 != 0:
            continue
        qb = _bucket(qv)
        probes = {qb} | {qb ^ (1 << i) for i in range(N_PLANES)}
        cands = sorted(((_r6(_cosd(v, qv)), vid) for vid, _, v in vecs
                        if vid != qid and _bucket(v) in probes),
                       key=lambda r: (r[0], r[1]))
        single[qid] = sum(1 for vid, _, v in vecs
                          if vid != qid and _bucket(v) == qb)
        for rk, (dist, vid) in enumerate(cands[:3], 1):
            exp.append((qid, vid, rk, dist))
    assert sorted(map(tuple, got)) == sorted(exp)
    # multiprobe recall property: candidate pool strictly grows vs exact-bucket
    n_multi = Counter(r[0] for r in got)
    assert all(n_multi[q] >= min(3, single[q]) for q in single)


def test_matryoshka_topk_matches_python():
    from oaim_sandbox_spark.queries_training import matryoshka_topk_q

    # 60 store vectors -> the stage-1 LIMIT 50 actually cuts. Vector 999 is
    # the PLANT: its 16-dim prefix matches the query exactly (stage-1 dist
    # ~0) but its tail is opposite — the full-dim re-rank must demote it.
    vecs = [(i, 0, _grid_vec(i)) for i in range(0, 60)]
    q = _grid_vec(0)
    liar = q[:MATRYOSHKA_DIM] + [-x for x in q[MATRYOSHKA_DIM:]]
    vecs.append((999, 0, liar))
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(matryoshka_topk_q("duck")).fetchall()

    def stage1(v):
        return _r6(_cosd(v[:MATRYOSHKA_DIM], q[:MATRYOSHKA_DIM]))

    cand = sorted(((stage1(v), vid, v) for vid, _, v in vecs if vid != 0),
                  key=lambda r: (r[0], r[1]))[:50]
    exp = sorted(((vid, _r6(_cosd(v, q)), s1) for s1, vid, v in cand),
                 key=lambda r: (r[1], r[0]))[:10]
    assert [tuple(r) for r in got] == exp
    liar_row = next((r for r in got if r[0] == 999), None)
    if liar_row is not None:                   # plant survived to stage 2...
        assert liar_row[1] > liar_row[2]       # ...but full dist >> prefix dist


def test_pq_adc_topk_matches_python():
    from oaim_sandbox_spark.queries_training import pq_adc_topk

    vecs = [(i, 0, _grid_vec(i)) for i in range(0, 24)]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(pq_adc_topk("duck")).fetchall()

    q = _grid_vec(0)
    store = {vid: v for vid, _, v in vecs if vid != 0}

    def sub(v, s):
        return v[s * PQ_SUB:(s + 1) * PQ_SUB]

    # codebook: codeword cid of subspace s = subvector of vec_id cid+1
    cb = {(s, vid - 1): sub(store[vid], s)
          for vid in range(1, PQ_K + 1) for s in range(PQ_M)}
    codes = {}
    for vid, v in store.items():
        for s in range(PQ_M):
            best = min(((_l2sq(sub(v, s), cb[(s, c)]), c)
                        for c in range(PQ_K)))
            codes[(vid, s)] = best[1]
    lut = {(s, c): _l2sq(sub(q, s), cb[(s, c)])
           for s in range(PQ_M) for c in range(PQ_K)}
    adc = {vid: sum(lut[(s, codes[(vid, s)])] for s in range(PQ_M))
           for vid in store}
    cand = sorted(store, key=lambda vid: (adc[vid], vid))[:50]
    exp = sorted(((vid, _r6(math.sqrt(_l2sq(store[vid], q))),
                   _r6(math.sqrt(adc[vid]))) for vid in cand),
                 key=lambda r: (r[1], r[0]))[:10]
    assert [tuple(r) for r in got] == exp
    # codebook members quantize to themselves: ADC == exact for vec 1
    by_vid = {r[0]: r for r in got}
    if 1 in by_vid:
        assert by_vid[1][1] == by_vid[1][2]


def test_rerank_crossencoder_topk_matches_python():
    from oaim_sandbox_spark.queries_textstats import rerank_crossencoder_topk

    texts = ["spark vector search", "vector search engine", "cats and dogs",
             "query planner", "index scan", "spark sql", "alpha beta",
             "gamma delta", "another document", "yet more text"]
    rows = [(i + 1, t, "en", "s") for i, t in enumerate(texts)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(rerank_crossencoder_topk("duck")).fetchall()

    qtext = "spark vector search"
    qv = _mock_embed(qtext, EMBED_DIM)
    cands = sorted(((_r6(_cosd(_mock_embed(t, EMBED_DIM), qv)), did, t)
                    for did, t, _, _ in rows), key=lambda r: (r[0], r[1]))[:20]

    def ce(t):
        return (_h64(f"{qtext}\x1f{t}") % 1000000) / 1000000.0

    ranked = sorted(cands, key=lambda r: (-ce(r[2]), r[1]))
    exp = [(did, dist, _r6(ce(t)), rk)
           for rk, (dist, did, t) in enumerate(ranked[:5], 1)]
    assert [tuple(r) for r in got] == exp


def test_ingest_chunks_dedup_matches_sha_python():
    from oaim_sandbox_spark.queries_relational import ingest_chunks_dedup

    # docs 1 and 2 are IDENTICAL 380-char texts -> every chunk duplicated;
    # doc 3 shares nothing.
    body = ("x" * 180) + ("y" * 200)
    rows = [(1, body, "en", "s"), (2, body, "en", "s"),
            (3, "z" * 150, "en", "s")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(ingest_chunks_dedup("duck")).fetchall()

    size, stride = 200, 180
    chunks = []
    for did, text, _, _ in rows:
        n = math.floor((len(text) - 1) / stride) + 1
        for k in range(n):
            start = k * stride
            chunk = text[start:start + size]
            chunks.append((hashlib.sha256(chunk.encode()).hexdigest(),
                           did * 1000000 + start))
    agg = {}
    for cid, slot in chunks:
        a = agg.setdefault(cid, [slot, 0])
        a[0] = min(a[0], slot)
        a[1] += 1
    exp = {(cid, slot, n) for cid, (slot, n) in agg.items()}
    assert {tuple(r) for r in got} == exp
    dup = [r for r in got if r[2] == 2]
    assert len(dup) == 3                      # all three twin-doc chunks (0/180/360)
    assert all(r[1] < 2000000 for r in dup)   # first-wins slot = doc 1


def test_streaming_enrich_nation_oracle_matches_python():
    from oaim_sandbox_spark.queries_training import streaming_enrich_nation

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE customer AS SELECT * FROM (VALUES "
        "(1, 10), (2, 10), (3, 20), (4, 30)) AS v(c_custkey, c_nationkey)")
    rows = [(1, 1, "click", 1_000_000, 1.5), (2, 2, "view", 2_000_000, 2.25),
            (3, 3, "click", 3_000_000, 4.0), (4, 9, "view", 4_000_000, 99.0)]
    _mk_events(con, rows)
    got = con.execute(streaming_enrich_nation("duck")).fetchall()

    nat = {1: 10, 2: 10, 3: 20, 4: 30}
    agg = {}
    for _, uid, _, _, val in rows:
        if uid in nat:
            a = agg.setdefault(nat[uid], [0, 0.0])
            a[0] += 1
            a[1] += val
    exp = sorted((nk, n, sv) for nk, (n, sv) in agg.items())
    assert [tuple(r) for r in got] == exp
    assert all(r[0] != 9 for r in got)        # unmatched user drops (inner)


def test_streaming_click_error_join_oracle_matches_python():
    from oaim_sandbox_spark.queries_training import streaming_click_error_join

    m5 = 300_000_000
    rows = [(1, 1, "error", 1_000_000, 0.0),
            (2, 1, "click", 1_000_000 + m5, 0.0),     # boundary kept
            (3, 1, "click", 1_000_000 + m5 + 1, 0.0), # past -> cut
            (4, 1, "click", 500_000, 0.0),            # before -> cut
            (5, 2, "error", 2_000_000, 0.0),
            (6, 2, "click", 2_100_000, 0.0),
            (7, 2, "click", 2_200_000, 0.0)]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(streaming_click_error_join("duck")).fetchall()

    exp = []
    for eid, euid, et, ets, _ in rows:
        if et != "error":
            continue
        for cid, cuid, ct, cts, _ in rows:
            if ct == "click" and cuid == euid and ets < cts <= ets + m5:
                exp.append((euid, eid, cid))
    exp.sort()
    assert [tuple(r) for r in got] == exp
    assert (1, 1, 2) in exp and len([r for r in exp if r[0] == 2]) == 2
