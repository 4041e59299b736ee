"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 11 — the last dedup composites: the minhash machinery (word-3-gram
shingles -> mod-P hashes -> 16 md5-constant permutations -> 4x4 banding)
re-derived from scratch and driven through (a) the METHOD-AGREEMENT audit
(minhash strong pairs vs simhash near pairs, full-outer pair join, per-
source Jaccard), (b) the INCREMENTAL ingest probe (new x existing band
join only — the planted identical new/new pair must NOT appear), and
(c) SemDeDup (fixed lowest-id centroids, argmax-cosine assignment,
intra-cluster prune, lowest-id-wins) with a planted cross-cluster
near-identical pair the clustering must REFUSE to prune (the method's
known blind spot, asserted as semantics, not accident)."""

import hashlib
import math
from collections import Counter

import duckdb

MOD = 1_000_000_007
NUM_PERM, BANDS, NGRAM = 16, 4, 3
SIMHASH_BITS, SIMHASH_BANDS, MAX_HAMMING = 60, 4, 20
SLICE = SIMHASH_BITS // SIMHASH_BANDS
SEMDEDUP_K, SEMDEDUP_SIM = 8, 0.35


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _perm(i: int):
    ha = _h64(f"minhash:a:{i}")
    hb = _h64(f"minhash:b:{i}")
    return (ha % (MOD - 1)) + 1, hb % MOD


PERMS = [_perm(i) for i in range(NUM_PERM)]


def _toks(text: str):
    return [t for t in text.split(" ") if t]


def _word_ngrams(text: str, n: int):
    toks = _toks(text)
    if len(toks) >= n:
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)]


def _sig(text: str):
    hs = [_h64(g) % MOD for g in _word_ngrams(text, NGRAM)]
    return [min((a * h + b) % MOD for h in hs) for a, b in PERMS]


def _bands(sig):
    rows = NUM_PERM // BANDS
    return [_h64(",".join(str(x) for x in sig[b * rows:(b + 1) * rows]))
            for b in range(BANDS)]


def _mh_pairs(sigs: dict):
    out = {}
    ids = sorted(sigs)
    bands = {i: _bands(sigs[i]) for i in ids}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if any(x == y for x, y in zip(bands[a], bands[b])):
                agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
                out[(a, b)] = _r6(agree / float(NUM_PERM))
    return out


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _simhash(text: str) -> int:
    w = Counter(_toks(text))
    votes = [0] * SIMHASH_BITS
    for tok, c in w.items():
        h = _h64(tok)
        for j in range(SIMHASH_BITS):
            votes[j] += c if (h >> j) & 1 else -c
    fp = 0
    for j in range(SIMHASH_BITS):
        if votes[j] > 0:
            fp += 1 << j
    return fp


def _sh_pairs(fps: dict) -> set:
    out = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            share = any(((fps[a] >> (k * SLICE)) % (1 << SLICE))
                        == ((fps[b] >> (k * SLICE)) % (1 << SLICE))
                        for k in range(SIMHASH_BANDS))
            if share and bin(fps[a] ^ fps[b]).count("1") <= MAX_HAMMING:
                out.add((a, b))
    return out


def _mk_documents(con, rows):
    vals = ", ".join(
        f"({did}, '{text}', '{lang}', '{src}', {len(text)})"
        for did, text, lang, src in rows
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, text, lang, source, n_chars)"
    )


def test_dedup_method_agreement_matches_python():
    from oaim_sandbox_spark.queries_extended import dedup_method_agreement

    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(f"tok{i}" for i in range(28)) + " xx yy"
    rows = [
        (1, base, "en", "sa"),                # identical pair: both families
        (2, base, "en", "sa"),
        (3, near, "en", "sa"),                # near-dup: family-dependent
        (4, " ".join(f"zz{i}" for i in range(25)), "en", "sb"),
        (5, " ".join(f"zz{i}" for i in range(25)), "en", "sb"),   # twin in sb
        (6, " ".join(f"qq{i} rr{i}" for i in range(12)), "en", "sb"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(dedup_method_agreement("duck")).fetchall()

    sigs = {did: _sig(t) for did, t, _, _ in rows}
    fps = {did: _simhash(t) for did, t, _, _ in rows}
    src = {did: s for did, t, _, s in rows}
    mh = {p for p, ej in _mh_pairs(sigs).items() if ej >= 0.5}
    sh = _sh_pairs(fps)
    cells = {}
    for a, b in mh | sh:
        c = cells.setdefault(src[a], [0, 0, 0, 0])
        c[0] += 1
        c[1] += 1 if (a, b) in mh else 0
        c[2] += 1 if (a, b) in sh else 0
        c[3] += 1 if (a, b) in mh and (a, b) in sh else 0
    exp = sorted((s, m, h, b, _r6(b / n))
                 for s, (n, m, h, b) in cells.items())
    assert [tuple(r) for r in got] == exp
    by_src = {r[0]: r for r in got}
    assert by_src["sa"][3] >= 1 and by_src["sb"][3] >= 1   # twins in both


def test_incremental_neardup_probe_matches_python():
    from oaim_sandbox_spark.queries_dedup import incremental_neardup_probe_q

    base = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (3, base, "en", "s"),                 # existing
        (7, base, "en", "s"),                 # NEW (7 % 10 == 7), twin of 3
        (17, base, "en", "s"),                # NEW, twin of both
        (4, " ".join(f"aa{i}" for i in range(20)), "en", "s"),   # existing
        (27, " ".join(f"bb{i}" for i in range(20)), "en", "s"),  # NEW, unique
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(incremental_neardup_probe_q("duck")).fetchall()

    sigs = {did: _sig(t) for did, t, _, _ in rows}
    bands = {did: _bands(s) for did, s in sigs.items()}
    exp = []
    for n_id in sorted(sigs):
        if n_id % 10 != 7:
            continue
        for e_id in sorted(sigs):
            if e_id % 10 == 7 or e_id == n_id:
                continue
            if any(x == y for x, y in zip(bands[n_id], bands[e_id])):
                agree = sum(1 for x, y in zip(sigs[n_id], sigs[e_id])
                            if x == y)
                exp.append((n_id, e_id, _r6(agree / float(NUM_PERM))))
    exp.sort()
    assert [tuple(r) for r in got] == exp
    emitted = {(r[0], r[1]) for r in got}
    assert (7, 3) in emitted and (17, 3) in emitted
    assert (7, 17) not in emitted and (17, 7) not in emitted   # new x new cut
    assert all(r[0] != 27 or False for r in got if r[0] == 27) or \
           27 not in {r[0] for r in got}                       # unique new silent


def _seqdot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def test_semantic_dedup_clusters_matches_python():
    from oaim_sandbox_spark.queries_extended import semantic_dedup_clusters

    # vec_ids 0..7 are the fixed centroids (one-hot dims 0..7 of a 16-dim
    # space); members live in the TAIL dims with a tiny eps=0.125 component
    # on one centroid axis — enough for argmax assignment, but cos-to-
    # centroid ~0.06 stays under the 0.35 prune fence (the centroid is
    # itself a lower-id cluster member, so a member close to its centroid
    # would be pruned BY the centroid — the first fixture learned this).
    # Members 8/9 duplicate in the tail (cluster 1: 9 drops via 8); members
    # 10/11 are near-identical in the tail but eps-assigned to DIFFERENT
    # clusters — the intra-cluster-only prune must keep BOTH (SemDeDup's
    # blind spot, asserted as intended semantics).
    def vec(cdim=None, eps=0.0, tail=()):
        v = [0.0] * 16
        if cdim is not None:
            v[cdim] = eps if eps else 1.0
        for j, x in tail:
            v[8 + j] = x
        return v

    vecs = [(i, 0, vec(cdim=i)) for i in range(8)]
    vecs += [
        (8, 0, vec(1, 0.125, [(0, 2.0)])),
        (9, 0, vec(1, 0.125, [(0, 3.0)])),     # cos(8,9)~1 -> 9 pruned
        (10, 0, vec(2, 0.125, [(1, 1.0), (2, 0.875)])),   # argmax -> cid 2
        (11, 0, vec(3, 0.125, [(1, 0.875), (2, 1.0)])),   # argmax -> cid 3
        (12, 0, vec(5, 0.125, [(3, 1.5)])),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({vid}, [{', '.join(repr(float(x)) for x in v)}]::FLOAT[], {lbl})"
            for vid, lbl, v in vecs)
        + ") AS v(vec_id, embedding, label)")
    got = con.execute(semantic_dedup_clusters("duck")).fetchall()

    store = {vid: v for vid, _, v in vecs}
    cents = {cid: store[cid] for cid in range(SEMDEDUP_K)}

    def cos(a, b):
        return _seqdot(a, b) / (math.sqrt(_seqdot(a, a)) * math.sqrt(_seqdot(b, b)))

    asg = {}
    for vid, v in store.items():
        best = max(((cos(v, cents[c]), -c) for c in cents))
        asg[vid] = -best[1]
    dropped = set()
    ids = sorted(store)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if asg[a] == asg[b] and _r6(cos(store[a], store[b])) >= SEMDEDUP_SIM:
                dropped.add(b)
    cells = {}
    for vid in ids:
        c = cells.setdefault(asg[vid], [0, 0])
        c[0] += 1
        if vid in dropped:
            c[1] += 1
    exp = sorted((cid, n, d_, n - d_) for cid, (n, d_) in cells.items())
    assert [tuple(r) for r in got] == exp
    assert asg[10] == 2 and asg[11] == 3       # the planted split held
    assert 9 in dropped and 8 not in dropped   # lowest-id wins
    assert 10 not in dropped and 11 not in dropped   # cross-cluster kept
    assert _r6(cos(store[10], store[11])) >= SEMDEDUP_SIM   # ...despite cos


def _strong_pairs(rows):
    sigs = {did: _sig(t) for did, t, _, _ in rows}
    return {p for p, ej in _mh_pairs(sigs).items() if ej >= 0.5}


def test_dedup_survivorship_matrix_matches_python():
    from oaim_sandbox_spark.queries_extended import dedup_survivorship_matrix

    base = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"aa{i}" for i in range(25))
    rows = [
        (1, base, "en", "crawlA"),     # chain 1<2<3: 1 survives,
        (2, base, "en", "crawlB"),     # 2 is dropped AND may not be
        (3, base, "en", "crawlB"),     # credited as 3's winner
        (4, other, "en", "crawlA"),
        (5, other, "en", "crawlA"),    # intra-source twin
        (6, " ".join(f"zz{i} qq{i}" for i in range(12)), "en", "crawlB"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(dedup_survivorship_matrix("duck")).fetchall()

    src = {did: s for did, t, _, s in rows}
    strong = _strong_pairs(rows)
    dropped = {b for _, b in strong}
    surv = {(a, b) for a, b in strong if a not in dropped}
    winner = {}
    for a, b in surv:
        winner[b] = min(winner.get(b, a), a)
    cells = {}
    for a, b in surv:
        c = cells.setdefault((src[a], src[b]), [0, 0])
        c[0] += 1
        if winner[b] == a:
            c[1] += 1
    exp = sorted((wa, lb, n, at) for (wa, lb), (n, at) in cells.items())
    assert [tuple(r) for r in got] == exp
    winners = {a for a, _ in surv}
    assert 2 not in winners                 # chain-middle never credited
    assert ("crawlA", "crawlB") in cells    # directional cell exists


def test_dedup_stage_overlap_matches_python():
    import re as _re

    from oaim_sandbox_spark.queries_extended import dedup_stage_overlap

    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(f"tok{i}" for i in range(29)) + " extra"
    rows = [
        (1, base, "en", "sa"),
        (2, base, "en", "sa"),          # byte-identical -> exact stage catches
        (3, near, "en", "sb"),          # near-ONLY (if est_j >= 0.5)
        (4, " ".join(f"qq{i}" for i in range(20)), "en", "sb"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(dedup_stage_overlap("duck")).fetchall()

    src = {did: s for did, t, _, s in rows}
    txt = {did: t for did, t, _, _ in rows}

    def fp(t):
        return _h64(_re.sub(r"\s+", " ", t.lower()).strip())

    strong = _strong_pairs(rows)
    cells = {}
    for a, b in strong:
        exact = 1 if fp(txt[a]) == fp(txt[b]) else 0
        c = cells.setdefault(src[b], [0, 0, set()])
        c[0] += 1
        c[1] += exact
        if not exact:
            c[2].add(b)
    exp = sorted((s, n, e, n - e, len(docs), _r6((n - e) / n))
                 for s, (n, e, docs) in cells.items())
    assert [tuple(r) for r in got] == exp
    by_src = dict((r[0], r) for r in got)
    assert by_src["sa"][2] == 1             # the byte twin is exact-overlap
    if "sb" in by_src:                      # near pair strength is hash-luck;
        assert by_src["sb"][3] >= 1         # if strong, it must be near-ONLY
