"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 10 — the simhash clustering composites: the ENTIRE pipeline
(tf-weighted 60-bit simhash votes -> 4 x 15-bit banding -> hamming <= 20
verify -> connected components -> min-id canonicalization -> size/token
rollup) is recomputed from scratch in Python (union-find instead of the
recursive CTE), so a silent change anywhere in the chain — tokenizer,
vote sign, band arithmetic, hamming fence, canonical rule, dropped-token
accounting — breaks the pin even when both engines run the same wrong
SQL. The planted corpus guarantees one certain cluster (two IDENTICAL
docs: hamming 0, every band collides) and checks first-wins accounting
(the dropped token mass is exactly the non-canonical twin's)."""

import hashlib
import math
from collections import Counter

import duckdb

SIMHASH_BITS, SIMHASH_BANDS, MAX_HAMMING = 60, 4, 20
SLICE = SIMHASH_BITS // SIMHASH_BANDS


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str):
    return [t for t in text.split(" ") if t]


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


def _pairs(fps: dict) -> set:
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


def _clusters(ids, pairs) -> dict:
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def _mk_documents(con, rows):
    vals = ", ".join(
        f"({did}, '{text}', '{lang}', '{src}', {len(text)})"
        for did, text, lang, src in rows
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + vals + ") AS v(doc_id, text, lang, source, n_chars)"
    )


def _fixture():
    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(f"tok{i}" for i in range(29)) + " other"
    return [
        (1, base, "en", "s"),                 # identical pair ->
        (2, base, "en", "s"),                 #   hamming 0, certain cluster
        (3, near, "en", "s"),                 # near-dup of the pair (29/30)
        (4, " ".join(f"zz{i} qq{i}" for i in range(15)), "en", "s"),
        (5, " ".join(f"aa{i}" for i in range(25)), "en", "s"),
    ]


def test_near_dup_clusters_matches_unionfind_python():
    from oaim_sandbox_spark.queries_training import near_dup_clusters_oracle

    rows = _fixture()
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(near_dup_clusters_oracle("duck")).fetchall()

    fps = {did: _simhash(t) for did, t, _, _ in rows}
    labels = _clusters(sorted(fps), _pairs(fps))
    exp = [(did, labels[did], 1 if labels[did] == did else 0)
           for did in sorted(fps)]
    assert [tuple(r) for r in got] == exp
    by_id = {r[0]: r for r in got}
    assert by_id[2][1] == 1 and by_id[2][2] == 0   # identical twin absorbed
    assert by_id[1][2] == 1                        # min id is canonical
    assert fps[1] == fps[2]                        # hamming-0 certainty
    # doc 3 shares 29/30 tokens: its hamming to the pair is deterministic —
    # whatever it is, the SQL and the union-find MUST agree (checked above).


def test_dup_cluster_size_histogram_matches_python():
    from oaim_sandbox_spark.queries_extended import dup_cluster_size_histogram

    rows = _fixture()
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(dup_cluster_size_histogram("duck")).fetchall()

    fps = {did: _simhash(t) for did, t, _, _ in rows}
    labels = _clusters(sorted(fps), _pairs(fps))
    ntok = {did: len(_toks(t)) for did, t, _, _ in rows}
    per_cluster = {}
    for did, lbl in labels.items():
        a = per_cluster.setdefault(lbl, [0, 0])
        a[0] += 1
        if did != lbl:
            a[1] += ntok[did]
    hist = {}
    for size, dropped in per_cluster.values():
        h = hist.setdefault(size, [0, 0, 0])
        h[0] += 1
        h[1] += size
        h[2] += dropped
    exp = sorted((s, n, d_, t) for s, (n, d_, t) in hist.items())
    assert [tuple(r) for r in got] == exp
    # the certain twin cluster drops EXACTLY the non-canonical copy's mass
    twin_lbl = labels[2]
    assert per_cluster[twin_lbl][1] >= ntok[2]
