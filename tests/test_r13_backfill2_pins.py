"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 2 (VERDICT r12 task #3 continuation — the shared-SQL-oracle-only tail):
the DuckDB oracle certifies Spark-vs-DuckDB agreement on the SAME SQL, so a
wrong shared query certifies green — only a direct recomputation catches it
(this round's poster case: cosine_pair_histogram's sum-vs-mean bug).

Targets: the text-pipeline heuristics (lang_id, its confusion matrix,
repetition ratios, tf-idf, vocab coverage), the deterministic samplers
(A-Res weighted reservoir, hash-sharded pack mix), the warehouse shapes
(SCD2, moving stats, z-scores, sequence packing), and the blocked
edit-distance join. Planted boundaries throughout: a tie that the
language-code order must break, a distinct-ratio landing EXACTLY on the
0.3 cut, an edit distance exactly at the <=12 threshold plus a cross-block
near-identical pair that blocking must EXCLUDE, a pack-capacity straddle,
and a z-score exactly at the 3.0 outlier fence's safe side."""

import hashlib
import math
from collections import Counter

import duckdb

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "zu", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"],
}
LANGS = sorted(STOPWORDS)
INT64_MAX = 9223372036854775807


def _h64(s: str) -> int:
    """The portable 60-bit hash (functions/portable.hash64)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _r9(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e9 + 0.5) / 1e9, x)


def _toks(text: str):
    return [t for t in text.split(" ") if t]


def _lev(a: str, b: str) -> int:
    """Textbook O(len*len) DP — independent of both engines' builtins."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lang_id(text: str) -> str:
    toks = _toks(text.lower())
    scores = {lg: sum(1 for t in toks if t in ws) for lg, ws in STOPWORDS.items()}
    best = max(scores.values())
    if best == 0:
        return "und"
    return next(lg for lg in LANGS if scores[lg] == best)


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


def test_levenshtein_near_pairs_matches_dp_python():
    from oaim_sandbox_spark.queries_textstats import levenshtein_near_pairs

    # All 'en', n_chars tuned so ids 1-4 share block n_chars//20 == 2
    # (40..59 chars) while id 5 is a near-copy of id 1 pushed into block 3
    # by padding — blocking MUST exclude the (1,5) pair even though their
    # 32-char prefixes are close. Pair (3,4) differs in exactly 12 prefix
    # positions (kept, boundary), pair (2,3) in 13+ (cut).
    base = "abcdefghijklmnopqrstuvwxyz012345"          # 32-char prefix
    d1 = base + "XXXXXXXX"                             # 40 chars -> blk 2
    d2 = "abcdefgh" + "QQQQQQQQQQQQQ" + "rstuvwxyzAB" + "XXXXXXXX"
    d3 = base[:20] + "AAAAAAAAAAAA" + "XXXXXXXX"       # 12 diffs vs base
    d4 = base + "YYYYYYYY"                             # prefix == base
    d5 = base + "Z" * 28                               # 60 chars -> blk 3
    rows = [(1, d1, "en", "s"), (2, d2, "en", "s"), (3, d3, "en", "s"),
            (4, d4, "en", "s"), (5, d5, "en", "s")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(levenshtein_near_pairs("duck")).fetchall()

    by_id = {r[0]: (r[1][:32], len(r[1]) // 20) for r in rows}
    exp = []
    for a in sorted(by_id):
        for b in sorted(by_id):
            if a < b and by_id[a][1] == by_id[b][1]:
                dist = _lev(by_id[a][0], by_id[b][0])
                if dist <= 12:
                    exp.append((a, b, dist))
    exp.sort(key=lambda r: (r[2], r[0], r[1]))
    assert [tuple(r) for r in got] == exp[:100]
    ids_in_pairs = {i for r in got for i in r[:2]}
    assert 5 not in ids_in_pairs                # cross-block pair excluded
    assert (3, 4) in {(r[0], r[1]) for r in got}  # dist exactly 12 kept
    assert all(r[2] <= 12 for r in got)


def test_tfidf_top_terms_matches_sklearn_convention_python():
    from oaim_sandbox_spark.queries_extended import tfidf_top_terms

    # Only doc_id % 10 == 0 participates; id 5 is planted to be dropped.
    # 'zebra' appears only in doc 10 (high idf); 'common' in all kept docs
    # (idf floor ln(1)+1 = 1); doc 30 has a tfidf TIE between two
    # single-occurrence rare terms -> alphabetical tok order breaks it.
    rows = [
        (10, "common zebra zebra quick fox", "en", "s"),
        (20, "common common quick quick quick", "en", "s"),
        (30, "common apple banana", "en", "s"),
        (5, "common zebra dropped doc text", "en", "s"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(tfidf_top_terms("duck")).fetchall()

    kept = {did: _toks(text) for did, text, _, _ in rows if did % 10 == 0}
    n = len(kept)
    df = Counter(t for toks in kept.values() for t in set(toks))
    exp = []
    for did in sorted(kept):
        tf = Counter(kept[did])
        scored = [(tok, c * (math.log((n + 1) / (df[tok] + 1)) + 1.0))
                  for tok, c in tf.items()]
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rk, (tok, s) in enumerate(scored[:3], 1):
            exp.append((did, rk, tok, _r6(s)))
    assert [tuple(r) for r in got] == exp
    d30 = [r for r in got if r[0] == 30 and r[1] <= 2]
    assert [r[2] for r in d30] == ["apple", "banana"]   # tie -> tok ASC


def test_weighted_reservoir_sample_matches_ares_python():
    from oaim_sandbox_spark.queries_textstats import weighted_reservoir_sample

    # Weights (n_chars) spanning 1..2000 including the GREATEST(w,1) guard
    # at n_chars=1; u is the deterministic md5 grid so the whole A-Res
    # ranking is recomputable exactly.
    rows = [(i, "x" * w, "en", "s")
            for i, w in [(1, 1), (2, 10), (3, 100), (4, 1000), (5, 2000),
                         (6, 50), (7, 50), (8, 7), (9, 473), (10, 999)]]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(weighted_reservoir_sample("duck")).fetchall()

    exp = []
    for did, text, lang, _ in rows:
        w = len(text)
        u = ((_h64(str(did)) % 1000000) + 1) / 1000001.0
        key = math.pow(u, 1.0 / max(w, 1))
        exp.append((did, lang, w, _r9(key)))
    exp.sort(key=lambda r: (-r[3], r[0]))
    assert [tuple(r) for r in got] == exp[:100]


def test_lang_id_matches_stopword_argmax_python():
    from oaim_sandbox_spark.queries_textstats import lang_id_q

    rows = [
        (1, "the cat and the dog", "en", "s"),           # clear en
        (2, "der hund ist von den", "de", "s"),          # clear de
        (3, "de de de", "es", "s"),                      # es/fr TIE -> es
        (4, "qwerty zzz xylophone", "en", "s"),          # no hits -> und
        (5, "THE AND IS", "en", "s"),                    # lower() applies
        (6, "le la de et les", "fr", "s"),               # clear fr
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(lang_id_q("duck")).fetchall()
    exp = sorted((did, _lang_id(text)) for did, text, _, _ in rows)
    assert sorted(got) == exp
    by_id = dict(got)
    assert by_id[3] == "es"      # tie between es and fr -> code order
    assert by_id[4] == "und"
    assert by_id[5] == "en"


def test_lang_confusion_matrix_matches_python():
    from oaim_sandbox_spark.queries_extended import lang_confusion_matrix

    rows = [
        (1, "the cat and the dog", "en", "s"),
        (2, "qwerty zzz", "en", "s"),                    # en -> und cell
        (3, "der hund ist von den", "de", "s"),
        (4, "the quick brown fox is here", "de", "s"),   # mislabeled -> en
        (5, "de de de", "es", "s"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(lang_confusion_matrix("duck")).fetchall()

    cells = Counter((lang, _lang_id(text)) for _, text, lang, _ in rows)
    true_tot = Counter()
    for (tl, _), c in cells.items():
        true_tot[tl] += c
    exp = sorted(
        (tl, dl, c, _r6(c / true_tot[tl])) for (tl, dl), c in cells.items()
    )
    assert sorted(map(tuple, got)) == exp
    assert ("de", "en", 1, 0.5) in {tuple(r) for r in got}  # label noise cell


def test_repetition_ratios_matches_python():
    from oaim_sandbox_spark.queries_training import repetition_ratios

    rows = [
        (1, "a b c d e f g h i j", "en", "s"),              # ratio 1.0
        (2, "x x x x x x x x x y", "en", "s"),              # 0.2 -> flagged
        (3, "a a a a b b b c c d", "en", "s"),              # 0.4
        (4, "p p p p p p p q r s", "en", "s"),              # EXACTLY 0.4
        (5, "z z z z z z z z q w", "en", "s"),              # 0.3 boundary
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(repetition_ratios("duck")).fetchall()
    exp = []
    for did, text, _, _ in sorted(rows):
        toks = _toks(text)
        ratio = len(set(toks)) / len(toks)
        exp.append((did, len(toks), _r6(ratio), 1 if ratio < 0.3 else 0))
    assert [tuple(r) for r in got] == exp
    by_id = {r[0]: r for r in got}
    assert by_id[5][3] == 0        # exactly 0.3: NOT flagged (strict <)
    assert by_id[2][3] == 1


def test_event_value_zscores_matches_exact_moments_python():
    from oaim_sandbox_spark.queries_training import event_value_zscores

    # 'click': 11 baseline values + one planted outlier. A single-outlier
    # z is bounded by sqrt(n-1), so n=12 is the smallest group where the
    # plant (z = 22/6.633 = 3.317) can clear the 3.0 fence at all. All
    # values exact in binary so DECIMAL sums equal float sums.
    rows = ([(i, i % 3, "click", i * 1_000_000, 1.0) for i in range(1, 12)]
            + [(12, 1, "click", 12_000_000, 25.0),    # the outlier
               (13, 1, "view", 13_000_000, 2.0),
               (14, 2, "view", 14_000_000, 4.0),
               (15, 3, "view", 15_000_000, 3.0)])
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(event_value_zscores("duck")).fetchall()

    by_type = {}
    for _, _, et, _, v in rows:
        by_type.setdefault(et, []).append(v)
    exp = []
    for eid, _, et, _, v in sorted(rows):
        vs = by_type[et]
        n = float(len(vs))
        s1, s2 = float(sum(vs)), float(sum(x * x for x in vs))
        mean = s1 / n
        z = (v - mean) / math.sqrt(s2 / n - mean * mean)
        exp.append((eid, et, _r6(z), 1 if abs(z) > 3.0 else 0))
    assert [tuple(r) for r in got] == exp
    assert {r[0]: r[3] for r in got}[12] == 1


def test_event_moving_stats_matches_python():
    from oaim_sandbox_spark.queries_training import event_moving_stats

    # user 3: 7 events (frame saturates at 5); user 10 planted OUTSIDE the
    # user_id < 10 slice.
    rows = ([(i, 3, "view", i * 1_000_000 + (7 if i == 4 else 0), float(i * i))
             for i in range(1, 8)]
            + [(20, 10, "view", 1_000_000, 99.0)])
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(event_moving_stats("duck")).fetchall()

    kept = sorted((r for r in rows if r[1] < 10), key=lambda r: (r[1], r[3], r[0]))
    exp = []
    for i, (eid, uid, _, ts, v) in enumerate(kept):
        window = [r[4] for r in kept[max(0, i - 4):i + 1]]
        gap = ts - kept[i - 1][3] if i > 0 else None
        exp.append((uid, eid, _r6(sum(window) / len(window)), gap))
    assert [tuple(r) for r in got] == exp
    assert all(r[0] != 10 for r in got)


def test_scd2_purchase_history_matches_python():
    from oaim_sandbox_spark.queries_extended import scd2_purchase_history

    # user 1: three purchases (two closed intervals + one current);
    # user 2: single purchase (current from the start); clicks ignored.
    rows = [
        (1, 1, "purchase", 1_000_000, 10.5),
        (2, 1, "click", 1_500_000, 0.0),
        (3, 1, "purchase", 2_000_000, 20.25),
        (4, 1, "purchase", 5_000_000, 30.0),
        (5, 2, "purchase", 3_000_000, 7.0),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(scd2_purchase_history("duck")).fetchall()

    exp = []
    for uid in (1, 2):
        ps = sorted((r for r in rows if r[1] == uid and r[2] == "purchase"),
                    key=lambda r: (r[3], r[0]))
        for i, (eid, _, _, ts, v) in enumerate(ps):
            nxt = ps[i + 1][3] if i + 1 < len(ps) else None
            exp.append((uid, ts, nxt if nxt is not None else INT64_MAX,
                        _r6(v), 0 if nxt is not None else 1))
    exp.sort(key=lambda r: (r[0], r[1]))
    assert [tuple(r) for r in got] == exp
    assert sum(r[4] for r in got) == 2          # exactly one current per user


def test_sequence_packing_matches_python():
    from oaim_sandbox_spark.queries_training import sequence_packing

    # Source 'a': docs of 200/200/200 tokens — doc 3 STRADDLES the 512
    # boundary (before=400 -> pack 0 offset 400); doc 4 lands exactly ON
    # before=600 -> pack 1 offset 88. Source 'b' packs independently.
    def doc(did, n, src):
        return (did, " ".join(f"t{i}" for i in range(n)), "en", src)
    rows = [doc(1, 200, "a"), doc(2, 200, "a"), doc(3, 200, "a"),
            doc(4, 100, "a"), doc(5, 600, "b"), doc(6, 10, "b")]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(sequence_packing("duck")).fetchall()

    exp = []
    for src in ("a", "b"):
        cum = 0
        for did, text, _, s in sorted(rows):
            if s != src:
                continue
            n = len(_toks(text))
            exp.append((src, did, n, cum // 512, cum % 512))
            cum += n
    assert [tuple(r) for r in got] == exp
    by_id = {r[1]: r for r in got}
    assert by_id[3][3:] == (0, 400)   # straddles: pack floor of BEFORE-count
    assert by_id[4][3:] == (1, 88)
    assert by_id[6][3:] == (1, 88)    # source b independent cumulative


def test_vocab_coverage_topk_matches_python():
    from oaim_sandbox_spark.queries_textstats import vocab_coverage_topk

    # 25 distinct tokens with descending counts; tokens u20/u21 TIE at the
    # top-20 boundary -> alphabetical keeps 'u20' (ASCII '0' < '1') and
    # cuts 'u21'.
    parts = []
    for i in range(1, 20):
        parts += [f"w{i:02d}"] * (30 - i)
    parts += ["u20"] * 5 + ["u21"] * 5
    for i in range(4):
        parts += [f"z{i}"] * (2 - i % 2)
    text = " ".join(parts)
    con = duckdb.connect()
    _mk_documents(con, [(1, text, "en", "s")])
    got = con.execute(vocab_coverage_topk("duck")).fetchall()

    freq = Counter(_toks(text))
    total = sum(freq.values())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    cum = 0
    exp = []
    for rn, (tok, n) in enumerate(ranked, 1):
        cum += n
        exp.append((tok, n, rn, _r6(cum / total)))
    assert [tuple(r) for r in got] == exp
    toks_out = {r[0] for r in got}
    assert "u20" in toks_out and "u21" not in toks_out


def test_pack_mix_diversity_matches_python():
    from oaim_sandbox_spark.queries_training import pack_mix_diversity

    # 40 docs x 40 tokens: 35 'alpha' + 5 beta/gamma, hash-sharded into 8
    # shards (~5 docs each, one 200-token pack per shard), hash-ordered
    # within shard — the alpha dominance guarantees at least one pure pack
    # (entropy 0) while the 5 minority docs mix at least one other.
    rows = [(i, " ".join(f"t{j}" for j in range(40)), "en",
             "alpha" if i <= 35 else ["beta", "gamma"][i % 2]) for i in range(1, 41)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(pack_mix_diversity("duck")).fetchall()

    packs = {}
    for did, text, _, src in rows:
        h = _h64(f"{did}:pack:7")
        packs.setdefault(h % 8, []).append((h, did, len(_toks(text)), src))
    exp = []
    for shard in sorted(packs):
        cum = 0
        cells = {}
        for h, did, n, src in sorted(packs[shard]):
            pid = cum // 512
            cells.setdefault(pid, Counter())[src] += 1
            cum += n
        for pid in sorted(cells):
            c = cells[pid]
            t = sum(c.values())
            ent = -sum((k / t) * math.log(k / t) for k in c.values())
            exp.append((shard, pid, t, len(c), _r6(ent) + 0.0))
    assert [tuple(r) for r in got] == exp
    assert any(r[3] == 1 and r[4] == 0.0 for r in got)      # pure pack
    assert any(r[3] >= 2 for r in got)                      # mixed pack
