"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 3: the deterministic-hash samplers and splits (train/test, stratified,
mix rebalance, temperature weights), the time-series/warehouse shapes
(gap-fill, CDC compaction, sessionization), the index/profile builders
(inverted postings, boilerplate prefix argmax), the embedding-store audits
(sign balance, health audit, centroid margin), and the PII scrub.

This batch's real find: embedding_health_audit ABORTED on any store
containing a non-finite vector — the NaN norm reached exact_avg's
CAST(floor(x) AS BIGINT), which throws on both engines, so the audit died
on exactly the stores its n_nonfinite_vals column exists to flag. Fixed
(non-finite -> NULL norm, clean stores bit-identical); the NaN fixture
here is the regression pin."""

import hashlib
import math
import re
from collections import Counter

import duckdb

EMBED_DIM = 64
INT64_MAX = 9223372036854775807


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _toks(text: str):
    return [t for t in text.split(" ") if t]


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
    """rows: (event_id, user_id, event_type, ts_us)."""
    vals = ", ".join(
        f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
        f"CAST(0 AS DOUBLE), '{{}}')"
        for eid, uid, et, ts in rows
    )
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + vals + ") AS v(event_id, ts, user_id, event_type, value, props)"
    )


def _mk_embeddings(con, vecs):
    """vecs: (vec_id, label, list[float]); 'nan' entries become NaN floats."""
    def cell(x):
        return "'nan'::FLOAT" if x != x else repr(float(x))
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({vid}, [{', '.join(cell(x) for x in v)}]::FLOAT[], {lbl})"
            for vid, lbl, v in vecs)
        + ") AS v(vec_id, embedding, label)"
    )


def test_train_test_split_matches_hash_python():
    from oaim_sandbox_spark.queries_training import train_test_split

    rows = [(i, "w " * 5 + "end", "en", "s") for i in range(1, 101)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(train_test_split("duck")).fetchall()

    exp = []
    for did, text, _, _ in rows:
        b = _h64(f"{did}-split-v1") % 10
        split = "train" if b < 8 else ("valid" if b == 8 else "test")
        exp.append((did, split, len(text)))
    assert [tuple(r) for r in got] == exp
    shares = Counter(r[1] for r in got)
    assert set(shares) == {"train", "valid", "test"}   # all three materialize


def test_stratified_sample_counts_matches_hash_python():
    from oaim_sandbox_spark.queries_training import stratified_sample_counts

    rows = [(i, "text here", ["en", "de", "fr"][i % 3], "s")
            for i in range(1, 91)]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(stratified_sample_counts("duck")).fetchall()

    tot, samp = Counter(), Counter()
    for did, _, lang, _ in rows:
        tot[lang] += 1
        if _h64(f"{did}-sample-v1") % 100 < 20:
            samp[lang] += 1
    exp = sorted((lg, tot[lg], samp[lg]) for lg in tot)
    assert [tuple(r) for r in got] == exp
    assert sum(samp.values()) > 0


def test_domain_mix_rebalance_matches_hash_python():
    from oaim_sandbox_spark.queries_training import domain_mix_rebalance

    # 'big' is 4x over-represented vs the uniform target -> keep_rate
    # 10/16/... ; 'tiny' under-represented -> rate clamps to 1.0 and every
    # doc survives the threshold (h % 1e6 < 1e6 always).
    rows = ([(i, "t", "en", "big") for i in range(1, 33)]
            + [(i, "t", "en", "mid") for i in range(33, 43)]
            + [(i, "t", "en", "tiny") for i in range(43, 47)])
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(domain_mix_rebalance("duck")).fetchall()

    n_src = Counter(src for _, _, _, src in rows)
    total, n_sources = len(rows), len(n_src)
    exp = []
    for src in sorted(n_src):
        rate = min(1.0, (total / n_sources) / n_src[src])
        cut = math.floor(rate * 1000000)
        kept = sum(1 for did, _, _, s in rows
                   if s == src and _h64(f"{did}-mix-v1") % 1000000 < cut)
        exp.append((src, n_src[src], _r6(rate), kept))
    assert [tuple(r) for r in got] == exp
    by_src = {r[0]: r for r in got}
    assert by_src["tiny"][2] == 1.0 and by_src["tiny"][3] == n_src["tiny"]
    assert by_src["big"][3] < n_src["big"]


def test_domain_temperature_weights_matches_python():
    from oaim_sandbox_spark.queries_extended import domain_temperature_weights

    rows = ([(i, "t", "en", "s") for i in range(1, 82)]       # 81 docs
            + [(i, "t", "de", "s") for i in range(82, 98)]    # 16 docs
            + [(i, "t", "zh", "s") for i in range(98, 101)])  # 3 docs
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(domain_temperature_weights("duck")).fetchall()

    n = Counter(lang for _, _, lang, _ in rows)
    total = float(len(rows))
    pa = {lg: math.pow(n[lg] / total, 0.3) for lg in n}
    z = sum(pa[lg] for lg in sorted(n))
    exp = []
    for lg in sorted(n):
        p = n[lg] / total
        exp.append((lg, n[lg], _r6(p), _r6(pa[lg] / z), _r6((pa[lg] / z) / p)))
    assert [tuple(r) for r in got] == exp
    by_lang = {r[0]: r for r in got}
    assert by_lang["zh"][4] > 1.0 > by_lang["en"][4]   # rare boosted, big cut


def test_hourly_gapfill_matches_python():
    from oaim_sandbox_spark.queries_training import hourly_gapfill

    h = 3_600_000_000
    rows = [(1, 1, "view", 2 * h + 5), (2, 1, "view", 2 * h + 99),
            (3, 2, "click", 5 * h + 1), (4, 3, "view", 9 * h)]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(hourly_gapfill("duck")).fetchall()

    hours = Counter(ts // h for _, _, _, ts in rows)
    lo, hi = min(hours), max(hours)
    exp = [(hh, hours.get(hh, 0)) for hh in range(lo, hi + 1)]
    assert [tuple(r) for r in got] == exp
    assert (3, 0) in {tuple(r) for r in got}        # gap hour zero-filled
    assert len(got) == hi - lo + 1


def test_latest_event_per_user_matches_python():
    from oaim_sandbox_spark.queries_training import latest_event_per_user

    # user 1 has two events at the SAME timestamp -> event_id DESC wins.
    rows = [(1, 1, "view", 5_000_000), (2, 1, "click", 5_000_000),
            (3, 1, "view", 1_000_000), (4, 2, "purchase", 9_000_000),
            (5, 2, "view", 8_000_000)]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(latest_event_per_user("duck")).fetchall()

    exp = []
    for uid in (1, 2):
        evs = sorted((r for r in rows if r[1] == uid),
                     key=lambda r: (-r[3], -r[0]))
        eid, _, et, ts = evs[0]
        exp.append((uid, eid, ts, et))
    assert [tuple(r) for r in got] == exp
    assert got[0][1] == 2       # same-ts tie -> larger event_id


def test_user_activity_sessions_matches_python():
    from oaim_sandbox_spark.queries_relational import user_activity_sessions

    g = 1_800_000_000
    rows = [
        (1, 1, "view", 0),
        (2, 1, "view", g),            # gap EXACTLY 30 min -> NOT a break
        (3, 1, "view", 2 * g + 1),    # gap g+1 -> break
        (4, 50, "view", 0),           # user_id < 50 excludes this row
        (5, 7, "view", 123),
    ]
    con = duckdb.connect()
    _mk_events(con, rows)
    got = con.execute(user_activity_sessions("duck")).fetchall()

    exp = []
    for uid in (1, 7):
        evs = sorted((r for r in rows if r[1] == uid), key=lambda r: (r[3], r[0]))
        prev = None
        for eid, _, _, ts in evs:
            brk = 1 if prev is None or ts - prev > g else 0
            exp.append((uid, eid, ts, brk))
            prev = ts
    assert [tuple(r) for r in got] == exp
    by_eid = {r[1]: r[3] for r in got}
    assert by_eid[2] == 0 and by_eid[3] == 1       # strict > boundary
    assert 4 not in by_eid


def test_inverted_index_postings_matches_python():
    from oaim_sandbox_spark.queries_textstats import inverted_index_postings

    rows = [
        (3, "apple banana apple", "en", "s"),
        (1, "banana cherry", "en", "s"),
        (2, "apple cherry date", "en", "s"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(inverted_index_postings("duck")).fetchall()

    tf = Counter()
    for did, text, _, _ in rows:
        for t in _toks(text):
            tf[(t, did)] += 1
    terms = {}
    for (t, did), c in tf.items():
        terms.setdefault(t, {})[did] = c
    exp = []
    for t, post in terms.items():
        exp.append((t, len(post), sum(post.values()),
                    ",".join(str(d) for d in sorted(post))))
    exp.sort(key=lambda r: (-r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:100]
    by_term = dict((r[0], r) for r in got)
    assert by_term["apple"][3] == "2,3"            # postings sorted by doc_id
    assert [r[0] for r in got[:3]] == ["apple", "banana", "cherry"]  # df tie -> term ASC


def test_boilerplate_prefix_profile_matches_python():
    from oaim_sandbox_spark.queries_extended import boilerplate_prefix_profile

    # source 'tpl': 3 docs share an 8-token header (the planted template),
    # 1 odd doc. source 'tie': two prefixes at count 1 -> MIN prefix wins.
    # source 'short': a 3-token doc (prefix = whole text).
    hdr = "breaking news site menu home login search contact"
    rows = [
        (1, hdr + " story one", "en", "tpl"),
        (2, hdr + " story two", "en", "tpl"),
        (3, hdr + " third story here", "en", "tpl"),
        (4, "completely different text body here now ok fine", "en", "tpl"),
        (5, "zz yy xx ww vv uu tt ss extra", "en", "tie"),
        (6, "aa bb cc dd ee ff gg hh extra", "en", "tie"),
        (7, "tiny doc here", "en", "short"),
    ]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(boilerplate_prefix_profile("duck")).fetchall()

    by_src = {}
    for _, text, _, src in rows:
        pref = " ".join(_toks(text)[:8])
        by_src.setdefault(src, Counter())[pref] += 1
    exp = []
    for src in sorted(by_src):
        c = by_src[src]
        mx = max(c.values())
        pref = min(p for p, n in c.items() if n == mx)
        tot = sum(c.values())
        exp.append((src, pref, mx, _r6(mx / tot), len(c)))
    assert [tuple(r) for r in got] == exp
    by = {r[0]: r for r in got}
    assert by["tpl"][1] == hdr and by["tpl"][2] == 3
    assert by["tie"][1].startswith("aa bb")        # MIN-prefix tie-break
    assert by["short"][1] == "tiny doc here"


def test_pii_redaction_stats_matches_re_python():
    from oaim_sandbox_spark.queries_extended import pii_redaction_stats

    # ids chosen to hit every augmentation combination: none (1, 2), email
    # only (5, 10), phone only (7, 14), ip only (11, 22), email+phone (35),
    # email+ip (55), phone+ip (77); doc 13 carries PRE-EXISTING pii in its
    # text; the even ids land in source s0 so both sources materialize.
    ids = [1, 5, 7, 11, 35, 55, 77, 13, 2, 10, 14, 22]
    rows = [(i,
             "mail bob.x@mail.example today and 1.2.3.4 plus 555-123-4567 ok"
             if i == 13 else "plain words only here",
             "en", f"s{i % 2}") for i in ids]
    con = duckdb.connect()
    _mk_documents(con, rows)
    got = con.execute(pii_redaction_stats("duck")).fetchall()

    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
    phone_re = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
    ip_re = r"[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"
    agg = {}
    for did, text, _, src in rows:
        t = text
        if did % 5 == 0:
            t += f" contact user{did}@example.com now"
        if did % 7 == 0:
            t += f" call 555-{did % 1000:03d}-{did % 10000:04d} soon"
        if did % 11 == 0:
            t += f" from 10.{did % 256}.{did % 250}.7 today"
        red = re.sub(ip_re, "<IP>",
                     re.sub(phone_re, "<PHONE>", re.sub(email_re, "<EMAIL>", t)))
        a = agg.setdefault(src, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(re.findall(email_re, t))
        a[2] += len(re.findall(phone_re, t))
        a[3] += len(re.findall(ip_re, t))
        a[4] += len(t) - len(red)
    exp = sorted((src, *vals) for src, vals in agg.items())
    assert [tuple(r) for r in got] == exp
    totals = [sum(r[i] for r in got) for i in range(2, 5)]
    assert totals[0] >= 4 and totals[1] >= 3 and totals[2] >= 4
    assert all(r[5] > 0 for r in got)              # redaction shrank text


def _basis_vec(i, scale=1.0, dim=EMBED_DIM):
    v = [0.0] * dim
    v[i] = scale
    return v


def test_sign_balance_audit_matches_python():
    from oaim_sandbox_spark.queries_extended import sign_balance_audit

    # dim 1 (index 0): all 10 positive -> skew 1.0, dead. dim 2: 5/10
    # positive -> skew 0.0. dim 3: 9/10 -> skew 0.8, alive (<= 0.98).
    # Remaining dims all zero -> frac_positive 0, skew 1.0, dead.
    vecs = []
    for k in range(10):
        v = [0.0] * EMBED_DIM
        v[0] = 1.0
        v[1] = 1.0 if k < 5 else -1.0
        v[2] = 1.0 if k < 9 else -1.0
        vecs.append((k + 1, 0, v))
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(sign_balance_audit("duck")).fetchall()

    assert len(got) == EMBED_DIM
    exp = []
    for i in range(EMBED_DIM):
        pos = sum(1 for _, _, v in vecs if v[i] > 0)
        fp = pos / 10
        skew = _r6(abs(2 * fp - 1.0))
        exp.append((i + 1, _r6(fp), skew, 1 if skew > 0.98 else 0))
    assert [tuple(r) for r in got] == exp
    by_dim = {r[0]: r for r in got}
    assert by_dim[1][3] == 1 and by_dim[2][3] == 0 and by_dim[3][3] == 0
    assert by_dim[4][3] == 1                       # all-zero dim is dead


def test_embedding_health_audit_survives_nan_and_matches_python():
    from oaim_sandbox_spark.queries_extended import embedding_health_audit

    nan = float("nan")
    vecs = [
        (1, 0, _basis_vec(0, 3.0)),
        (2, 0, _basis_vec(1, 4.0)),
        (3, 0, [0.0] * EMBED_DIM),                       # zero-norm
        (4, 0, [nan] + [1.0] * (EMBED_DIM - 1)),         # one NaN component
        (5, 1, _basis_vec(2, 5.0)),
        (6, 1, _basis_vec(3, 12.0)),
    ]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(embedding_health_audit("duck")).fetchall()  # no abort

    def norms(lbl):
        out = []
        for _, l, v in vecs:
            if l == lbl and not any(x != x for x in v):
                out.append(_r6(math.sqrt(sum(x * x for x in v))))
        return sorted(out)

    def q99(xs):
        pos = 0.99 * (len(xs) - 1)
        lo = math.floor(pos)
        frac = pos - lo
        hi = min(lo + 1, len(xs) - 1)
        return xs[lo] + frac * (xs[hi] - xs[lo])

    def mean_exact(xs):
        q = sum(math.floor(x * 1e9 + 0.5) for x in xs)
        return _r6(q / (len(xs) * 1e9))

    # label 0: 4 vectors, 1 zero-norm, EMBED_DIM-1 NaN values in vec 4,
    # constant dims = dims identical across ALL 4 vectors (NaN breaks
    # MIN=MAX, dims 0 and 1 vary, the rest need checking against vec 4's
    # 1.0 fill) -> recompute directly.
    exp = []
    for lbl in (0, 1):
        vs = [v for _, l, v in vecs if l == lbl]
        ns = norms(lbl)
        n_const = 0
        for i in range(EMBED_DIM):
            col = [v[i] for v in vs]
            if any(x != x for x in col):
                continue_min_eq_max = False
            else:
                continue_min_eq_max = min(col) == max(col)
            if continue_min_eq_max:
                n_const += 1
        exp.append((lbl, len(vs), EMBED_DIM, EMBED_DIM,
                    sum(1 for x in ns if x < 0.000001),
                    sum(sum(1 for x in v if x != x) for v in vs),
                    mean_exact(ns), _r6(q99(ns)), n_const))
    assert [tuple(r) for r in got] == exp
    by_lbl = {r[0]: r for r in got}
    assert by_lbl[0][4] == 1                # zero-norm counted
    assert by_lbl[0][5] == 1                # the NaN value counted, not fatal
    assert by_lbl[1][8] == 62               # dims 2,3 vary; 62 constant


def test_label_centroid_margin_matches_python():
    from oaim_sandbox_spark.queries_extended import label_centroid_margin

    # label 0 lives on axis 0 (tight), label 1 on axis 1 (tight), label 2
    # SPLIT between axes 0 and 2 — its centroid sits between, so intra is
    # large and the margin collapses toward label 0's direction.
    vecs = [
        (1, 0, _basis_vec(0, 1.0)), (2, 0, _basis_vec(0, 2.0)),
        (3, 1, _basis_vec(1, 1.0)), (4, 1, _basis_vec(1, 3.0)),
        (5, 2, _basis_vec(0, 1.0)), (6, 2, _basis_vec(2, 1.0)),
    ]
    con = duckdb.connect()
    _mk_embeddings(con, vecs)
    got = con.execute(label_centroid_margin("duck")).fetchall()

    import numpy as np
    by_lbl = {}
    for _, l, v in vecs:
        by_lbl.setdefault(l, []).append(np.array(v))
    cents = {l: np.mean(vs, axis=0) for l, vs in by_lbl.items()}

    def cosd(a, b):
        den = math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))
        return 1.0 - (float(a @ b) / den if den else 0.0)

    exp = []
    for l in sorted(by_lbl):
        intra = sum(cosd(v, cents[l]) for v in by_lbl[l]) / len(by_lbl[l])
        inter = min(cosd(cents[l], cents[o]) for o in cents if o != l)
        exp.append((l, len(by_lbl[l]), _r6(intra), _r6(inter),
                    _r6(inter / intra) if intra else None))
    assert [tuple(r) for r in got] == exp
    by = {r[0]: r for r in got}
    assert by[0][2] == 0.0 or by[0][2] < 1e-6      # same-direction label: intra ~0
    assert by[2][2] > 0.29                         # split label: intra large
