"""Driver-contract registry sanity: every template has an oracle, every Spark
query compiles and returns rows at sf0.001, oracle SQL parses in DuckDB."""

import duckdb
import pytest

from oaim_sandbox_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_every_template_has_oracle():
    oracles = Q.oracle_sqls()
    assert set(oracles) == set(Q.TEMPLATES)
    for name, sql in oracles.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_non_oracle_queries_registered():
    qs = Q.spark_queries()
    for name in Q.NON_ORACLE:
        assert name in qs
        assert name not in Q.oracle_sqls()


def test_oracle_sql_parses_in_duckdb():
    duck = duckdb.connect()
    for t in Q.ALL_TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in Q.oracle_sqls().items():
        duck.sql(f"SELECT * FROM ({sql}) q LIMIT 1")  # parse + execute a row


@pytest.mark.parametrize("name", sorted(Q.TEMPLATES))
def test_spark_query_compiles(spark, name):
    df = Q.spark_queries()[name](spark, SF)
    assert df.limit(1).count() >= 0


def test_events_ts_us_timezone_independent(spark):
    """events_batch pins session tz to UTC internally, so ts_us equals the
    raw parquet value interpreted as UTC epoch-micros even when the caller's
    session is in another zone (vanilla driver sessions inherit the JVM tz)."""
    import pyarrow.parquet as pq

    from oaim_sandbox_spark.queries import events_batch

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {r["event_id"]: r["ts_us"] for r in
               events_batch(spark, "/root/testdata/sf0.001").select("event_id", "ts_us").limit(50).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    from datetime import timezone

    t = pq.read_table("/root/testdata/sf0.001/events.parquet", columns=["event_id", "ts"])
    want = dict(zip(t["event_id"].to_pylist(),
                    [int(v.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
                     if hasattr(v, "timestamp") else v // 1000
                     for v in t["ts"].to_pylist()]))
    assert all(got[k] == want[k] for k in got)


def test_sketch_profile_error_bounds(spark):
    """sketch_profile is rows-only (sketch internals are engine-specific), so
    its correctness contract is an ACCURACY BOUND vs the exact aggregates:
    HLL++ distinct counts within 5% relative error, approx percentiles
    within the value spread between the neighboring exact percentiles."""
    from oaim_sandbox_spark.queries import NON_ORACLE

    sf = "/root/testdata/sf0.01"
    approx = {r["event_type"]: r for r in NON_ORACLE["sketch_profile"](spark, sf).collect()}

    import duckdb

    exact = {
        r[0]: r
        for r in duckdb.sql(
            f"""SELECT event_type, COUNT(DISTINCT user_id),
                       quantile_cont(value, 0.40), quantile_cont(value, 0.60),
                       quantile_cont(value, 0.90), quantile_cont(value, 0.99)
                FROM '{sf}/events.parquet' GROUP BY event_type"""
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        _, nd, p40, p60, p90, p99 = exact[et]
        assert abs(a["approx_users"] - nd) <= max(2, 0.05 * nd)
        assert p40 <= a["approx_p50"] <= p60   # p50 lands between exact p40/p60
        assert p90 <= a["approx_p95"] <= p99   # p95 lands between exact p90/p99


def test_driver_window_targets_stalest_certifications():
    """The driver checks only the first 50 oracle entries. With the full
    registry union-certified (r1-r4), round 5 rotates the window onto
    certification RECENCY: everything never driver-checked (new this
    round), everything whose last driver check was round 1, and this
    round's edited entries must sit in the 50-entry prefix — no entry's
    driver certification should age more than a couple of rounds."""
    import glob
    import json

    ordered = [n for n in Q.oracle_sqls()]
    window = set(ordered[:50])
    last: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name in json.load(open(path)):
            last[name] = rnd
    # round-agnostic invariant: the window is the 50 stalest entries.
    # Never-checked entries (staleness 0) must always be in-window; beyond
    # that, no entry OUTSIDE the window may be strictly staler than the
    # stalest tier the window already fully covers (ties may split).
    never = {n for n in ordered if n not in last}
    assert not (never - window), f"never-checked entries not in window: {sorted(never - window)}"
    boundary = sorted(last.get(n, 0) for n in ordered)[49]
    too_stale_outside = {n for n in ordered[50:] if last.get(n, 0) < boundary}
    assert not too_stale_outside, (
        f"entries outside the window are staler than the window boundary "
        f"r{boundary}: {sorted(too_stale_outside)}"
    )


def _assert_window_invariant(ordered: "list[str]", last: "dict[str, int]") -> None:
    window = set(ordered[:50])
    never = {n for n in ordered if n not in last}
    assert not (never - window), f"never-checked entries not in window: {sorted(never - window)}"
    boundary = sorted(last.get(n, 0) for n in ordered)[49]
    too_stale_outside = {n for n in ordered[50:] if last.get(n, 0) < boundary}
    assert not too_stale_outside, sorted(too_stale_outside)


def test_window_self_rotates_when_driver_drops_fresh_record(tmp_path):
    """VERDICT r12 task #2: the window ordering is derived AT RUNTIME from
    the CORRECTNESS_r*.json union (flagship_order), so the staleness
    invariant must hold BOTH before and after a synthetic fresh
    CORRECTNESS_r{N+1}.json lands in the repo root — the exact event that
    made the committed-tuple window fail at three consecutive judge HEADs.
    The drop is simulated against a tmp COPY of the repo root's records
    (r13 review: writing a synthetic all-green record into the LIVE root
    would leave a forged certification artifact behind if the run were
    SIGKILLed mid-test — the root=/union= injection exists for exactly
    this). The synthetic record certifies the CURRENT window's 50 names;
    the re-derived order must demote all of them past slot 50 and promote
    the union's stalest tier, with no hand-edited list."""
    import glob
    import json
    import shutil

    paths = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    assert paths, "no CORRECTNESS records committed — nothing to rotate on"
    for src_p in paths:
        shutil.copy(src_p, tmp_path / src_p.rsplit("/", 1)[1])
    nxt = max(int(src_p.rsplit("_r", 1)[1].split(".")[0]) for src_p in paths) + 1

    # BEFORE: the live import-time ordering satisfies the invariant, the
    # tmp copy derives the identical order, and both match a fresh
    # derivation (import-time snapshot is not stale).
    live = [n for n in Q.FLAGSHIP_FIRST if n in Q.TEMPLATES]
    assert tuple(Q.FLAGSHIP_FIRST) == Q.flagship_order()
    union0 = Q._correctness_union(root=str(tmp_path))
    assert Q.flagship_order(union=union0) == tuple(Q.FLAGSHIP_FIRST)
    _assert_window_invariant(live, {n: r for n, (r, _ok) in union0.items()})

    # AFTER: drop a synthetic fresh record certifying the current window.
    green = {
        "rows_match": True, "schema_match": True, "hash_match": True,
        "spark_rows": 1, "oracle_rows": 1, "err": None,
    }
    path = tmp_path / f"CORRECTNESS_r{nxt}.json"
    path.write_text(json.dumps({n: green for n in live[:50]}))
    union1 = Q._correctness_union(root=str(tmp_path))
    rotated = [n for n in Q.flagship_order(union=union1) if n in Q.TEMPLATES]
    _assert_window_invariant(rotated, {n: r for n, (r, _ok) in union1.items()})
    # the just-certified 50 are demoted out of the window...
    assert not (set(live[:50]) & set(rotated[:50]))
    # ...and the previously-next-stalest names are promoted into it.
    assert rotated[:50] == live[50:100]
    # a FAILING record forces the name back in front of stale entries
    bad = dict(green, hash_match=False)
    path.write_text(json.dumps({**{n: green for n in live[:50]}, live[0]: bad}))
    union2 = Q._correctness_union(root=str(tmp_path))
    refail = [n for n in Q.flagship_order(union=union2) if n in Q.TEMPLATES]
    assert refail[0] == live[0]
    # the live root was never touched
    assert sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")) == paths


def test_bigram_logprob_short_doc_guard(spark):
    """Regression (ADVICE r3 medium): a doc with <2 tokens makes word_ngrams
    fall back to a single-element space-free 'bigram', whose second-word
    lookup throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark ANSI mode
    while DuckDB returns '' — engine divergence. The LIKE '% %' guard must
    drop such docs on BOTH engines."""
    import duckdb

    rows = [(0, "solo"), (4, ""), (8, "a normal multi word document here"),
            (12, "two words two words again")]
    try:
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING") \
            .createOrReplaceTempView("documents")
        got = spark.sql(Q.TEMPLATES["bigram_logprob_quality"]("spark")).collect()
        spark_ids = sorted(r["doc_id"] for r in got)
        assert spark_ids == [8, 12]  # short/empty docs guarded out, no throw

        duck = duckdb.connect()
        duck.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        oracle_ids = sorted(
            r[0] for r in
            duck.sql(Q.TEMPLATES["bigram_logprob_quality"]("duck")).fetchall())
        assert oracle_ids == spark_ids
    finally:
        # un-poison the shared session: drop the fake view and forget the
        # registration state so the next caller re-registers real testdata
        spark.catalog.dropTempView("documents")
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)


def test_register_views_repoints_all_on_sf_dir_change(spark):
    """Regression (ADVICE r3 low): switching sf_dir while requesting only a
    subset of tables must re-point EVERY previously tracked view — a stale
    view silently serving the old directory's data is a wrong-answer bug."""
    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    try:
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)
        Q.register_views(spark, sf_a, tables=("orders",))
        n_a = spark.table("orders").count()
        Q.register_views(spark, sf_b, tables=("nation",))  # orders NOT requested
        n_b = spark.table("orders").count()
        assert n_b != n_a, "orders view still serves the old sf_dir"
        import pyarrow.parquet as pq
        assert n_b == pq.read_metadata(f"{sf_b}/orders.parquet").num_rows
    finally:
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)


def test_dp_noisy_counts_csprng_variant(spark):
    """The real-noise DP twin: OS-entropy Laplace noise per Arrow batch.
    Invariants (it has no oracle by design): schema + mechanism flag, counts
    are non-negative integers, the noise is bounded in probability around
    the true counts, and two runs actually differ (it would be seeded-hash
    demo noise otherwise)."""
    sf = "/root/testdata/sf0.001"
    out1 = Q.dp_noisy_counts_csprng(spark, sf, epsilon=1.0).collect()
    out2 = Q.dp_noisy_counts_csprng(spark, sf, epsilon=1.0).collect()
    assert out1 and len(out1) == len(out2)
    assert out1[0].mechanism == "laplace-csprng eps=1.0"
    assert all(r.noisy_count >= 0 for r in out1)
    exact = {(r.source, r.lang): r.n for r in spark.sql(
        "SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang").collect()}
    # P(|Laplace(1)| > 40) ~ 2e-18 per row: a deviation this large means broken noise
    assert all(abs(r.noisy_count - exact[(r.source, r.lang)]) < 40 for r in out1)
    assert {(r.source, r.lang, r.noisy_count) for r in out1} != \
           {(r.source, r.lang, r.noisy_count) for r in out2}, "noise did not vary across runs"


def test_dp_noisy_counts_demo_flagged_in_output():
    """The seeded-hash variant must carry its caveat in the DATA: every row's
    mechanism column says it is demo noise, not DP."""
    sql = Q.TEMPLATES["dp_noisy_counts"]("duck")
    import duckdb

    duck = duckdb.connect()
    duck.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'")
    rows = duck.sql(sql).fetchall()
    assert rows and all("NOT differentially private" in r[-1] for r in rows)


def test_rows_only_entries_hardened(spark):
    """Every rows-only registry entry must be hardened: either a full-oracle
    twin exercises the same operator (ORACLE_TWINS) or the query emits
    in-query invariant columns (SELF_AUDITED) — and those invariants must
    actually hold on testdata."""
    assert set(Q.NON_ORACLE) == set(Q.ORACLE_TWINS) | set(Q.SELF_AUDITED)
    for rows_only, twin in Q.ORACLE_TWINS.items():
        assert twin in Q.TEMPLATES, f"{rows_only}'s twin {twin} is not oracle-backed"
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    for name, col in Q.SELF_AUDITED.items():
        rows = Q.NON_ORACLE[name](spark, SF).collect()
        assert rows, name
        if name == "multimodal_features" and has_pil:
            # with a real codec the sha-relation audit doesn't apply: the
            # query emits NULL by design, which is correct, not a failure
            assert all(r[col] is None for r in rows)
            continue
        assert all(r[col] for r in rows), f"{name}: invariant column {col} is false"


def test_kl_divergence_algebraic_equals_naive():
    """kl_divergence_by_source avoids the source x vocab outer join with an
    algebraic absent-mass correction; this proves the shortcut equals the
    NAIVE full-support KL (explicit outer join over the whole vocab) to
    1e-6 on real testdata."""
    import duckdb

    duck = duckdb.connect()
    duck.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = {r[0]: r[1] for r in duck.sql(Q.TEMPLATES["kl_divergence_by_source"]("duck")).fetchall()}

    from oaim_sandbox_spark.functions import portable as P

    toks = P.tokens("text", "duck")
    naive = duck.sql(f"""
WITH tk AS (SELECT source, unnest({toks}) AS tok FROM documents),
sc AS (SELECT source, tok, CAST(COUNT(*) AS DOUBLE) AS c FROM tk GROUP BY source, tok),
corp AS (SELECT tok, CAST(SUM(c) AS DOUBLE) AS c FROM sc GROUP BY tok),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vocab, CAST(SUM(c) AS DOUBLE) AS total FROM corp),
st AS (SELECT source, CAST(SUM(c) AS DOUBLE) AS tot FROM sc GROUP BY source),
grid AS (
  SELECT st.source,
         (COALESCE(sc.c, 0) + 1.0) / (st.tot + v.vocab) AS p,
         (corp.c + 1.0) / (v.total + v.vocab) AS q
  FROM st CROSS JOIN corp CROSS JOIN v
  LEFT JOIN sc ON sc.source = st.source AND sc.tok = corp.tok
)
SELECT source, SUM(p * ln(p / q)) FROM grid GROUP BY source
""").fetchall()
    assert len(naive) == len(got)
    for source, kl in naive:
        assert abs(got[source] - kl) < 1e-6, (source, got[source], kl)


def _with_fake_documents(spark, rows, schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"):
    """Context helper: install a literal documents view, un-poison after."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        try:
            spark.createDataFrame(rows, schema).createOrReplaceTempView("documents")
            yield
        finally:
            spark.catalog.dropTempView("documents")
            if Q._VIEWS_STATE is not None:
                Q._VIEWS_STATE.pop(spark, None)

    return cm()


def test_doc_len_approx_contract_small_groups(spark):
    """Regression (round-4 review): a 2-doc language used to fail the old
    interpolated-value bracket (approx p50 is an ORDER STATISTIC; the
    [p45,p55] interpolation excludes every actual value). The rank-based
    contract must hold for arbitrarily small groups and total ties."""
    rows = [(1, "t", "xx", "s", 100), (2, "t", "xx", "s", 101),         # the repro pair
            (3, "t", "yy", "s", 7), (4, "t", "yy", "s", 7), (5, "t", "yy", "s", 7),  # all-ties
            (6, "t", "zz", "s", 42)]                                     # singleton
    with _with_fake_documents(spark, rows):
        got = spark.sql(Q.TEMPLATES["doc_len_percentiles_approx"]("spark")).collect()
    assert len(got) == 3
    for r in got:
        assert r.p50_within and r.p90_within and r.p99_within, r


def test_zipf_degenerate_langs_null_not_throw(spark):
    """Regression (round-4 review): a lang whose top tokens all share one
    count zeroes the r2 denominator — Spark ANSI mode threw DIVIDE_BY_ZERO
    while DuckDB returned NULL. Both degenerate shapes must yield NULL."""
    import duckdb

    rows = [(1, "aaa bbb ccc ddd", "uniform", "s", 15),   # every token count = 1
            (2, "tok tok tok tok", "single", "s", 15)]    # one distinct token
    with _with_fake_documents(spark, rows):
        got = {r.lang: r for r in spark.sql(Q.TEMPLATES["zipf_alpha_by_lang"]("spark")).collect()}
    assert got["uniform"].r2 is None           # no y variance
    assert got["single"].zipf_alpha is None    # no x variance
    duck = duckdb.connect()
    duck.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    duck.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    oracle = {r[0]: r for r in duck.sql(Q.TEMPLATES["zipf_alpha_by_lang"]("duck")).fetchall()}
    assert oracle["uniform"][3] is None and oracle["single"][2] is None


def test_mad_approx_contract_small_gapped_groups(spark):
    """Regression (round-4 review): a 4-row event type with values 0..3 made
    the old interpolated med bracket exclude the sketch's order-statistic
    median. The rank contract must hold on tiny, gapped, and tied groups."""
    rows = [(1, 1, "a", 0.0, 1), (2, 1, "a", 1.0, 2), (3, 1, "a", 2.0, 3), (4, 1, "a", 3.0, 4),
            (5, 1, "b", 7.0, 5), (6, 1, "b", 7.0, 6), (7, 1, "b", 7.0, 7),
            (8, 1, "c", 42.0, 8)]
    try:
        spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts_us BIGINT"
        ).createOrReplaceTempView("events")
        got = spark.sql(Q.TEMPLATES["mad_outliers_approx"]("spark")).collect()
    finally:
        spark.catalog.dropTempView("events")
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)
    assert len(got) == 3
    for r in got:
        assert r.med_within and r.mad_within, r


def test_split_leakage_counts_both_eval_members(spark):
    """Regression (round-4 review): a val<->test leaking pair taints BOTH
    members; the old one-sided CASE counted only doc_a. doc_ids 0/1 hash to
    'val', 4/12 to 'test' under the query's split assignment."""
    txt = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho " * 4
    other = "completely different words live here entirely apart " * 5
    rows = [(0, txt, "xx", "s", len(txt)),      # val
            (4, txt, "xx", "s", len(txt)),      # test  -> leak pair (0, 4)
            (1, other, "xx", "s", len(other)),  # val
            (12, other, "xx", "s", len(other))]  # test -> leak pair (1, 12)
    with _with_fake_documents(spark, rows):
        got = {(r.split_lo, r.split_hi): r for r in
               spark.sql(Q.TEMPLATES["split_leakage_check"]("spark")).collect()}
    r = got[("test", "val")]
    assert r.n_leaked_pairs == 2
    assert r.n_tainted_eval_docs == 4  # all four docs are eval members


def test_no_duplicate_toplevel_defs_in_queries():
    """Guard against the round-4 shadowing hazard: a second top-level `def`
    with the same name silently replaces an earlier (possibly certified)
    query template. Assert every top-level function in queries.py is defined
    exactly once, and every TEMPLATES entry binds a function whose name maps
    to that single definition site."""
    import ast
    import glob
    import os
    from collections import Counter

    # post-split, the registry spans the family modules: a duplicate def
    # WITHIN one module is the original shadowing hazard, and the same name
    # defined in TWO modules shadows through the star-import chain — count
    # across all queries*.py files
    names: Counter = Counter()
    qdir = os.path.dirname(Q.__file__)
    for path in sorted(glob.glob(os.path.join(qdir, "queries*.py"))):
        tree = ast.parse(open(path).read())
        names.update(
            n.name for n in tree.body if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        )
    # ...and module-level NAME assignments (constants, runner tables): a
    # same-named assignment in two modules would resolve differently via
    # the star-import chain vs __getattr__ delegation if the orders ever
    # diverged (ADVICE r6) — forbid the collision outright. Subscript
    # assignments (TEMPLATES["x"] = ...) are registrations, not bindings.
    for path in sorted(glob.glob(os.path.join(qdir, "queries*.py"))):
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if isinstance(node, ast.Assign):
                names.update(t.id for t in node.targets if isinstance(t, ast.Name))
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                names.update([node.target.id])
    names.pop("__getattr__", None)  # the assembly module's delegation hook
    dupes = sorted(n for n, c in names.items() if c > 1)
    assert not dupes, f"duplicate top-level defs/assigns across queries modules: {dupes}"
    # every registered template's underlying function is a module-level def
    # (or a documented closure); its __name__ must not be multiply defined
    for key, fn in Q.TEMPLATES.items():
        assert names.get(fn.__name__, 0) <= 1, (key, fn.__name__)


def test_tfidf_cosine_planted_pair_and_maxdf_pruning(spark):
    """tfidf_cosine_pairs semantics on a crafted corpus, both engines:
    (1) an identical doc pair scores exactly 1.0; (2) a doc sharing nothing
    beyond singleton trigrams produces NO pair row (singletons stay in the
    norms but cannot join); (3) a boilerplate phrase present in EVERY doc is
    max_df-pruned, so boilerplate alone never links a pair."""
    boiler = "the same old footer text appears here"
    fill = [f"unique{w} filler{w} token{w} word{w} extra{w}" for w in range(24)]
    rows = [(i, f"{fill[i]} {boiler}") for i in range(24)]
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta theta"))
    try:
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING") \
            .createOrReplaceTempView("documents")
        got = spark.sql(Q.TEMPLATES["tfidf_cosine_pairs"]("spark")).collect()
        pairs = {(r["doc_a"], r["doc_b"]): r["tfidf_cosine"] for r in got}
        # identical pair present at exactly 1.0
        assert pairs.get((100, 101)) == 1.0
        # boilerplate trigrams have df=24 > max(5, 0.05*26): pruned, so the
        # filler docs share NOTHING in the vector space — no other pair
        assert set(pairs) == {(100, 101)}, pairs

        duck = duckdb.connect()
        duck.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        oracle = {(r[0], r[1]): r[2] for r in
                  duck.sql(Q.TEMPLATES["tfidf_cosine_pairs"]("duck")).fetchall()}
        assert oracle == pairs
    finally:
        spark.catalog.dropTempView("documents")
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)


def test_event_corr_matrix_perfect_and_anti_correlation(spark):
    """event_corr_matrix on a crafted stream: type b's hourly volume equals
    type a's (corr exactly 1.0), type c's runs opposite (corr -1.0), and
    densification counts every hour for every pair even though type c is
    absent from hour 0 entirely (cnt densified to 0, not dropped)."""
    rows = []
    eid = 0
    for hr in range(6):
        for _ in range(hr + 1):          # a: 1,2,3,4,5,6
            rows.append((eid, hr * 3_600_000_000, "a")); eid += 1
            rows.append((eid, hr * 3_600_000_000, "b")); eid += 1
        for _ in range(5 - hr):          # c: 5,4,3,2,1,0 — absent in hr 5
            rows.append((eid, hr * 3_600_000_000, "c")); eid += 1
    try:
        spark.createDataFrame(rows, "event_id BIGINT, ts_us BIGINT, event_type STRING") \
            .createOrReplaceTempView("events")
        got = spark.sql(Q.TEMPLATES["event_corr_matrix"]("spark")).collect()
        m = {(r["type_a"], r["type_b"]): (r["n_hours"], r["hourly_corr"]) for r in got}
        assert m[("a", "b")] == (6, 1.0)
        assert m[("a", "c")] == (6, -1.0)
        assert m[("b", "c")] == (6, -1.0)
        assert set(m) == {("a", "b"), ("a", "c"), ("b", "c")}
    finally:
        spark.catalog.dropTempView("events")
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)


def test_tfidf_sampled_exact_when_df_under_c(spark):
    """tfidf_cosine_sampled: every term with df <= C survives sampling with
    p = 1, so on a corpus whose max df <= C the estimator IS the exact
    computation — mae 0 and coverage 1 in every bucket, on both engines.
    (The sf corpora have df tails beyond C, where the audit shows real
    error; this pins the degenerate-exact contract.)"""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "iota kappa lam mu nu xi omicron pi rho sigma"),
        (4, "iota kappa lam mu nu xi omicron pi tau upsilon"),
    ]
    try:
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING") \
            .createOrReplaceTempView("documents")
        got = spark.sql(Q.TEMPLATES["tfidf_cosine_sampled"]("spark")).collect()
        assert got, "expected at least the identical pair's bucket"
        for r in got:
            assert r["mae"] == 0.0 and r["coverage"] == 1.0
            assert r["mean_est"] == r["mean_exact"]

        duck = duckdb.connect()
        duck.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        oracle = duck.sql(Q.TEMPLATES["tfidf_cosine_sampled"]("duck")).fetchall()
        assert sorted(tuple(r) for r in oracle) == sorted(
            (r["bucket"], r["n_pairs"], r["mean_exact"], r["mean_est"], r["mae"], r["coverage"])
            for r in got
        )
    finally:
        spark.catalog.dropTempView("documents")
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)


def test_embedding_drift_psi_null_and_injected_shift(spark):
    """Calibration (null) case: the parity split of one snapshot must read
    'stable' (total PSI under 0.1) at every bucket row. Positive case:
    adding a constant bias to every 'cur' vector drives each hyperplane dot
    product toward the sign of that plane's coefficient sum, collapsing the
    current mass into few buckets — the verdict must cross to 'shifted'
    with a much larger total PSI. (A pure negation would NOT register: it
    permutes buckets to their complements, and PSI is invariant when the
    bucket distribution is roughly complement-symmetric — the bias is the
    honest "the embedding model changed" simulation.)"""
    sf = "/root/testdata/sf0.001"
    base = Q.spark_queries()["embedding_drift_psi"](spark, sf).collect()
    assert len(base) == 8
    assert all(r["verdict"] == "stable" and r["psi_total"] < 0.1 for r in base)
    # shares are smoothed probabilities over the full bucket grid: sum ~ 1
    assert abs(sum(r["ref_share"] for r in base) - 1.0) < 1e-4  # 6dp rounding x 8 buckets
    # override the embeddings view with a bias-shifted 'cur' half and re-run
    spark.read.parquet(f"{sf}/embeddings.parquet").createOrReplaceTempView("emb_raw")
    spark.sql(
        """SELECT vec_id, label,
                  CASE WHEN vec_id % 2 = 0 THEN embedding
                       ELSE transform(cast(embedding as array<double>), x -> x + 3.0D) END AS embedding
           FROM emb_raw"""
    ).createOrReplaceTempView("embeddings")
    try:
        shifted = spark.sql(Q.TEMPLATES["embedding_drift_psi"]("spark")).collect()
    finally:
        spark.catalog.dropTempView("embeddings")
        spark.catalog.dropTempView("emb_raw")
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)
    assert all(r["verdict"] == "shifted" for r in shifted)
    assert shifted[0]["psi_total"] > 10 * base[0]["psi_total"]


def test_weak_label_vote_downweights_discordant_signal(spark):
    """The agreement-weighting property that distinguishes the vote from a
    plain AND of filters: every weight lies in [0,1], weights are global
    (identical on every source row), and the signal most discordant with
    the leave-one-out consensus (s_stop on this corpus — the tiny stopword
    lists miss many languages) gets a weight far below the concordant
    signals, so it cannot veto the vote."""
    rows = Q.spark_queries()["weak_label_vote"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    wcols = [c for c in rows[0].asDict() if c.startswith("w_")]
    assert len(wcols) == 5
    for c in wcols:
        vals = {r[c] for r in rows}
        assert len(vals) == 1, f"weight {c} differs across sources"
        assert 0.0 <= vals.pop() <= 1.0
    w = {c: rows[0][c] for c in wcols}
    concordant = [v for c, v in w.items() if c != "w_s_stop"]
    assert w["w_s_stop"] < min(concordant) / 2
    for r in rows:
        assert 0.0 <= r["pass_rate"] <= 1.0 and 0.0 <= r["mean_vote"] <= 1.0


def test_unimax_waterfill_saturates_small_domains(spark):
    """Water-filling property on a skewed corpus the uniform testdata can't
    exercise: domains smaller than the water level are fully allocated
    (epochs = 1.0), larger ones sit exactly at one shared level, and the
    total allocation equals the integer budget (total*2 div 5)."""
    rows = []
    did = 0
    for src, n_docs, words in (("tiny", 2, 5), ("small", 4, 20), ("big", 40, 200), ("huge", 80, 200)):
        for i in range(n_docs):
            rows.append((did, " ".join(f"w{j}" for j in range(words)), "en", src, words))
            did += 1
    try:
        spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT") \
            .createOrReplaceTempView("documents")
        got = {r["source"]: r for r in
               spark.sql(Q.TEMPLATES["unimax_budget_allocation"]("spark")).collect()}
    finally:
        spark.catalog.dropTempView("documents")
        if Q._VIEWS_STATE is not None:
            Q._VIEWS_STATE.pop(spark, None)
    avail = {s: r["avail_tokens"] for s, r in got.items()}
    budget = sum(avail.values()) * 2 // 5
    assert abs(sum(r["allocated_tokens"] for r in got.values()) - budget) < 0.01
    # tiny + small saturate (their capacity is under the level), big/huge don't
    assert got["tiny"]["epochs"] == 1.0 and got["small"]["epochs"] == 1.0
    assert got["tiny"]["allocated_tokens"] == avail["tiny"]
    level = got["big"]["water_level"]
    assert got["big"]["allocated_tokens"] == got["huge"]["allocated_tokens"] == level
    assert got["big"]["epochs"] < 1.0 and got["huge"]["epochs"] < got["big"]["epochs"]
