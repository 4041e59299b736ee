"""Relational suite: TPC-H-shaped analytics, event-time windows/sessions,
retrieval top-k, as-of/range joins — SURVEY §2.1-2.7 dual-dialect templates."""

from __future__ import annotations

from oaim_sandbox_spark.functions import portable as P
from oaim_sandbox_spark.operators import text_analysis as TA
from oaim_sandbox_spark.queries_core import (
    ALL_TABLES,
    EMBED_DIM,
    _dec,
    _elem,
    _idiv,
    _str,
    _ts_us,
    events_batch,
    events_stream,
    register_views,
)
from oaim_sandbox_spark.operators.ann import hyperplane_expr
from oaim_sandbox_spark.operators.retrieval import distance_expr, score_expr


# ---------------------------------------------------------------------------
# Query templates: name -> fn(dialect) -> SQL string (runs on both engines).
# ---------------------------------------------------------------------------


def q1_pricing_summary(d: str) -> str:
    """TPC-H Q1 shape — grouped aggregation with exact decimal sums (A1-A5
    operator class; SURVEY §2.5). Catalyst: partial aggregation map-side, one
    shuffle on the 4-value group key; scan prunes to 7 columns."""
    disc_price = f"{_dec('l_extendedprice')} * (1 - {_dec('l_discount', 5, 2)})"
    charge = f"{disc_price} * (1 + {_dec('l_tax', 5, 2)})"
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_dec('l_quantity')}) AS DOUBLE)        AS sum_qty,
       CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE)   AS sum_base_price,
       CAST(SUM({disc_price}) AS DOUBLE)                AS sum_disc_price,
       CAST(SUM({charge}) AS DOUBLE)                    AS sum_charge,
       round(CAST(SUM({_dec('l_quantity')}) AS DOUBLE) / COUNT(*), 6)      AS avg_qty,
       round(CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       round(CAST(SUM({_dec('l_discount', 5, 2)}) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(d: str) -> str:
    """TPC-H Q3 shape — 3-way join + agg + deterministic top-10 (J3 + T1
    classes). Catalyst broadcasts the filtered customer side under AQE."""
    revenue = f"SUM({_dec('l_extendedprice')} * (1 - {_dec('l_discount', 5, 2)}))"
    return f"""
SELECT o.o_orderkey, CAST({revenue} AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(d: str) -> str:
    """TPC-H Q5 shape — 6-way star join with co-located nation keys (J1/J3).
    region/nation/supplier are broadcast-size at any SF; the orders-lineitem
    join shuffles on orderkey."""
    revenue = f"SUM({_dec('l_extendedprice')} * (1 - {_dec('l_discount', 5, 2)}))"
    return f"""
SELECT n.n_name, CAST({revenue} AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


def anti_join_merge(d: str) -> str:
    """K2/J2 class — the reference's NOT-EXISTS merge (embedding.py:352-359)
    as a left-anti join: customers with no open ('O') order. At 100 TB the
    anti-join shuffles only the key column projections."""
    return """
SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 6) AS acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
)
ORDER BY c.c_custkey
"""


def catalog_scan_events(d: str) -> str:
    """S13/T4 class — filtered, ordered catalog scan (testbed.py:101-141
    shape): latest 100 error events. Filter+projection push to the scan;
    ORDER+LIMIT compiles to TakeOrderedAndProject."""
    return f"""
SELECT event_id, {_ts_us(d)} AS ts_us, user_id, round(value, 6) AS value
FROM events
WHERE event_type = 'error'
ORDER BY ts_us DESC, event_id ASC
LIMIT 100
"""


def events_json_props(d: str) -> str:
    """§2.8 JSON scalar functions (reference json.loads paths): extract
    props.k per event type, aggregate. JSON parse stays JVM-side
    (get_json_object) — no Python."""
    k = (
        "CAST(get_json_object(props, '$.k') AS BIGINT)"
        if d == "spark"
        else "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    )
    return f"""
SELECT event_type,
       CAST(SUM({k}) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM({k}) AS DOUBLE) / COUNT(*), 6) AS avg_k
FROM events
GROUP BY event_type
"""


def events_hourly_windows(d: str) -> str:
    """§2.9 — tumbling 1-hour windowed aggregation, the batch twin of the
    Structured Streaming ingest path (streaming/ingest.py runs the same agg
    with a watermark). Window id = epoch-micros div 3.6e9."""
    return f"""
SELECT {_idiv(_ts_us(d), '3600000000', d)} AS hour_id,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def user_activity_sessions(d: str) -> str:
    """Sessionization-shaped window-function query (lag + gap flag): per-user
    event ordering with 30-minute session breaks — the batch form of
    stateful-streaming sessionization. Shuffles once on user_id."""
    return f"""
SELECT user_id, event_id, ts_us,
       CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS session_start
FROM (
  SELECT user_id, event_id, {_ts_us(d)} AS ts_us,
         lag({_ts_us(d)}) OVER (PARTITION BY user_id ORDER BY {_ts_us(d)}, event_id) AS prev_us
  FROM events
) t
WHERE user_id < 50
ORDER BY user_id, ts_us, event_id
"""


def chunk_ids_window(d: str) -> str:
    """P6 metadata projection — 1-based per-source chunk index, reference id
    scheme f"{file}_{idx}" (embedding.py:78-89). Window partitioned by source
    (small groups -> well-distributed shuffle)."""
    rn = _str("row_number() OVER (PARTITION BY source ORDER BY doc_id)", d)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       source || '_' || {rn} AS chunk_ref
FROM documents
"""


def split_fixed_chunks(d: str) -> str:
    """P1/P4 — fixed-stride chunking (size=200, overlap=20 -> stride=180)
    entirely in SQL (explode/unnest of a generated sequence): chunk id is
    1-based per doc (reference parity), start_index 0-based. Narrow op — the
    Spark plan has no shuffle."""
    size, stride = 200, 180
    cid = _str("doc_id", d) + " || '_' || " + _str(f"{_idiv('c.start_index', str(stride), d)} + 1", d)
    head = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {cid} AS chunk_id,
       CAST(c.start_index AS INT) AS start_index,
       c.chunk AS chunk_text
"""
    if d == "spark":
        gen = (
            f"explode(transform(sequence(0, cast(floor((length(text) - 1) / {stride}) as int)), "
            f"i -> struct(cast(i * {stride} as bigint) as start_index, substr(text, i * {stride} + 1, {size}) as chunk)))"
        )
        # length(text) > 0: Spark's sequence(0, -1) DESCENDS (two phantom
        # chunks per empty doc) while DuckDB's generate_series is empty —
        # filter empties so both engines emit zero chunks for them
        return head + f"FROM (SELECT doc_id, text, {gen} AS c FROM documents WHERE length(text) > 0) t"
    return head + f"""
FROM (
  SELECT doc_id,
         unnest(list_transform(generate_series(0, CAST(floor((length(text) - 1) / {stride}) AS INT)),
                i -> struct_pack(start_index := CAST(i * {stride} AS BIGINT), chunk := substr(text, i * {stride} + 1, {size})))) AS c
  FROM documents
) t
"""


def dedup_exact_first(d: str) -> str:
    """P7 — exact dedup keeping first occurrence in doc_id order
    (reference embedding.py:297-304 keeps first in file order). Group key is
    the text fingerprint, not the text (8-byte shuffle keys at scale)."""
    fp = TA.fingerprint_sql("text", d)
    return f"""
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, {P.hash64('text', d)} AS text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY {P.hash64('text', d)}, {fp}
"""


def vs_merge_content_ids(d: str) -> str:
    """K2 + content-addressed ids (§2.8: sha2(text,256) like OracleVS chunk
    ids): rows of the odd-doc half not already present (by content id) in the
    even-doc half — the idempotent-merge anti-join on a derived store."""
    cid = "sha2(text, 256)" if d == "spark" else "sha256(text)"
    return f"""
WITH existing AS (SELECT {cid} AS id FROM documents WHERE doc_id % 2 = 0),
     incoming AS (SELECT {cid} AS id, doc_id FROM documents WHERE doc_id % 2 = 1)
SELECT i.id AS id, CAST(i.doc_id AS BIGINT) AS doc_id
FROM incoming i
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.id = i.id)
ORDER BY doc_id
"""


def mock_embed_dims(d: str) -> str:
    """P9 — deterministic mock embedder (FIXTURES.md §3) as a JVM expression,
    unnested to scalar rows so values hash-compare exactly. 8 dims of the
    first 50 docs keeps the check tight and cheap."""
    vec = P.mock_embed("text", 8, d)
    if d == "spark":
        return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(p.i AS INT) AS dim_idx, round(p.v, 6) AS v
FROM documents
LATERAL VIEW posexplode({vec}) p AS i, v
WHERE doc_id < 50
"""
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(u.i - 1 AS INT) AS dim_idx,
       round(u.v, 6) AS v
FROM (
  SELECT doc_id, unnest(list_transform(list_zip({vec}, generate_series(1, 8)), z -> struct_pack(v := z[1], i := z[2]))) AS u
  FROM documents WHERE doc_id < 50
) t
"""


def _topk_template(d: str, metric: str, k: int = 10, threshold: float | None = None) -> str:
    """T1/T2 — exact top-k against the query vector = embeddings[vec_id=0].
    Spark plan: broadcast 1-row side + TakeOrderedAndProject (no shuffle of
    the store)."""
    dist = distance_expr("e.embedding", P.to_double_array("q.qv", d), metric, d)
    base = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, round({dist}, 6) AS distance
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> 0
"""
    if threshold is None:
        return base + f"ORDER BY distance ASC, vec_id ASC LIMIT {k}"
    score = score_expr("distance", metric)
    return (
        f"SELECT vec_id, distance, round({score}, 6) AS score FROM ({base}) s "
        f"WHERE round({score}, 6) >= {threshold} ORDER BY distance ASC, vec_id ASC LIMIT {k}"
    )


def topk_cosine(d: str) -> str:
    return _topk_template(d, "COSINE")


def topk_euclidean(d: str) -> str:
    return _topk_template(d, "EUCLIDEAN_DISTANCE")


def topk_dot_product(d: str) -> str:
    """Oracle DOT_PRODUCT distance = negated inner product — parity case
    called out in SURVEY §2.6."""
    return _topk_template(d, "DOT_PRODUCT")


def topk_score_threshold(d: str) -> str:
    return _topk_template(d, "COSINE", k=10, threshold=0.55)


def filtered_topk_label(d: str) -> str:
    """Metadata-filtered vector search (the P12 facet filter pushed INTO
    retrieval): exact cosine top-k restricted to label = 2 — PRE-filter
    semantics, so exactly k of the matching rows come back (post-filtering
    an unfiltered top-k under-returns). This is the oracle for the filtered
    ANN path (IVFIndex.search/search_batch `where=` — same predicate applied
    to the pruned partition scan as a parquet PushedFilter; equivalence
    tested in tests/test_ann.py)."""
    dist = distance_expr("e.embedding", P.to_double_array("q.qv", d), "COSINE", d)
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, CAST(e.label AS INT) AS label, round({dist}, 6) AS distance
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> 0 AND e.label = 2
ORDER BY distance ASC, vec_id ASC LIMIT 10
"""


def rag_topk_mock_query(d: str) -> str:
    """End-to-end T1 with the mock embedder: embed a query STRING, retrieve
    top-5 document chunks by cosine over mock-embedded documents — the
    flagship retrieval path (§3.1 step c) without any network."""
    qvec = P.mock_embed("'spark vector search'", EMBED_DIM, d)
    dvec = P.mock_embed("text", EMBED_DIM, d)
    dist = P.cosine_distance(dvec, qvec, d)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, round({dist}, 6) AS distance
FROM documents
ORDER BY distance ASC, doc_id ASC
LIMIT 5
"""


def knn_join_batch(d: str) -> str:
    """Batched exact k-NN join (ANN baseline): every 97th vector queries the
    whole store; per-query top-5 via rank window. ONE scan answers all
    queries; the window shuffles only (query_id, neighbor_id, distance)."""
    dist = distance_expr("e.embedding", P.to_double_array("q.qv", d), "COSINE", d)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 97 = 0)
SELECT query_id, neighbor_id, rank, distance
FROM (
  SELECT query_id, neighbor_id, distance,
         row_number() OVER (PARTITION BY query_id ORDER BY distance ASC, neighbor_id ASC) AS rank
  FROM (
    SELECT q.query_id AS query_id, e.vec_id AS neighbor_id, round({dist}, 6) AS distance
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
  ) s
) t
WHERE rank <= 5
"""


def lsh_ann_topk(d: str) -> str:
    """Approximate k-NN via random-hyperplane LSH buckets (the 100 TB scale
    path: hash join on bucket instead of a full cross join). Hyperplanes are
    portable-hash constants, so DuckDB reproduces the buckets exactly."""
    bucket_e = hyperplane_expr("e.embedding", 6, EMBED_DIM, d)
    bucket_q = hyperplane_expr("q.qv", 6, EMBED_DIM, d)
    dist = distance_expr("e.embedding", P.to_double_array("q.qv", d), "COSINE", d)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 191 = 0)
SELECT query_id, neighbor_id, rank, distance
FROM (
  SELECT query_id, neighbor_id, distance,
         row_number() OVER (PARTITION BY query_id ORDER BY distance ASC, neighbor_id ASC) AS rank
  FROM (
    SELECT q.query_id AS query_id, e.vec_id AS neighbor_id, round({dist}, 6) AS distance
    FROM embeddings e JOIN q ON {bucket_e} = {bucket_q}
    WHERE e.vec_id <> q.query_id
  ) s
) t
WHERE rank <= 3
"""


def lsh_multiprobe_topk(d: str) -> str:
    """Multi-probe LSH k-NN: probe the exact bucket PLUS every Hamming-1
    neighbor (flip one of the 6 hyperplane bits → 7 probes/query), the
    standard recall lift that avoids building more tables — candidates grow
    ~7x but stay bucket-bounded, nothing like a full scan. Probes explode
    from the query side (tiny), the store side still hash-joins on its ONE
    bucket value, so each store row is matched by at most one probe — no
    candidate dedup needed. Deterministic hyperplanes keep it oracle-exact."""
    n_planes = 6
    bucket_e = hyperplane_expr("e.embedding", n_planes, EMBED_DIM, d)
    bucket_q = hyperplane_expr("embedding", n_planes, EMBED_DIM, d)
    dist = distance_expr("e.embedding", P.to_double_array("p.qv", d), "COSINE", d)
    if d == "spark":
        flips = ", ".join(f"qb ^ {1 << i}" for i in range(n_planes))
        probes = (
            f"SELECT query_id, qv, probe FROM q "
            f"LATERAL VIEW explode(array(qb, {flips})) t AS probe"
        )
    else:
        flips = ", ".join(f"xor(qb, {1 << i})" for i in range(n_planes))
        probes = f"SELECT query_id, qv, unnest([qb, {flips}]) AS probe FROM q"
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, {bucket_q} AS qb
  FROM embeddings WHERE vec_id % 191 = 0
),
probes AS ({probes})
SELECT query_id, neighbor_id, rank, distance
FROM (
  SELECT query_id, neighbor_id, distance,
         row_number() OVER (PARTITION BY query_id ORDER BY distance ASC, neighbor_id ASC) AS rank
  FROM (
    SELECT p.query_id AS query_id, e.vec_id AS neighbor_id, round({dist}, 6) AS distance
    FROM embeddings e JOIN probes p ON {bucket_e} = p.probe
    WHERE e.vec_id <> p.query_id
  ) s
) t
WHERE rank <= 3
"""


def asof_clicks_before_errors(d: str) -> str:
    """As-of join (beyond the reference, SURVEY §2.4 gap): each error event
    paired with the user's most recent preceding click — union-the-streams +
    last-value window, ONE shuffle on user_id (operators/relational.asof_join
    is the DataFrame twin)."""
    return f"""
WITH tagged AS (
  SELECT user_id, {_ts_us(d)} AS ts_us, event_id, event_type
  FROM events WHERE event_type IN ('error', 'click')
)
SELECT user_id, event_id, ts_us, prev_click_us, CAST(ts_us - prev_click_us AS BIGINT) AS gap_us
FROM (
  SELECT *, max(CASE WHEN event_type = 'click' THEN ts_us END) OVER (
    PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_us
  FROM tagged
) t
WHERE event_type = 'error' AND prev_click_us IS NOT NULL
ORDER BY user_id, ts_us, event_id
"""


def range_error_followups(d: str) -> str:
    """Range (interval) join: clicks within 5 minutes AFTER each error by the
    same user. Equi-key on user_id + range post-filter — the scalable interval
    join shape (operators/relational.range_join)."""
    return f"""
WITH e AS (SELECT user_id, event_id, {_ts_us(d)} AS ts_us FROM events WHERE event_type = 'error'),
c AS (SELECT user_id, {_ts_us(d)} AS ts_us FROM events WHERE event_type = 'click')
SELECT e.user_id AS user_id, e.event_id AS event_id, CAST(COUNT(c.ts_us) AS BIGINT) AS n_clicks_5m
FROM e LEFT JOIN c
  ON e.user_id = c.user_id AND c.ts_us > e.ts_us AND c.ts_us <= e.ts_us + 300000000
GROUP BY e.user_id, e.event_id
ORDER BY user_id, event_id
"""


def events_rollup(d: str) -> str:
    """ROLLUP grouping sets (absent from the reference entirely, §2.5 —
    Catalyst provides it natively): per (event_type, day) with subtotal and
    grand-total rows."""
    day = _idiv(_ts_us(d), "86400000000", d)
    return f"""
SELECT COALESCE(event_type, 'ALL') AS event_type_lvl,
       CAST(COALESCE(day_id, -1) AS BIGINT) AS day_lvl,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(day_id) AS INT) AS g_day,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, {day} AS day_id, value FROM events) t
GROUP BY ROLLUP(event_type, day_id)
"""


def ingest_chunks_dedup(d: str) -> str:
    """The M1 ingest core as ONE oracle-checked query: fixed-stride split ->
    chunk-level exact dedup (first occurrence by (doc_id, start_index)) ->
    content-addressed id (sha256). Mirrors bench.py's ingest_pipeline
    composite, §3.2 steps 2+5."""
    size, stride = 200, 180
    cid = "sha2(c.chunk, 256)" if d == "spark" else "sha256(c.chunk)"
    if d == "spark":
        gen = (
            f"explode(transform(sequence(0, cast(floor((length(text) - 1) / {stride}) as int)), "
            f"i -> struct(cast(i * {stride} as bigint) as start_index, substr(text, i * {stride} + 1, {size}) as chunk)))"
        )
        chunks = f"SELECT doc_id, c.start_index AS start_index, c.chunk AS chunk, {cid} AS id FROM (SELECT doc_id, text, {gen} AS c FROM documents) t"
    else:
        chunks = f"""
SELECT doc_id, c.start_index AS start_index, c.chunk AS chunk, {cid} AS id
FROM (
  SELECT doc_id, unnest(list_transform(generate_series(0, CAST(floor((length(text) - 1) / {stride}) AS INT)),
         i -> struct_pack(start_index := CAST(i * {stride} AS BIGINT), chunk := substr(text, i * {stride} + 1, {size})))) AS c
  FROM documents
) t"""
    return f"""
WITH chunks AS ({chunks})
SELECT id, CAST(MIN(doc_id * 1000000 + start_index) AS BIGINT) AS first_slot,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM chunks
GROUP BY id
"""


def vs_table_names_sql(d: str) -> str:
    """§2.8 scalar string functions — the get_vs_table normalization
    (upper + non-word -> '_', common/functions.py:60-63) as a SQL projection
    over per-source vector-store names."""
    raw = "'alias-' || source || '_mock.model_200_20_COSINE_HNSW'"
    if d == "spark":
        norm = f"upper(regexp_replace({raw}, '\\\\W', '_'))"
    else:
        norm = f"upper(regexp_replace({raw}, '\\W', '_', 'g'))"
    return f"""
SELECT DISTINCT source, {norm} AS vs_table
FROM documents
ORDER BY source
"""


def docs_union_distinct(d: str) -> str:
    """§2.7 set ops (the reference only concatenates JSONL test sets,
    endpoints.py:840-844): UNION-dedup of two document selections."""
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents WHERE doc_id % 2 = 0
UNION
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents WHERE n_chars > 300
ORDER BY doc_id
"""


def q4_exists_late_lines(d: str) -> str:
    """TPC-H Q4 shape — correlated EXISTS (semi-join). Catalyst rewrites the
    subquery to a LeftSemi hash join on orderkey; only key columns shuffle.
    (SURVEY §2.4 — the reference's NOT-EXISTS merge is the anti twin.)"""
    return """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


def q12_priority_case_agg(d: str) -> str:
    """TPC-H Q12 shape — conditional CASE aggregates over a join (§2.5 gap:
    the reference has no conditional agg machinery). Both SUMs compute in one
    pass; partial agg map-side."""
    return """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


def q16_distinct_suppliers(d: str) -> str:
    """TPC-H Q16 shape — COUNT(DISTINCT) per group over a join (distinct-agg
    machinery, absent from the reference §2.5). Catalyst expands to a two-
    level aggregate: dedup on (brand,type,suppkey) then count — both
    shuffles on the group key, no global sort until the top-k."""
    return """
SELECT p.p_brand, p.p_type, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_size BETWEEN 1 AND 15
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC
LIMIT 20
"""


def q17_below_avg_quantity(d: str) -> str:
    """TPC-H Q17 shape — correlated scalar subquery (per-part average).
    Catalyst de-correlates into an aggregate + equi-join on partkey. The
    threshold avg uses an exact DECIMAL sum so the float boundary compare is
    bit-identical on both engines."""
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
       CAST(SUM({_dec('l.l_extendedprice')}) AS DOUBLE) AS sum_price
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * CAST(SUM({_dec('l2.l_quantity')}) AS DOUBLE) / COUNT(*)
  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
"""


def q18_large_orders(d: str) -> str:
    """TPC-H Q18 shape — HAVING over a grouped join (post-aggregation
    filter). The heavy hitter list stays tiny, so the final join back to
    customer broadcasts."""
    qty = f"SUM({_dec('l.l_quantity')})"
    return f"""
SELECT c.c_name, o.o_orderkey, CAST({qty} AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_orderkey
HAVING {qty} > 250
ORDER BY total_qty DESC, o.o_orderkey ASC
LIMIT 100
"""


def q22_idle_rich_customers(d: str) -> str:
    """TPC-H Q22 shape — uncorrelated scalar subquery (global average over a
    filtered set) + NOT EXISTS anti-join + group. The scalar subquery is a
    one-row broadcast; the anti-join shuffles only custkey projections."""
    return f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM({_dec('c.c_acctbal')}) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (
    SELECT CAST(SUM({_dec('c2.c_acctbal')}) AS DOUBLE) / COUNT(*)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY n.n_name
ORDER BY n.n_name
"""


def q6_forecast_revenue(d: str) -> str:
    """TPC-H Q6 shape — pure scan-filter-aggregate, zero joins. The whole
    query is one WholeStageCodegen span: all three predicates push to the
    parquet scan, partial sums combine map-side, and the single-row result
    needs a 1-row exchange. At 100 TB this is bounded purely by scan
    bandwidth x selectivity (date-partitioned layout prunes ~6/7 of files)."""
    rev = f"SUM({_dec('l_extendedprice')} * {_dec('l_discount', 5, 2)})"
    return f"""
SELECT CAST({rev} AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q8_market_share(d: str) -> str:
    """TPC-H Q8 shape — market-share ratio: conditional numerator over a
    6-way star join, grouped by order year. Both the NATION_3 volume and the
    total are exact DECIMAL sums computed in ONE aggregation pass (CASE
    inside SUM); dims broadcast, the one real shuffle is orders join lineitem
    on orderkey."""
    vol = f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount', 5, 2)})"
    num = f"SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {vol} ELSE {_dec('0')} END)"
    return f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST({num} AS DOUBLE) / CAST(SUM({vol}) AS DOUBLE), 6) AS mkt_share
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'ECONOMY'
GROUP BY EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY o_year
"""


def q9_product_profit(d: str) -> str:
    """TPC-H Q9 shape — profit per (supplier nation, order year). The testdata
    star has no partsupp, so supply cost is proxied by p_retailprice * qty;
    both product terms are DECIMAL(18,2) x DECIMAL(5,2) (exact, associative →
    map-side partial agg is safe). p_name LIKE pushes to the part scan and
    the filtered part side broadcasts."""
    amount = (
        f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount', 5, 2)})"
        f" - {_dec('p.p_retailprice')} * {_dec('l.l_quantity', 5, 2)}"
    )
    return f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({amount}) AS DOUBLE) AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY nation, o_year DESC
"""


def q11_important_parts(d: str) -> str:
    """TPC-H Q11 shape — per-group sum filtered by a HAVING threshold that is
    a scalar subquery over the SAME relation (group value > 0.08% of global
    value). Catalyst computes the global sum as a one-row broadcast; both
    sums are exact DECIMAL so the boundary compare is engine-identical. Two
    scans of lineitem — at scale the global sum reuses cached partial
    aggregates or a pre-computed stats table."""
    val = f"SUM({_dec('l_extendedprice')} * {_dec('l_quantity', 5, 2)})"
    return f"""
SELECT l_partkey, CAST({val} AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {val} > (
  SELECT 0.0008 * {val.replace('l_', 'l2.l_')}
  FROM lineitem l2
)
ORDER BY part_value DESC, l_partkey ASC
LIMIT 100
"""


def q13_customer_distribution(d: str) -> str:
    """TPC-H Q13 shape — two-level aggregation over a LEFT OUTER join with an
    ON-clause filter (customers with zero qualifying orders must appear with
    c_count=0). First agg shuffles on custkey, second on the tiny c_count
    domain; COUNT(o_orderkey) counts non-null only — the outer-join null
    semantics both engines share."""
    return """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(d: str) -> str:
    """TPC-H Q14 shape — promotion revenue percentage: typed-CASE numerator
    and denominator in one aggregation pass over a part join lineitem month
    slice. The date predicates push to the lineitem scan; part broadcasts."""
    disc = f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount', 5, 2)})"
    promo = f"SUM(CASE WHEN p.p_type = 'PROMO' THEN {disc} ELSE {_dec('0')} END)"
    return f"""
SELECT round(100.0 * CAST({promo} AS DOUBLE) / CAST(SUM({disc}) AS DOUBLE), 6) AS promo_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


def q15_top_supplier(d: str) -> str:
    """TPC-H Q15 shape — the revenue 'view' (grouped sum over a date slice)
    referenced twice: once joined to supplier, once under MAX as a scalar
    subquery. DECIMAL revenue makes the equality against MAX exact. Spark
    plans the CTE once per reference; at scale materialize it (cache/temp
    table) exactly like the minhash signature reuse."""
    rev = f"SUM({_dec('l_extendedprice')} * (1 - {_dec('l_discount', 5, 2)}))"
    return f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {rev} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s.s_suppkey
"""


def q19_disjunctive_pred_join(d: str) -> str:
    """TPC-H Q19 shape — disjunction of conjunctive brand/size/quantity
    predicates across a join. Catalyst keeps the equi-join key (partkey) and
    evaluates the OR as a post-join filter; the common sub-predicates
    (p_size >= 1) are extracted and pushed to the part scan."""
    rev = f"SUM({_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount', 5, 2)}))"
    return f"""
SELECT CAST({rev} AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1  AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


def q21_waiting_suppliers(d: str) -> str:
    """TPC-H Q21 shape — EXISTS + NOT EXISTS both correlated to the SAME
    outer row (multi-supplier order where only THIS supplier's line was
    returned). The testdata lacks commit/receipt dates, so 'late' is proxied
    by l_returnflag='R'. Catalyst plans LeftSemi + LeftAnti hash joins on
    orderkey — only (orderkey, suppkey, returnflag) projections shuffle."""
    return """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 20
"""

