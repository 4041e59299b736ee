"""Text-statistics suite: lang-id, quality scores, token counts,
fingerprints, TF-IDF-adjacent measures — dual-dialect templates."""

from __future__ import annotations

from oaim_sandbox_spark.functions import portable as P
from oaim_sandbox_spark.operators import text_analysis as TA
from oaim_sandbox_spark.queries_relational import _topk_template  # noqa: F401
from oaim_sandbox_spark.queries_training import _exploded_grams  # noqa: F401
from oaim_sandbox_spark.queries_core import (
    ALL_TABLES,
    EMBED_DIM,
    _dec,
    _dim_idx,
    _elem,
    _idiv,
    _str,
    _ts_us,
    events_batch,
    events_stream,
    register_views,
)


# --- text analysis ---------------------------------------------------------


def lang_id_q(d: str) -> str:
    """Language-ID heuristic (stopword-hit argmax, deterministic tie-break)."""
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, {TA.lang_id_sql('text', d)} AS detected_lang
FROM documents
"""


def quality_scores_q(d: str) -> str:
    m = TA.quality_metrics_sql("text", d)
    cols = ",\n       ".join(f"CAST({expr} AS DOUBLE) AS {name}" if name not in ("n_chars", "n_tokens") else f"CAST({expr} AS BIGINT) AS {name}" for name, expr in m.items())
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {cols},
       CAST({TA.quality_score_sql('text', d)} AS DOUBLE) AS quality_score
FROM documents
"""


def token_counts_q(d: str) -> str:
    t = TA.token_counts_sql("text", d)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST({t['ws_tokens']} AS BIGINT) AS ws_tokens,
       CAST({t['bpe_tokens']} AS BIGINT) AS bpe_tokens
FROM documents
"""


def doc_fingerprints_q(d: str) -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, {TA.fingerprint_sql('text', d)} AS fingerprint
FROM documents
"""


def embedding_centroid_outliers(d: str) -> str:
    """Semantic-outlier detection for training-data curation: per-label mean
    centroid, then each vector's cosine distance to its own centroid; the 3
    least-coherent vectors per label are flagged. Dimensions pivot through a
    fixed 1..64 index relation (posexplode-shaped), so the centroid is a plain
    (label, dim) AVG — no vector UDF anywhere, whole-stage codegen end to end.
    At scale the (label, dim) centroid table is k·64 rows — always broadcast;
    the heavy side shuffles once on (vec_id) for the re-aggregation."""
    x = _elem("embedding", "i", d)
    return f"""
WITH idx AS ({_dim_idx(d)}),
expl AS (
  SELECT label, vec_id, i, CAST({x} AS DOUBLE) AS x
  FROM embeddings CROSS JOIN idx
),
cent AS (SELECT label, i, AVG(x) AS c FROM expl GROUP BY label, i),
sims AS (
  SELECT e.vec_id AS vec_id, e.label AS label,
         SUM(e.x * c.c) AS dp, SUM(e.x * e.x) AS nx, SUM(c.c * c.c) AS nc
  FROM expl e JOIN cent c ON e.label = c.label AND e.i = c.i
  GROUP BY e.vec_id, e.label
)
SELECT CAST(label AS INT) AS label, CAST(vec_id AS BIGINT) AS vec_id,
       round(1.0 - dp / (sqrt(nx) * sqrt(nc)), 6) AS centroid_dist
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY label ORDER BY dp / (sqrt(nx) * sqrt(nc)) ASC, vec_id ASC
  ) AS rn
  FROM sims
) t
WHERE rn <= 3
ORDER BY label, centroid_dist DESC, vec_id
"""


def grouping_sets_docs(d: str) -> str:
    """Explicit GROUPING SETS (complements events_rollup / cube_doc_counts):
    4 aggregation granularities over documents in ONE Expand+HashAggregate
    pass — the multi-granularity reporting shape a 100 TB pipeline uses to
    avoid N separate scans. GROUPING() markers disambiguate natural NULLs
    from subtotal rows."""
    return f"""
SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       CAST(GROUPING(source) AS INT) AS g_source,
       CAST(GROUPING(lang) AS INT) AS g_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
ORDER BY g_source, g_lang, source, lang
"""


def ntile_curriculum_buckets(d: str) -> str:
    """Curriculum bucketing: split the corpus into 10 equal-size difficulty
    tiers under the deterministic total order (n_chars, doc_id) with
    per-tier stats — the 'sort corpus by difficulty, feed in stages'
    training pattern.

    The oracle (DuckDB) states the semantics directly as
    NTILE(10) OVER (ORDER BY n_chars, doc_id). The Spark side computes the
    IDENTICAL bucket assignment without any corpus-sized single-partition
    window (a bare NTILE moves the whole table through ONE task — the
    textbook 100 TB scale-killer): a two-pass distributed rank. Pass 1
    collapses documents to a per-n_chars count dim (bounded by distinct doc
    lengths) and prefix-sums it — the only unpartitioned window in the plan
    runs over that DIM, not the corpus.

    INTEGER-KEY ASSUMPTION: the two-pass rank is exact ONLY because the
    sort key (n_chars) is a bounded-cardinality integer — the pass-1 dim is
    at most max-document-length rows no matter how big the corpus gets. Do
    NOT reuse this pattern for a continuous difficulty score: its distinct
    count grows with the corpus and the 'dim' prefix-sum becomes a
    corpus-sized single partition again. For continuous keys use
    curriculum_buckets_approx below (sketch boundaries, no exact global
    rank). Pass 2 ranks within each n_chars
    block via a PARTITIONed window and adds the block's offset, then maps
    the exact global rank through NTILE's fill rule (first N%10 buckets get
    one extra row). Exact equality with NTILE, every corpus-sized operator
    partitioned. Skewed block keys (many equal-length docs) stay safe: the
    within-block window is a rank, whose state is O(1) per partition."""
    if d == "duck":
        return """
SELECT CAST(bucket AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       round(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM (
  SELECT n_chars, NTILE(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS bucket
  FROM documents
) t
GROUP BY bucket
ORDER BY bucket
"""
    return """
WITH blk AS (
  SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars
),
off AS (
  SELECT n_chars, c,
         SUM(c) OVER (ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
  FROM blk
),
tot AS (SELECT SUM(c) AS n FROM blk),
ranked AS (
  SELECT d.n_chars,
         COALESCE(o.prev, 0)
           + ROW_NUMBER() OVER (PARTITION BY d.n_chars ORDER BY d.doc_id) AS rk
  FROM documents d JOIN off o ON d.n_chars = o.n_chars
),
bkt AS (
  SELECT n_chars,
         CASE WHEN rk <= ((n div 10) + 1) * (n % 10)
              THEN (rk - 1) div ((n div 10) + 1) + 1
              ELSE (n % 10) + (rk - 1 - ((n div 10) + 1) * (n % 10)) div (n div 10) + 1
         END AS bucket
  FROM ranked CROSS JOIN tot
)
SELECT CAST(bucket AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       round(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM bkt
GROUP BY bucket
ORDER BY bucket
"""


def curriculum_buckets_approx(d: str) -> str:
    """Curriculum bucketing for a CONTINUOUS difficulty score — the scale
    path ntile_curriculum_buckets's docstring points at when the sort key
    isn't a bounded integer. Score = chars-per-word (a real-valued document
    difficulty proxy) with a doc_id*1e-9 deterministic tiebreak making
    every value unique, so bucket shares can't be skewed by tie blocks.

    Spark plan: ONE sketch agg (approx_percentile, fixed-size mergeable
    state) produces the 9 decile cuts; assignment maps each doc through the
    broadcast cut array with a JVM array expression (no join, no window);
    per-bucket counts are a plain groupBy; the only windows run over the
    10-row bucket dim. Nothing corpus-sized is ever sorted, windowed, or
    single-partitioned, and no dim grows with the corpus — this is the
    shape that survives 100x.

    Contract-oracle design (see doc_len_percentiles_approx): bucket ids,
    exact n_total, and exact min/max score are value-checked (identical on
    both engines); the sketch-dependent quantities are RANK-based booleans
    — each bucket's share within 0.1±0.05 and each cumulative cut rank
    within b/10±0.05 of n. DuckDB states the booleans as the contract
    (literal TRUE); Spark measures its own buckets — a sketch or
    assignment bug hash-mismatches the driver check. Unique scores bound
    the true deviation by sketch rank error (1e-4·n) + 1-row quantization;
    the tolerance is GREATEST(0.05·n, 1.5) rows — the relative window alone
    is tighter than the ±1-row quantization below n≈21, so tiny corpora
    (unit fixtures) need the absolute floor to keep healthy data green."""
    score = "n_chars * 1.0 / (1 + length(text) - length(replace(text, ' ', ''))) + doc_id * 1e-9"
    if d == "duck":
        return f"""
WITH tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         round(MIN({score}), 6) AS min_score,
         round(MAX({score}), 6) AS max_score
  FROM documents
)
SELECT CAST(b AS INT) AS bucket, n_total, min_score, max_score,
       TRUE AS share_within, TRUE AS cum_rank_within
FROM (SELECT unnest(generate_series(1, 10)) AS b) buckets CROSS JOIN tot
ORDER BY bucket
"""
    return f"""
WITH scored AS (SELECT doc_id, {score} AS s FROM documents),
cuts AS (
  SELECT approx_percentile(
           s, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 10000) AS c
  FROM scored
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         round(MIN(s), 6) AS min_score, round(MAX(s), 6) AS max_score
  FROM scored
),
assigned AS (
  SELECT 1 + aggregate(cuts.c, 0, (acc, x) -> acc + IF(x <= scored.s, 1, 0)) AS bucket
  FROM scored CROSS JOIN cuts
),
counts AS (SELECT bucket, COUNT(*) AS cnt FROM assigned GROUP BY bucket),
dim AS (SELECT explode(sequence(1, 10)) AS bucket),
filled AS (
  SELECT dim.bucket, COALESCE(counts.cnt, 0) AS cnt
  FROM dim LEFT JOIN counts ON dim.bucket = counts.bucket
),
checked AS (
  SELECT bucket, cnt,
         SUM(cnt) OVER (ORDER BY bucket) AS cum
  FROM filled
)
SELECT CAST(checked.bucket AS INT) AS bucket, tot.n_total, tot.min_score, tot.max_score,
       (abs(checked.cnt - 0.1 * tot.n_total) <= GREATEST(0.05 * tot.n_total, 1.5))
         AS share_within,
       (checked.bucket = 10 OR
        abs(checked.cum - checked.bucket * 0.1 * tot.n_total)
          <= GREATEST(0.05 * tot.n_total, 1.5))
         AS cum_rank_within
FROM checked CROSS JOIN tot
ORDER BY bucket
"""


def levenshtein_near_pairs(d: str) -> str:
    """Edit-distance near-dup on 32-char prefixes, blocked by
    (lang, n_chars div 20) so the self-join is a hash join on the block key
    instead of a cross join — the blocking pattern that keeps pairwise string
    comparison feasible at scale (same role LSH bands play for MinHash).
    levenshtein() is built-in on both engines."""
    blk = _idiv("n_chars", "20", d)
    return f"""
WITH t AS (
  SELECT doc_id, lang, {blk} AS blk, substr(text, 1, 32) AS prefix
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
FROM t a JOIN t b ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 12
ORDER BY edit_dist ASC, id_a ASC, id_b ASC
LIMIT 100
"""


def funnel_conversion(d: str) -> str:
    """Ordered-event funnel (view → click → purchase): each stage keeps users
    whose earliest qualifying event strictly follows their previous stage.
    Three filtered scans + two equi-joins on user_id; every stage's agg
    combines map-side, and joins key on user_id so at scale they co-partition
    with one shuffle. The classic product-analytics op the reference's Oracle
    backend would do with CTEs — identical shape here. Exchange budget: ~2
    per stage (stage join + stage agg), so xchg=8 for the four-stage funnel
    is the expected floor, not plan waste — at scale, pre-partitioning events
    by user_id collapses every stage onto one co-located shuffle."""
    ts = _ts_us(d)
    return f"""
WITH v AS (
  SELECT user_id, MIN({ts}) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id AS user_id, MIN({ts}) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND {ts} > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id AS user_id, MIN({ts}) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND {ts} > c.t_click
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
       round(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 6) AS view_to_purchase
"""


def pagerank_3iter(d: str) -> str:
    """PageRank, 3 power iterations unrolled (damping 0.85), over a
    deterministic hash-derived link graph (each doc links to 3 pseudo-random
    docs — portable hash, so both engines build the identical graph). The
    iterative-algorithm pattern as chained CTEs: each iteration is ONE join
    of the rank vector with the edge list + an aggregation on dst — at scale
    that is one shuffle per iteration keyed on dst, and the edge list should
    be pre-partitioned on dst so only the (16-byte) rank vector moves.
    Convergence-loop form lives in dedup.connected_components (pointer
    jumping + localCheckpoint); this is the fixed-iteration twin with a full
    value oracle. Top-20 ordered by ROUNDED rank (then id) so boundary
    membership is engine-independent. Exchange budget: ~3 per iteration
    (rank-edge join + dst aggregation + degree join), so xchg=10 over 3
    unrolled iterations is inherent to the algorithm; at scale the edge list
    is pre-partitioned on dst and only the 16-byte rank vector moves."""
    nn = "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents)"
    ks = (
        "SELECT explode(sequence(1, 3)) AS k"
        if d == "spark"
        else "SELECT unnest(generate_series(1, 3)) AS k"
    )
    sid, sk = _str("doc_id", d), _str("k", d)
    link = f"({P.hash64(f'concat({sid}, chr(35), {sk})', d)} % {nn})"
    it = """
r{t} AS (
  SELECT d.doc_id AS v,
         0.15 / n.n + 0.85 * COALESCE(SUM(p.r / dg.deg), 0.0) AS r
  FROM documents d CROSS JOIN n
  LEFT JOIN edges e ON e.dst = d.doc_id
  LEFT JOIN r{p} p ON p.v = e.src
  LEFT JOIN deg dg ON dg.src = e.src
  GROUP BY d.doc_id, n.n
)"""
    iters = ",".join(it.format(t=t, p=t - 1) for t in (1, 2, 3))
    return f"""
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
ks AS ({ks}),
edges AS (SELECT doc_id AS src, {link} AS dst FROM documents CROSS JOIN ks),
deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS v, 1.0 / n.n AS r FROM documents CROSS JOIN n),
{iters}
SELECT CAST(v AS BIGINT) AS doc_id, round(r, 9) AS rank
FROM r3
ORDER BY rank DESC, doc_id ASC
LIMIT 20
"""


def inverted_index_postings(d: str) -> str:
    """Inverted-index build — the storage layout behind bm25_topk: for the
    100 highest-df terms, the full sorted posting list (doc ids) plus df and
    total term frequency. One token explode → per-(term, doc) tf agg →
    per-term ordered array agg. At scale the posting lists are the thing you
    persist (partitioned by term hash); queries then join a handful of terms'
    postings instead of scanning the corpus — this query IS the index-build
    job, oracle-checked. Ordered array agg: Spark sort_array(collect_list)
    (collect_list alone is shuffle-order-nondeterministic), DuckDB
    list(... ORDER BY); the list is serialized to a comma-joined STRING so
    the result is hash-comparable (the driver harness can't hash arrays)."""
    toks = P.tokens("text", d)
    if d == "spark":
        tok = f"SELECT doc_id, tk FROM documents LATERAL VIEW explode({toks}) t AS tk"
        postings = "array_join(sort_array(collect_list(doc_id)), ',')"
    else:
        tok = f"SELECT doc_id, unnest({toks}) AS tk FROM documents"
        postings = "array_to_string(list(doc_id ORDER BY doc_id), ',')"
    return f"""
WITH tok AS ({tok}),
tf AS (SELECT tk, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY tk, doc_id)
SELECT tk AS term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       {postings} AS postings
FROM tf
GROUP BY tk
ORDER BY df DESC, term ASC
LIMIT 100
"""


def chunk_reassembly(d: str) -> str:
    """Split-inverse round trip in pure SQL: cut each document into fixed
    200-char chunks (the P1 split shape as a substr window), then reassemble
    with an ORDERED group-concat and verify byte equality with the original
    — the lossless-chunking property the ingest pipeline depends on (S9
    chunk reload + K6 debug sink round trip). Exercises the ordered
    aggregation shape (Spark: sort_array(collect_list(struct)) — collect_list
    alone is shuffle-order-nondeterministic; DuckDB: string_agg ORDER BY).
    One explode + one grouped agg keyed on doc_id; chunks co-partition with
    their doc so reassembly never crosses executors at scale. The chunk count
    is clamped to >=1 on BOTH dialects: Spark's sequence(1, 0) steps -1 and
    yields [1, 0] while DuckDB's generate_series(1, 0) is empty, so a
    zero-length doc would otherwise diverge between engines."""
    size = 200
    if d == "spark":
        chunks = (
            f"SELECT doc_id, j, substr(text, (j - 1) * {size} + 1, {size}) AS chunk "
            f"FROM documents LATERAL VIEW explode(sequence(1, greatest(1, CAST(ceil(length(text) / {size}.0) AS INT)))) t AS j"
        )
        reasm = "array_join(transform(sort_array(collect_list(struct(j, chunk))), s -> s.chunk), '')"
    else:
        chunks = (
            f"SELECT doc_id, unnest(generate_series(1, greatest(1, CAST(ceil(length(text) / {size}.0) AS INT)))) AS j, text FROM documents"
        )
        chunks = (
            f"SELECT doc_id, j, substr(text, CAST((j - 1) * {size} + 1 AS INT), {size}) AS chunk "
            f"FROM ({chunks}) g"
        )
        reasm = "string_agg(chunk, '' ORDER BY j)"
    return f"""
WITH chunks AS ({chunks}),
reassembled AS (
  SELECT doc_id, {reasm} AS rebuilt, CAST(COUNT(*) AS BIGINT) AS n_chunks
  FROM chunks GROUP BY doc_id
)
SELECT CAST(r.doc_id AS BIGINT) AS doc_id, r.n_chunks,
       CAST(CASE WHEN r.rebuilt = d.text THEN 1 ELSE 0 END AS INT) AS lossless
FROM reassembled r JOIN documents d ON r.doc_id = d.doc_id
ORDER BY doc_id
"""


def triangle_count(d: str) -> str:
    """Triangle counting over the SAME deterministic hash-derived link graph
    as pagerank_3iter — the canonical heavy-join graph metric (clustering /
    spam structure in link corpora). Strategy: canonicalize to undirected
    (a < b) distinct edges, then the standard oriented wedge join
    (e1.b = e2.a keeps only a<b<c paths) closed by a third edge join — the
    id-ordering plays the degree-ordering trick's role, bounding each wedge
    to one orientation so no triangle is counted twice. Two shuffle joins
    keyed on node ids; at scale the edge list pre-partitions on the join key
    and only (a, b) int64 pairs move. Output: top-10 nodes by triangle
    membership with the global count alongside (engine-independent ties via
    node-id tiebreak)."""
    nn = "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents)"
    ks = (
        "SELECT explode(sequence(1, 3)) AS k"
        if d == "spark"
        else "SELECT unnest(generate_series(1, 3)) AS k"
    )
    sid, sk = _str("doc_id", d), _str("k", d)
    link = f"({P.hash64(f'concat({sid}, chr(35), {sk})', d)} % {nn})"
    return f"""
WITH ks AS ({ks}),
raw AS (SELECT doc_id AS src, {link} AS dst FROM documents CROSS JOIN ks),
edges AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tri),
members AS (
  SELECT v FROM (
    SELECT x AS v FROM tri
    UNION ALL SELECT y AS v FROM tri
    UNION ALL SELECT z AS v FROM tri
  ) m
)
SELECT CAST(v AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_triangles,
       (SELECT n FROM total) AS total_triangles
FROM members
GROUP BY v
ORDER BY n_triangles DESC, doc_id ASC
LIMIT 10
"""


def weighted_reservoir_sample(d: str) -> str:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    each row draws u ~ U(0,1) and ranks by u^(1/weight); the global top-k IS
    the weighted sample. Weight here is n_chars, so longer documents are
    proportionally likelier — the domain-weighting sampler for training-mix
    construction. u derives from the portable hash, making the 'random'
    sample fully deterministic and oracle-checkable. Plan: one scan +
    TakeOrderedAndProject — no shuffle, no state; at 100 TB each executor
    keeps a local k-heap and only k rows per partition move."""
    u = f"(({P.hash64(_str('doc_id', d), d)} % 1000000) + 1) / 1000001.0"
    key = f"pow({u}, 1.0 / GREATEST(n_chars, 1))"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_chars AS BIGINT) AS n_chars,
       round({key}, 9) AS sample_key
FROM documents
ORDER BY sample_key DESC, doc_id ASC
LIMIT 100
"""


def events_variant_histogram(d: str) -> str:
    """Semi-structured props through Spark 4's native VARIANT type
    (parse_json → variant_get): the scale path for JSON columns — parse once
    into the binary variant encoding (shreddable at write time) instead of
    re-parsing strings per access, while staying entirely JVM-side. DuckDB
    oracle reads the same field via json_extract_string. Decile histogram of
    props.k per event type — a different consumer shape than
    events_json_props' flat aggregate."""
    k = (
        "variant_get(parse_json(props), '$.k', 'bigint')"
        if d == "spark"
        else "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    )
    bucket = _idiv("k", "10", d)
    return f"""
SELECT CAST({bucket} AS BIGINT) AS k_bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
FROM (SELECT event_type, {k} AS k FROM events) t
GROUP BY {bucket}, event_type
ORDER BY k_bucket, event_type
"""


def rerank_crossencoder_topk(d: str) -> str:
    """Two-stage retrieve-then-rerank (operators/rerank.py): stage 1 recalls
    top-20 chunks by cosine over mock embeddings (TakeOrderedAndProject, no
    store shuffle); stage 2 re-scores only those 20 with the deterministic
    mock cross-encoder and keeps the top-5. The reference DECLARES model type
    're-rank' but never implements it (schema.py:104) — this is that surface,
    with the stage-2 cost bounded by fetch_k, never store size."""
    qtext = "'spark vector search'"
    qvec = P.mock_embed(qtext, EMBED_DIM, d)
    dvec = P.mock_embed("text", EMBED_DIM, d)
    dist = P.cosine_distance(dvec, qvec, d)
    ce = P.mock_rerank_score(qtext, "text", d)
    return f"""
WITH cands AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text, round({dist}, 6) AS distance
  FROM documents
  ORDER BY distance ASC, doc_id ASC
  LIMIT 20
)
SELECT doc_id, distance, rerank_score, rank
FROM (
  SELECT doc_id, distance, CAST(round({ce}, 6) AS DOUBLE) AS rerank_score,
         row_number() OVER (ORDER BY {ce} DESC, doc_id ASC) AS rank
  FROM cands
) t
WHERE rank <= 5
ORDER BY rank
"""


def ivf_full_probe_topk(d: str) -> str:
    """Oracle for the full-probe IVF search: probing ALL centroids makes IVF
    exact, so the fitted-quantizer machinery (partitioned store + pruned scan)
    is checkable against the plain exact top-k oracle — the recall=1.0
    endpoint of the nprobe dial that `ivf_ann_topk` (rows-only) turns down."""
    return _topk_template(d, "COSINE", k=10)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def domain_caps_topn(d: str) -> str:
    """Per-domain document caps — crawl curation: keep at most 5 docs per
    source (n_chars desc as the quality proxy), report kept/total/dropped
    per source. One per-group window sort + a tiny rollup; at 100 TB the
    scan is partitioned by source so ranking never globally sorts, and the
    dropped mass per domain is the domain-rebalance signal."""
    return """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rn
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked
GROUP BY source
ORDER BY source
"""


def global_shuffle_order(d: str) -> str:
    """Deterministic global training-order shuffle: sort key = portable
    hash of (doc_id, epoch salt) — reproducible across engines, runs, and
    restarts with no RNG state. At 100 TB this ORDER BY is a range-
    partitioned total sort writing the epoch's shard files in one pass;
    re-salting re-shuffles the next epoch without carrying any state."""
    key_in = (
        "concat(cast(doc_id as string), ':epoch:42')"
        if d == "spark"
        else "(doc_id::VARCHAR || ':epoch:42')"
    )
    h = P.hash64(key_in, d)
    return f"""
WITH keyed AS (SELECT doc_id, {h} AS shuffle_key FROM documents),
head AS (SELECT doc_id, shuffle_key FROM keyed ORDER BY shuffle_key, doc_id LIMIT 20)
SELECT doc_id, shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS INT) AS position
FROM head
ORDER BY position
"""


def vocab_coverage_topk(d: str) -> str:
    """Vocabulary coverage curve — tokenizer/vocab design input: the 20 most
    frequent tokens with each one's cumulative share of all token
    occurrences. Token explode -> per-token count (map-side combinable) ->
    top-k + running-sum window over just 20 rows; the heavy agg shuffles
    (token, count) pairs only."""
    toks = P.tokens("text", d)
    if d == "spark":
        tok = f"SELECT tk FROM documents LATERAL VIEW explode({toks}) t AS tk"
    else:
        tok = f"SELECT unnest({toks}) AS tk FROM documents"
    return f"""
WITH tok AS ({tok}),
freq AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tk),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM freq),
topk AS (SELECT tk, n FROM freq ORDER BY n DESC, tk ASC LIMIT 20),
ranked AS (
  SELECT tk, n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tk ASC) AS INT) AS rn
  FROM topk
)
SELECT tk AS token, n AS occurrences, rn,
       CAST(round(SUM(n) OVER (ORDER BY rn) / tot.total, 6) AS DOUBLE) AS cum_share
FROM ranked CROSS JOIN tot
ORDER BY rn
"""


def contamination_rate_by_source(d: str) -> str:
    """Per-source contamination rate — decontamination_8gram's doc-level
    flags rolled up to the crawl/domain level (which source leaked the
    benchmark). Same broadcastable benchmark-gram set and map-side
    pre-aggregated candidate grams; the extra rollup joins doc flags back
    to the narrow (doc_id, source) projection, never the text."""
    bench = _exploded_grams(8, "WHERE source IN ('src0', 'src1')", d)
    cand = _exploded_grams(8, "WHERE source NOT IN ('src0', 'src1')", d)
    return f"""
WITH bench AS (SELECT DISTINCT g FROM ({bench}) b),
cand AS (SELECT DISTINCT doc_id, g FROM ({cand}) c),
flags AS (
  SELECT c.doc_id, CASE WHEN COUNT(b.g) > 0 THEN 1 ELSE 0 END AS contaminated
  FROM cand c LEFT JOIN bench b ON c.g = b.g
  GROUP BY c.doc_id
)
SELECT d2.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f.contaminated) AS BIGINT) AS n_contaminated,
       CAST(round(SUM(f.contaminated) * 1.0 / COUNT(*), 6) AS DOUBLE) AS contamination_rate
FROM flags f JOIN documents d2 ON f.doc_id = d2.doc_id
GROUP BY d2.source
ORDER BY d2.source
"""

