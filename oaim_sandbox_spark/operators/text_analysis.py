"""Text-analysis operators for LLM training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All JVM-side column
expressions (functions/portable.py) — no Python in the hot path, every
operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from oaim_sandbox_spark.functions import portable as P

# Small per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately tiny + ASCII so the same IN-list is portable to the oracle.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "zu", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie-break order


def lang_scores_sql(text_col: str, dialect: str) -> dict[str, str]:
    toks = P.tokens(f"lower({text_col})", dialect)
    return {lang: P.stopword_hits(toks, words, dialect) for lang, words in STOPWORDS.items()}


def lang_id_sql(text_col: str, dialect: str) -> str:
    """Argmax language by stopword hits, ties broken by language-code order;
    'und' (undetermined) when no stopword at all matches."""
    scores = lang_scores_sql(text_col, dialect)
    greatest = "greatest(" + ", ".join(scores.values()) + ")"
    chain = " ".join(
        f"WHEN {scores[lang]} = {greatest} THEN '{lang}'" for lang in LANGS
    )
    return f"(CASE WHEN {greatest} = 0 THEN 'und' {chain} END)"


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("detected_lang", F.expr(lang_id_sql(text_col, "spark")))


def quality_metrics_sql(text_col: str, dialect: str) -> dict[str, str]:
    """The standard cheap quality signals: length, token count, mean token
    length, punctuation ratio, stopword ratio, digit ratio."""
    toks = P.tokens(text_col, dialect)
    n_tok = f"size({toks})" if dialect == "spark" else f"len({toks})"
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    # zero guards via nullif: an empty/whitespace-only document has
    # length 0 and/or 0 tokens, and under Spark 4's default ANSI mode a
    # bare division aborts the WHOLE job with DIVIDE_BY_ZERO — one junk
    # doc in a 100 TB corpus must yield NULL ratios, not kill the scan.
    # nullif is portable (identical on DuckDB), so oracle parity holds.
    len_nz = f"nullif(length({text_col}), 0)"
    tok_nz = f"nullif({n_tok}, 0)"
    return {
        "n_chars": f"length({text_col})",
        "n_tokens": n_tok,
        "mean_token_len": f"round(length(replace({text_col}, ' ', '')) * 1.0 / {tok_nz}, 6)",
        "punct_ratio": f"round({P.regexp_count_portable(text_col, '[.,;:!?]', dialect)} * 1.0 / {len_nz}, 6)",
        "stopword_ratio": f"round({P.stopword_hits(P.tokens(f'lower({text_col})', dialect), all_stop, dialect)} * 1.0 / {tok_nz}, 6)",
        "digit_ratio": f"round({P.regexp_count_portable(text_col, '[0-9]', dialect)} * 1.0 / {len_nz}, 6)",
    }


def quality_score_sql(text_col: str, dialect: str) -> str:
    """Composite [0,1] quality score: rewards reasonable length and stopword
    density, penalizes digit/punct-heavy text. Weights are arbitrary but fixed."""
    m = quality_metrics_sql(text_col, dialect)
    len_term = f"least({m['n_chars']} / 1000.0, 1.0)"
    stop_term = f"least({m['stopword_ratio']} * 5.0, 1.0)"
    digit_pen = f"(1.0 - least({m['digit_ratio']} * 10.0, 1.0))"
    return f"round(0.4 * {len_term} + 0.4 * {stop_term} + 0.2 * {digit_pen}, 6)"


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    metrics = quality_metrics_sql(text_col, "spark")
    out = df
    for name, expr in metrics.items():
        out = out.withColumn(name, F.expr(expr))
    return out.withColumn("quality_score", F.expr(quality_score_sql(text_col, "spark")))


# BPE-ish token pattern: letter runs, digit runs, single non-alnum marks.
# \s (not just the space char) in the exclusion class: newlines/tabs are
# whitespace, not tokens — counting each '\n' as a token inflated
# bpe_tokens on markdown/code and disagreed with split.TokenSplitter's
# default counter, which uses the same class. Keep the two in lockstep.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_counts_sql(text_col: str, dialect: str) -> dict[str, str]:
    toks = P.tokens(text_col, dialect)
    n_ws = f"size({toks})" if dialect == "spark" else f"len({toks})"
    return {
        "ws_tokens": n_ws,
        "bpe_tokens": P.regexp_count_portable(text_col, TOKEN_PATTERN, dialect),
    }


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    exprs = token_counts_sql(text_col, "spark")
    return df.withColumn("ws_tokens", F.expr(exprs["ws_tokens"])).withColumn(
        "bpe_tokens", F.expr(exprs["bpe_tokens"])
    )


def fingerprint_sql(text_col: str, dialect: str) -> str:
    """Document fingerprint: portable 60-bit hash of whitespace-normalized,
    lower-cased text — the exact-dedup key that survives formatting noise."""
    return P.hash64(P.normalize_text(text_col, dialect), dialect)


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", F.expr(fingerprint_sql(text_col, "spark")))


# PII-shaped patterns for corpus scrubbing (training-data hygiene; beyond the
# reference, which only masks *password* config keys — api_call.py:129-135).
# Most-specific first: SSN/IPv4 before the generic phone shape, which would
# otherwise swallow any dotted/dashed digit run.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII-shaped spans with <KIND> placeholders and count hits per
    kind. Pure JVM regexp_replace/regexp chain — codegen-eligible, no Python
    in the hot path. Patterns apply in dict order and each kind counts
    matches on the ALREADY-redacted text of the previous kinds, so a span
    claimed by a more specific pattern is never double-counted by a broader
    one (an SSN is not also a phone).
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or f"{text_col}_redacted"
    cur = F.col(text_col)
    for kind, pat in patterns.items():
        df = df.withColumn(
            f"n_{kind}",
            F.coalesce(F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))), F.lit(0)),
        )
        cur = F.regexp_replace(cur, pat, f"<{kind.upper()}>")
    return df.withColumn(out_col, cur)
