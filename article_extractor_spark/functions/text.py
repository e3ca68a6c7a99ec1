"""Text-analysis expressions for the documents table.

All pure Column expressions (JVM-side, codegen'd — no Python on the hot
path): tokenization, token counting, quality scoring, language-ID
heuristics, document fingerprinting.  Each has an exact ANSI-SQL twin in
``article_extractor_spark.queries`` so DuckDB can replay it as an
oracle.

Reference behaviors mirrored: word counting (utils.py:10-19), regex
token shapes (constants.py:218-223), content-quality heuristics in the
sanitizer (content_sanitizer.py:221-295 uses length / link-density /
phrase ratios — our quality score is the corpus-level generalization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic stopword sets used for quality scoring and the
# language-ID heuristic.  These must stay in sync with the SQL oracles.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
ES_MARKERS = ("el", "la", "de", "que", "los", "una")
# "BPE-ish" token regex: runs of letters, runs of digits, or a single
# non-alphanumeric non-space character (subword-style segmentation).
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def ws_tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, "\\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(ws_tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish subword tokens (letters / digits / punct)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = ws_tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(col) - F.length(F.regexp_replace(col, "[.,;:!?]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def quality_score(col: Column) -> Column:
    """Composite document-quality score in [0, 1]:

    0.4 * length_component (saturates at 2000 chars)
    + 0.3 * stopword component (saturates at ratio 0.4)
    + 0.3 * punctuation component (ideal ~0.02..0.1, linear ramp)
    """
    length_c = F.least(F.length(col).cast("double") / 2000.0, F.lit(1.0))
    stop_c = F.least(stopword_ratio(col) / 0.4, F.lit(1.0))
    punct_c = F.least(punct_ratio(col) / 0.05, F.lit(1.0))
    return F.round(0.4 * length_c + 0.3 * stop_c + 0.3 * punct_c, 6)


def langid(col: Column) -> Column:
    """N-gram/stopword language-ID heuristic: count marker-token hits
    per language; highest count wins, ties broken en > es; zero hits →
    'und'."""
    toks = ws_tokens(col)
    en = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    es = F.size(F.filter(toks, lambda t: t.isin(*ES_MARKERS)))
    return (
        F.when((en == 0) & (es == 0), F.lit("und"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def md5_int(col: Column) -> Column:
    """Deterministic 60-bit integer hash shared with DuckDB oracles:
    first 15 hex chars of md5 → bigint.  (60 bits: no int64 overflow.)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count_pudf():
    """Vectorized scalar pandas UDF equivalent of ``token_count``.

    The JVM expression is the hot-path choice; this Arrow-batched form
    exists for pipelines that need Python-side tokenizers (e.g. a real
    BPE vocabulary) — swap the kernel, keep the call site.  Never
    row-at-a-time.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _count(texts):
        return texts.fillna("").str.split().str.len().astype("int32")

    # real-object annotations (module uses `from __future__ import
    # annotations`, whose string hints pandas_udf cannot resolve)
    _count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("int")(_count)


def fingerprint(col: Column) -> Column:
    """Whole-document fingerprint (rolling-hash analog): md5-derived
    60-bit integer over dedup-normalized text (lowercase + collapsed
    whitespace — the same ``normalized_text`` the dedup family keys on,
    so fingerprint equality and exact-dedup membership agree).  Mixed
    case must NOT change the fingerprint; pinned by a unit-level oracle
    test (round-2 verdict: the old case-preserving form diverged from
    its lowercasing SQL oracle, masked by an all-lowercase corpus)."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), "\\s+", " ")
    return md5_int(normalized)
