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

from .hof import let

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


def _stop_hits(toks: Column, stopwords: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def _stopword_ratio_from(
    toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS
) -> Column:
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        _stop_hits(toks, stopwords).cast("double") / F.size(toks)
    )


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return let(ws_tokens(col), lambda t: _stopword_ratio_from(t, stopwords))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(col) - F.length(F.regexp_replace(col, "[.,;:!?]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def _quality_score_from(col: Column, toks: Column) -> Column:
    length_c = F.least(F.length(col).cast("double") / 2000.0, F.lit(1.0))
    stop_c = F.least(_stopword_ratio_from(toks) / 0.4, F.lit(1.0))
    punct_c = F.least(punct_ratio(col) / 0.05, F.lit(1.0))
    return F.round(0.4 * length_c + 0.3 * stop_c + 0.3 * punct_c, 6)


def quality_score(col: Column) -> Column:
    """Composite document-quality score in [0, 1]:

    0.4 * length_component (saturates at 2000 chars)
    + 0.3 * stopword component (saturates at ratio 0.4)
    + 0.3 * punctuation component (ideal ~0.02..0.1, linear ramp)
    """
    return let(ws_tokens(col), lambda t: _quality_score_from(col, t))


def _langid_from(toks: Column) -> Column:
    en = _stop_hits(toks, EN_STOPWORDS)
    es = _stop_hits(toks, ES_MARKERS)
    return (
        F.when((en == 0) & (es == 0), F.lit("und"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def langid(col: Column) -> Column:
    """N-gram/stopword language-ID heuristic: count marker-token hits
    per language; highest count wins, ties broken en > es; zero hits →
    'und'."""
    return let(ws_tokens(col), _langid_from)


def word_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word n-grams over whitespace tokens;
    texts with fewer than ``n`` words → empty array.  Pure JVM
    (sequence + slice + array_join) — n-gram generation is map-side,
    so corpus-level repetition stats shuffle GRAMS, never re-shuffle
    documents.  The token array is ``let``-bound: HOFs are interpreted
    with no common-subexpression elimination, so an unbound
    ``ws_tokens(col)`` would re-split the text once per n-gram
    position (measured 7.2 s → 2.6 s for dup_ngram_stats at sf0.1)."""
    return let(
        ws_tokens(col),
        lambda toks: F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    )


def _type_token_ratio_from(toks: Column) -> Column:
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
            6,
        )
    )


def type_token_ratio(col: Column) -> Column:
    """Gopher-style lexical-diversity signal: distinct words / total
    words (low values → templated/repetitive text).  Pure JVM."""
    return let(ws_tokens(col), _type_token_ratio_from)


def _longest_run(arr: Column) -> Column:
    """Max multiplicity of any element: sort, find the run-start
    indices, take the max gap between consecutive starts — stays
    map-side (the explode→groupBy(doc, elem) form would shuffle every
    element in the corpus).  HOFs are interpreted (CodegenFallback),
    so the per-element body cost dominates: this boundary form
    (comparison per element + one subtraction per distinct value)
    measured 1.5× faster than the equivalent single-pass struct-
    accumulator fold, whose per-element struct allocation is the
    expensive part (16.6 s → 10.9 s over 500k docs, identical
    output)."""

    def over_sorted(s: Column) -> Column:
        n = F.size(s)
        starts = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == 1)
            | (F.element_at(s, i) != F.element_at(s, i - 1)),
        )

        def gaps(st: Column) -> Column:
            ends = F.concat(
                F.slice(st, 2, F.size(st) - 1), F.array(n + 1)
            )
            return F.array_max(F.zip_with(ends, st, lambda a, b: a - b))

        return F.when(n == 0, F.lit(0)).otherwise(let(starts, gaps))

    return let(F.array_sort(arr), over_sorted)


def _top_word_fraction_from(toks: Column) -> Column:
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.round(
            _longest_run(toks).cast("double") / F.size(toks).cast("double"),
            6,
        )
    )


def top_word_fraction(col: Column) -> Column:
    """Fraction of the document occupied by its single most frequent
    word (Gopher repetition rule).  Map-side via the sorted-run fold."""
    return let(ws_tokens(col), _top_word_fraction_from)


def _top_bigram_fraction_from(toks: Column) -> Column:
    grams = F.transform(
        F.slice(toks, 1, F.size(toks) - 1),
        lambda x, i: F.concat(
            x,
            F.lit(" "),
            F.element_at(toks, (i + F.lit(2)).cast("int")),
        ),
    )
    n = F.size(toks) - 1
    return F.when(F.size(toks) < 2, F.lit(0.0)).otherwise(
        F.round(_longest_run(grams).cast("double") / n.cast("double"), 6)
    )


def top_bigram_fraction(col: Column) -> Column:
    """Fraction of the document's word bigrams occupied by the single
    most frequent bigram (the Gopher top-2-gram repetition rule —
    catches two-word boilerplate ``top_word_fraction`` misses).  Same
    zero-shuffle shape: bigrams are built by array algebra (slice +
    transform-with-index), then the sorted-run fold.  The token array
    is ``let``-bound: an unbound ``ws_tokens`` referenced inside the
    transform lambda re-splits the text once per bigram position
    (O(tokens²) — measured 4.3 s → sub-second at sf0.1)."""
    return let(ws_tokens(col), _top_bigram_fraction_from)


def _dup_line_fraction_from(toks: Column, k: int = 3) -> Column:
    n_lines = F.ceil(F.size(toks) / F.lit(float(k))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
    )
    return F.when(n_lines <= 0, F.lit(0.0)).otherwise(
        F.round(
            (n_lines - F.size(F.array_distinct(lines))).cast("double")
            / n_lines.cast("double"),
            6,
        )
    )


def dup_line_fraction(col: Column, k: int = 3) -> Column:
    """Fraction of a document's lines that are repeats of another line
    in the SAME document (the Gopher duplicate-line rule).  Lines are
    the same fixed-``k``-token segments ``dedup.doc_lines`` uses (the
    synthetic corpus has no newlines; swap in ``split(text, '\\n')``
    for production).  Entirely map-side: segment by array algebra,
    then 1 − distinct/total.  Token array ``let``-bound (see
    ``top_bigram_fraction``); the ``ws_tokens`` empty guard and the
    raw split agree on blank text (both segmentations yield
    dup-fraction 0.0)."""
    return let(ws_tokens(col), lambda t: _dup_line_fraction_from(t, k))


def repetition_metrics(col: Column) -> Column:
    """The Gopher repetition rule family as ONE struct under ONE
    let-bound tokenization — computing the four metrics as separate
    columns re-splits the text once per metric (HOFs are interpreted,
    no common-subexpression elimination across the projection;
    measured 54.6 s → 41.2 s over 500k docs for the shared form,
    identical output).  Expand with ``F.inline(F.array(...))`` so the
    struct is evaluated exactly once per row — ``select("s.*")`` lets
    Catalyst re-inline the whole struct per extracted field."""
    return let(
        ws_tokens(col),
        lambda toks: F.struct(
            _type_token_ratio_from(toks).alias("ttr"),
            _top_word_fraction_from(toks).alias("top_word_frac"),
            _top_bigram_fraction_from(toks).alias("top_bigram_frac"),
            _dup_line_fraction_from(toks).alias("dup_line_frac"),
        ),
    )


def quality_filter_metrics(col: Column) -> Column:
    """The composite quality-filter metric family (lang, n_tokens,
    quality, ttr, twf) as one struct under one let-bound tokenization
    (same rationale and expansion contract as
    ``repetition_metrics``)."""
    return let(
        ws_tokens(col),
        lambda toks: F.struct(
            _langid_from(toks).alias("lang"),
            F.size(toks).alias("n_tokens"),
            _quality_score_from(col, toks).alias("quality"),
            _type_token_ratio_from(toks).alias("ttr"),
            _top_word_fraction_from(toks).alias("twf"),
        ),
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


def nfc_normalize_pudf():
    """Unicode NFC normalization as an Arrow-batched scalar pandas UDF
    — the canonical text-fixing pass every training pipeline runs
    before tokenization (combining sequences → precomposed forms, so
    'e'+U+0301 and 'é' dedup/tokenize identically).

    Spark SQL has no built-in normalizer, so this is one of the
    legitimate Python-kernel cases (the image-decode precedent): the
    kernel is a C-implemented table lookup (CPython ``unicodedata``),
    Arrow moves the batches, and the column it runs over should be
    pruned to (id, text) first.  ASCII fast path: ``str.isascii`` is a
    C scan, and ASCII is NFC by construction, so pure-ASCII batches
    skip the normalizer entirely.
    """
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(texts):
        def one(v):
            if v is None or v.isascii():
                return v
            return unicodedata.normalize("NFC", v)

        return texts.map(one)

    _nfc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("string")(_nfc)


# Gopher (Rae et al. 2021) document-filter constants.  Symbols are the
# paper's hash + ellipsis set; bullets are common list markers.  The
# regexes are shared verbatim with the SQL oracle.
GOPHER_SYMBOL_RE = "#|\\.\\.\\.|…"
GOPHER_BULLET_RE = "^[-*•]"
GOPHER_ELLIPSIS_RE = "(\\.\\.\\.|…)$"
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_metrics(col: Column) -> Column:
    """The Gopher quality-filter rule family (Rae et al. 2021, table
    A1) as ONE map-side struct: per-rule metrics, per-rule pass flags,
    and the final ``keep`` verdict.  Complements the repetition rules
    (``top_word_fraction`` etc. — surfaced by ``repetition_scores``)
    with the structural rules: word-count bounds, mean word length,
    symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic
    word fraction, and the distinct-stopword floor.

    Zero shuffles, zero Python: token and line arrays are ``let``-bound
    (interpreted HOFs have no CSE), the summed word length is
    ``length(text minus whitespace)`` (no per-token fold), and every
    metric is rounded to 6 decimals BEFORE its flag comparison so the
    DuckDB oracle reproduces each verdict exactly."""
    stop_lits = F.array(*[F.lit(s) for s in EN_STOPWORDS])

    def body(toks: Column, lines: Column) -> Column:
        n = F.size(toks)
        nd = n.cast("double")
        nl = F.size(lines).cast("double")
        mwl = F.when(n == 0, F.lit(0.0)).otherwise(
            F.round(
                F.length(F.regexp_replace(col, "\\s", "")).cast("double")
                / nd,
                6,
            )
        )
        symbol_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
            F.round(
                F.regexp_count(col, F.lit(GOPHER_SYMBOL_RE)).cast("double")
                / nd,
                6,
            )
        )
        bullet_frac = F.round(
            F.size(
                F.filter(
                    lines, lambda li: F.trim(li).rlike(GOPHER_BULLET_RE)
                )
            ).cast("double")
            / nl,
            6,
        )
        ellipsis_frac = F.round(
            F.size(
                F.filter(
                    lines, lambda li: F.trim(li).rlike(GOPHER_ELLIPSIS_RE)
                )
            ).cast("double")
            / nl,
            6,
        )
        alpha_frac = F.when(n == 0, F.lit(0.0)).otherwise(
            F.round(
                F.size(
                    F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
                ).cast("double")
                / nd,
                6,
            )
        )
        n_stop = F.size(
            F.filter(stop_lits, lambda s: F.array_contains(toks, s))
        )
        flags = F.struct(
            n.alias("n_words"),
            mwl.alias("mean_word_length"),
            symbol_ratio.alias("symbol_ratio"),
            bullet_frac.alias("bullet_frac"),
            ellipsis_frac.alias("ellipsis_frac"),
            alpha_frac.alias("alpha_frac"),
            n_stop.alias("n_stopwords"),
            ((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)).alias(
                "wc_ok"
            ),
            (
                (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
            ).alias("mwl_ok"),
            (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO).alias("symbol_ok"),
            (bullet_frac <= GOPHER_MAX_BULLET_FRAC).alias("bullet_ok"),
            (ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC).alias(
                "ellipsis_ok"
            ),
            (alpha_frac >= GOPHER_MIN_ALPHA_FRAC).alias("alpha_ok"),
            (n_stop >= GOPHER_MIN_STOPWORDS).alias("stop_ok"),
        )
        return let(
            flags,
            lambda g: F.struct(
                *[g[f].alias(f) for f in (
                    "n_words", "mean_word_length", "symbol_ratio",
                    "bullet_frac", "ellipsis_frac", "alpha_frac",
                    "n_stopwords", "wc_ok", "mwl_ok", "symbol_ok",
                    "bullet_ok", "ellipsis_ok", "alpha_ok", "stop_ok",
                )],
                (
                    g["wc_ok"] & g["mwl_ok"] & g["symbol_ok"]
                    & g["bullet_ok"] & g["ellipsis_ok"]
                    & g["alpha_ok"] & g["stop_ok"]
                ).alias("keep"),
            ),
        )

    return let(
        ws_tokens(col),
        lambda toks: let(F.split(col, "\n"), lambda lines: body(toks, lines)),
    )


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
