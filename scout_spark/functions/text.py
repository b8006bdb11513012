"""Text-analysis expressions for the training-data pipeline extensions
(SURVEY.md §7 M6): tokenization, n-grams/shingles, quality scoring,
language-ID heuristic, document fingerprinting.

These generalize the reference's normalize/tokenize core
(reference ranking.py:5-16) to the `documents` table. All pure Column
expressions — language-ID over 100 TB of text must not cross into Python.
"""

from __future__ import annotations

import pandas

from pyspark.sql import Column
from pyspark.sql import functions as F

from scout_spark.functions.normalize import canon

# Tiny per-language stopword inventories for the n-gram/stopword heuristic.
# Deterministic and SQL-expressible; a real pipeline would swap in fastText.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}
LANG_PRECEDENCE = ("en", "es", "de", "fr", "zh")  # deterministic tie-break

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def whitespace_tokens(col: Column | str) -> Column:
    """Whitespace tokenization: maximal non-whitespace runs (identical
    to split-on-\\s+-minus-empties, in one codegen regex pass — the
    filter HOF runs interpreted per element)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"\S+"), 0)


def token_count(col: Column | str) -> Column:
    return F.size(whitespace_tokens(col)).cast("bigint")


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-grams (shingles) of the canonical text, as
    array<string>. sequence+transform — vectorized, no UDF."""
    c = canon(col)
    empty = F.array().cast("array<string>")
    return (
        F.when(F.length(c) == 0, empty)  # no fake '' shingle shared by
        .when(F.length(c) < n, F.array(c))  # all empty documents
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
                lambda i: F.substring(c, i, n),
            )
        )
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles (k consecutive tokens joined by space) for
    MinHash-style near-dup detection.

    Built as k-1 zip_with passes over shifted slices — O(k·n) per row.
    (The obvious transform(sequence)+slice form is O(n²): higher-order
    functions run interpreted, and a per-position slice re-walks the
    array; measured ~10× slower on real documents.)
    """
    toks = whitespace_tokens(col)
    n = F.size(toks)
    m = n - F.lit(k - 1)  # number of shingles when n >= k
    out = F.slice(toks, 1, m)
    for j in range(1, k):
        # shifted window j..j+m-1; equal lengths → zip_with never pads
        out = F.zip_with(
            out,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return (
        F.when(n == 0, F.array().cast("array<string>"))  # no shared '' shingle
        .when(n < k, F.array(F.array_join(toks, " ")))
        .otherwise(out)
    )


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword heuristics for document quality
    scoring. Returns named Column expressions (caller selects/aliases)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = whitespace_tokens(c)
    n_chars = F.length(c).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    punct_count = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    en_stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(
            F.try_divide(
                F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)),
                n_tokens.cast("double"),
            ),
            6,
        ),
        "punct_ratio": F.round(
            F.try_divide(punct_count.cast("double"), n_chars.cast("double")), 6
        ),
        "stopword_ratio": F.round(
            F.try_divide(stop_hits.cast("double"), n_tokens.cast("double")), 6
        ),
    }


def langid_expr(col: Column | str) -> Column:
    """Stopword-voting language ID over LANG_STOPWORDS.

    Score per language = number of token occurrences that are that
    language's stopwords; argmax with LANG_PRECEDENCE tie-break; 'und'
    (undetermined) when all scores are zero.
    """
    toks = whitespace_tokens(F.lower(F.col(col) if isinstance(col, str) else col))

    # NB: single-parameter lambdas only — pyspark infers higher-order-
    # function arity from the Python signature, so a captured default
    # (sw=sw) would silently receive the element-index Column instead.
    def _score(stopwords: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(w) for w in stopwords])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: _score(sw) for lang, sw in LANG_STOPWORDS.items()}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_PRECEDENCE:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint_md5(col: Column | str) -> Column:
    """Canonical-text md5 fingerprint — the exact-dedup key. md5 is
    available and bit-identical in both Spark and the DuckDB oracle."""
    return F.md5(canon(col))


def rolling_hash(col: Column | str, base: int = 31, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over the canonical text's code points —
    a cheap locality-insensitive document fingerprint. aggregate() over
    the character array; stays JVM-side. (Not oracle-expressible; checked
    rows-only / in unit tests.)

    mod is a Mersenne prime < 2^31 so acc*base + codepoint stays well
    inside int64 — a mod near 2^63 overflows the long multiply and
    ANSI mode (Spark 4 default) aborts with ARITHMETIC_OVERFLOW.
    """
    assert mod * base + 0x10FFFF < (1 << 63), "mod too large for int64 arithmetic"
    chars = F.split(canon(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * base + F.ascii(ch), F.lit(mod)),
    )


def word_shingles_arrow(k: int = 5):
    """Arrow-kernel twin of ``word_shingles(canon_ascii(col), k)`` that
    returns the DISTINCT shingle set per row as ``array<string>``.

    Higher-order functions run interpreted in Spark (see PLANS.md
    text-pipeline measurements); for shingle-heavy operators such as
    decontamination this vectorized kernel is several times faster.
    Semantics are kept bit-identical to the Column version (validated by
    the DuckDB-oracle parity suite): canon = lower → strip non-[a-z0-9 ]
    → collapse spaces → trim; 0 tokens → no shingles; <k tokens → one
    whole-text shingle.
    """
    import re

    non_alnum = re.compile(r"[^a-z0-9 ]")

    @F.pandas_udf("array<string>")
    def _shingles(texts: pandas.Series) -> pandas.Series:
        out = []
        for text in texts:
            toks = non_alnum.sub(" ", (text or "").lower()).split()
            if not toks:
                out.append([])
            elif len(toks) < k:
                out.append([" ".join(toks)])
            else:
                out.append(
                    list(
                        {
                            " ".join(toks[i : i + k])
                            for i in range(len(toks) - k + 1)
                        }
                    )
                )
        return pandas.Series(out)

    return _shingles
