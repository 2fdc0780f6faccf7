"""Text-analysis column expressions for the LLM-data-pipeline surface.

All hot-path functions are native Catalyst expressions (regex/split/
length) — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly with input bytes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small multilingual stopword probe used by the n-gram/stopword
# language-ID heuristic. Deliberately tiny and deterministic.
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it")

_WORD_RE = r"\s+"
# BPE-ish token regex: runs of word chars OR single non-space non-word chars.
TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def word_count(text: Column) -> Column:
    """Whitespace token count; empty string counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, _WORD_RE)))


def token_count(text: Column) -> Column:
    """BPE-ish token count: word runs + individual punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(text)
    )


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    words = F.split(F.lower(F.trim(text)), _WORD_RE)
    hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    n = F.size(words)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def mean_word_length(text: Column) -> Column:
    words = F.split(F.trim(text), _WORD_RE)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(total / F.size(words))


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1].

    Weighted blend of (a) length band, (b) low punctuation noise,
    (c) stopword presence (fluency proxy) — the classic cheap pre-filters
    of large-scale corpus curation, expressed as one codegen'd column.
    """
    n = F.length(text)
    len_score = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).when(
        n > 0, F.lit(0.5)
    ).otherwise(F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return F.round(len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3, 6)


def shingles(text: Column, k: int = 3, distinct: bool = True) -> Column:
    """Word k-gram shingles (array<string>) for Jaccard/MinHash dedup.

    Distinct shingles by default (set semantics); ``distinct=False``
    keeps the full multiset (repetition scoring needs the duplicates).
    Documents shorter than k words yield a single shingle of the whole
    text.
    """
    words = F.split(F.lower(F.trim(text)), _WORD_RE)
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(grams) if distinct else grams


def char_ngrams(text: Column, n: int = 4) -> Column:
    """Distinct character n-grams (for SimHash / n-gram Jaccard)."""
    t = F.lower(text)
    ln = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1))),
        lambda i: F.substring(t, i, n),
    )
    return F.array_distinct(grams)


def fingerprint64(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint.

    xxhash64 over the lowercased, whitespace-normalized text — the
    rolling-hash-style content fingerprint used for cheap exact-ish dedup
    keys at scale (collision odds ~n^2 / 2^64).
    """
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def lang_id(text: Column) -> Column:
    """Heuristic language ID from character-class histograms.

    Pure-expression n-gram/charset heuristic: CJK -> zh, Cyrillic -> ru,
    kana -> ja, hangul -> ko; otherwise scores an English stopword probe
    vs accented-Latin density to split en / latin-other / unknown.
    """
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    kana = F.length(F.regexp_replace(text, r"[^぀-ヿ]", ""))
    hangul = F.length(F.regexp_replace(text, r"[^가-힯]", ""))
    cyr = F.length(F.regexp_replace(text, r"[^Ѐ-ӿ]", ""))
    accented = F.length(F.regexp_replace(text, r"[^À-ɏ]", ""))
    n = F.greatest(F.length(text), F.lit(1))
    en_stops = stopword_ratio(text)
    return (
        F.when(kana / n > 0.05, F.lit("ja"))
        .when(hangul / n > 0.05, F.lit("ko"))
        .when(cjk / n > 0.05, F.lit("zh"))
        .when(cyr / n > 0.05, F.lit("ru"))
        .when(en_stops > 0.08, F.lit("en"))
        .when(accented / n > 0.02, F.lit("latin-other"))
        .otherwise(F.lit("unknown"))
    )
