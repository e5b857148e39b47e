"""Text-analysis column expressions for training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

Everything here returns Column expressions built from pyspark.sql.functions
only — they compile into whole-stage codegen and hash-match DuckDB oracles.
No Python UDFs: at 100 TB these run on every document, so the hot path
must stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the language-ID heuristic (public,
# standard function-word sets; enough signal for a ratio-based guess).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
}

# BPE-ish tokenization regex: word pieces, numbers, or single non-space
# symbols — a public approximation of byte-pair pretokenizers.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text_col) -> Column:
    return F.split(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col), r"\s+")


def token_count(text_col) -> Column:
    """Count of BPE-ish tokens via regexp_extract_all (JVM-side)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


def whitespace_token_count(text_col) -> Column:
    return F.size(words(text_col))


def punct_ratio(text_col) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text_col, lang: str = "en") -> Column:
    """Fraction of distinct words that are stopwords of ``lang``."""
    w = F.array_distinct(words(text_col))
    hits = F.size(
        F.array_intersect(w, F.array(*[F.lit(s) for s in STOPWORDS[lang]]))
    )
    return hits / F.greatest(F.size(w), F.lit(1))


def mean_word_length(text_col) -> Column:
    w = words(text_col)
    total = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return total / F.greatest(F.size(w), F.lit(1))


def quality_score(text_col) -> Column:
    """Deterministic [0,1] quality heuristic: length band + low punctuation
    + plausible mean word length + some stopword mass. The standard
    pretraining-filter shape (cf. C4/Gopher rules), linearized."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(c)
    len_band = F.when((n >= 50) & (n <= 5000), 1.0).otherwise(
        F.when(n < 50, n / 50.0).otherwise(F.lit(5000.0) / n)
    )
    low_punct = 1.0 - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    mwl = mean_word_length(c)
    wl_band = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.5)
    sw = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    return F.round(
        0.4 * len_band + 0.3 * low_punct + 0.2 * wl_band + 0.1 * sw, 6
    )


def lang_guess(text_col) -> Column:
    """Argmax over per-language stopword hit counts; 'und' (undetermined)
    when no list scores ≥ 1 hit."""
    w = F.array_distinct(words(text_col))
    scores = {
        lang: F.size(
            F.array_intersect(w, F.array(*[F.lit(s) for s in sws]))
        )
        for lang, sws in STOPWORDS.items()
    }
    en, de, fr = scores["en"], scores["de"], scores["fr"]
    best = F.greatest(en, de, fr)
    return (
        F.when(best < 1, "und")
        .when(en == best, "en")  # deterministic tie order: en > de > fr
        .when(de == best, "de")
        .otherwise("fr")
    )


_HEX = "0123456789abcdef"


def hash_split_bucket(key_col) -> Column:
    """Deterministic [0, 256) bucket from the first two hex chars of
    md5(key) — the standard content-addressed train/val/test splitter.
    Engine-portable on purpose: md5 hex is identical everywhere (unlike
    xxhash64/crc32), and hex→int is spelled with ``instr`` so DuckDB can
    restate it verbatim. Map-only, no shuffle; the split survives
    re-partitioning, re-ingestion, and engine swaps because it depends
    only on the key bytes."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.md5(c.cast("string"))
    b1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    b2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return b1 * 16 + b2


def word_ngrams(text_col, n: int) -> Column:
    """Distinct space-joined word n-grams (words = lower + split on single
    space, matching the dedup-family oracles). Documents shorter than n
    words contribute their whole word sequence as one gram."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(c), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def fingerprint(text_col) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    word set (md5 is identical across engines, unlike xxhash)."""
    w = F.array_sort(F.array_distinct(words(text_col)))
    return F.md5(F.concat_ws("", w))
