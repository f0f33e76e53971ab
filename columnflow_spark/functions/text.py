"""Text-analysis Column builders for large-scale training-data pipelines:
tokenization, n-gram shingles, quality metrics, language-ID heuristics,
fingerprinting.  All built-in functions (JVM-side) — at 100 TB these run
inside WholeStageCodegen with no Python in the hot path.

Design constraint: every function must have an exact SQL twin runnable by
DuckDB for the oracle gate, so only engine-portable primitives are used
(split on single space, length arithmetic, md5, lower/trim).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny stopword set used by quality scoring + lang-id (deterministic)
STOPWORDS = ("the", "a", "of", "and")


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split; empty strings filtered)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    return total.cast("double") / F.size(toks)


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return n_stop.cast("double") / F.size(toks)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the unit of Jaccard/MinHash dedup)."""
    toks = tokens(text)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(k >= n, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def bpe_ish_token_count(text: Column, piece: int = 4) -> Column:
    """BPE-like subword count: each word contributes ceil(len/piece) tokens
    (a deterministic, SQL-expressible proxy for byte-pair tokenizers)."""
    toks = tokens(text)
    return F.aggregate(
        toks, F.lit(0), lambda a, t: a + F.ceil(F.length(t) / F.lit(float(piece))).cast("int")
    )


def normalized(text: Column) -> Column:
    """Canonical form for fingerprinting: lower + trim + collapsed spaces."""
    return F.regexp_replace(F.trim(F.lower(text)), " +", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 of the normalized text —
    the rolling-hash analog with an exact DuckDB twin)."""
    return F.md5(normalized(text))
