"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Each helper returns a Column so it
composes into any plan; the deterministic formulas are intentionally
SQL-expressible so the DuckDB oracle can replicate them exactly.

Operators: tokenization, token counting (whitespace + BPE-ish regex),
quality scoring (length/punct/stopword ratios), language-ID heuristic,
document fingerprinting (normalized-text hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed stopword list shared with the oracle SQL (keep sorted, ASCII-only).
STOPWORDS = ("a", "and", "in", "of", "the", "to")

# BPE-ish token pattern: letter runs, single digits, single punctuation marks.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (after trim)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-ish regex tokens — a fast proxy for LLM token counts."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN))


def char_count(col: str | Column) -> Column:
    return F.length(col)


def stopword_count(col: str | Column) -> Column:
    toks = tokens(F.lower(col))
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def stopword_ratio(col: str | Column) -> Column:
    return stopword_count(col) / F.greatest(token_count(col), F.lit(1))


def digit_ratio(col: str | Column) -> Column:
    return F.regexp_count(col, F.lit("[0-9]")) / F.greatest(
        F.length(col), F.lit(1)
    )


def punct_count(col: str | Column) -> Column:
    return F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]"))


def avg_token_len(col: str | Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards stopword presence and
    moderate token length, penalizes punctuation/digit noise. The exact
    formula matters less than determinism — it is replicated in oracle SQL."""
    n_tok = token_count(col).cast("double")
    score = (
        F.least(n_tok / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stopword_ratio(col) * 4, F.lit(1.0)) * 0.4
        + (1 - F.least(digit_ratio(col) * 10, F.lit(1.0))) * 0.2
    )
    return F.round(score, 4)


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: English-stopword density. A real pipeline
    plugs in fastText/CLD3 here via a pandas UDF; the heuristic keeps the
    operator deterministic and oracle-checkable."""
    return (
        F.when(stopword_ratio(col) >= 0.05, F.lit("en"))
        .when(token_count(col) < 3, F.lit("short"))
        .otherwise(F.lit("unknown"))
    )


def normalize_text(col: str | Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprinting."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (md5 rather than xxhash so the DuckDB oracle computes the identical
    value.)"""
    return F.md5(normalize_text(col))
