"""PII detection and redaction for training corpora.

A standard pre-training cleaning stage (alongside dedup and quality
filtering): count and strip emails, IPv4 addresses, SSN-shaped ids and
international-format phone numbers before text ever reaches a
tokenizer. Everything is JVM-side ``regexp_extract_all`` /
``regexp_replace`` — no UDFs, shuffle-free, scales as a pure map over
the corpus.

Patterns are deliberately conservative (high precision, dialect-portable
between Java regex and RE2 so the DuckDB oracle runs the SAME
expressions): no lookarounds, no backreferences. Callers needing
higher recall (obfuscated emails, national phone formats) can pass
their own pattern dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["PII_PATTERNS", "pii_stats", "pii_redact"]

# name -> (regex, replacement token). Order matters for redaction:
# SSN before phone so `123-45-6789` is consumed by the more specific
# pattern first.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\+\d[\d\- ]{7,14}\d", "<PHONE>"),
}


def pii_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document PII hit counts: (id, n_<name>..., n_pii_total).
    Pure map — no shuffle, no UDF."""
    pats = patterns or PII_PATTERNS
    counts = {
        name: F.size(F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(0)))
        for name, (rx, _) in pats.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii_total"),
    )


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace every PII match with its placeholder token, applying
    patterns in dict order (most-specific first). Returns the input
    with ``out_col`` (default: ``text_col`` replaced in place)."""
    pats = patterns or PII_PATTERNS
    expr = F.col(text_col)
    for _, (rx, token) in pats.items():
        expr = F.regexp_replace(expr, rx, token)
    return df.withColumn(out_col or text_col, expr)
