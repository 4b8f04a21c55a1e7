"""PII detection / redaction over text columns — regex-only, JVM-side.

Pattern scope is the classic structured-PII trio (email, IPv4, US-style
phone); all three run as built-in ``regexp_*`` expressions inside
whole-stage codegen, so a scan+redact pass is scan-bound at 100 TB.
Email/IPv4 use only portable constructs (char classes, bounded
repetition, word boundaries). The phone pattern needs one negative
lookbehind — a leading ``\b`` cannot anchor the optional ``+``/``(``
prefix (both non-word, so no boundary exists after a space and the
prefix survives redaction); Java regex (Spark) supports it, RE2-class
engines must fall back to the boundary-anchored digit form.

The synthetic ``documents`` corpus contains no PII (lowercase word soup),
so this operator is exercised by fixture-based unit tests rather than a
catalog oracle row — a catalog entry whose expected output is all-zeros
would be a vacuous check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Order matters for redaction: emails first (an email contains no IP but
#: a phone regex could bite into digits of one), then IPs, then phones.
PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"(?<!\w)(?:\+?1[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b",
}


def pii_count_col(text: Column, kind: str) -> Column:
    """Occurrence count of one PII kind (long)."""
    return F.size(F.regexp_extract_all(text, F.lit(PATTERNS[kind]), 0)).cast(
        "long"
    )


def scan_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row PII profile: one count column per kind + total + has_pii."""
    text = F.col(text_col)
    counts = {k: pii_count_col(text, k) for k in PATTERNS}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def redact_pii(
    df: DataFrame, text_col: str, *, out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with ``[KIND]`` placeholders, applied in
    PATTERNS order so overlapping matches resolve deterministically."""
    redacted = F.col(text_col)
    for kind, pat in PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col or text_col, redacted)
