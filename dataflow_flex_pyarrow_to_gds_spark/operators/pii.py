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
so the catalog queries seed deterministic synthetic PII first via
:func:`seed_synthetic_pii` — the scan/redact rows are then non-vacuous
and a DuckDB oracle recomputes the same counts/redactions from the same
seeded column (see ``queries.py`` ``text_pii_scan``/``text_pii_redact``).
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

#: Lookbehind-free phone pattern for RE2-class engines (the DuckDB
#: oracle): matches the plain ddd-ddd-dddd digit form only. On text whose
#: phones are seeded in that form (see seed_synthetic_pii) it finds
#: exactly the same matches as PATTERNS["phone"].
PHONE_PATTERN_PORTABLE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def seed_synthetic_pii(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "text_pii"
) -> DataFrame:
    """Deterministically append synthetic PII to a PII-free corpus — the
    fixture generator behind the pii catalog rows (the driver's testdata
    is read-only, so the seeding happens in-query and the oracle mirrors
    it verbatim in SQL).

    Per row (id arithmetic, no randomness): ``id % 3 == 0`` gains an
    email, ``id % 4 == 0`` an IPv4, ``id % 5 == 0`` a phone. Phones are
    seeded in the plain ``ddd-ddd-dddd`` form so the Java pattern (with
    lookbehind) and the portable RE2 form find identical matches — the
    cross-engine parity the oracle check depends on.
    """
    i = F.col(id_col)
    email = F.when(
        i % 3 == 0,
        F.concat(
            F.lit(" reach user"), i.cast("string"), F.lit("@example.org")
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        i % 4 == 0,
        F.concat(
            F.lit(" from 10."),
            (i % 250).cast("string"),
            F.lit("."),
            (i % 100).cast("string"),
            F.lit(".25"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        i % 5 == 0,
        F.concat(
            F.lit(" call 415-555-01"),
            F.lpad((i % 100).cast("string"), 2, "0"),
        ),
    ).otherwise(F.lit(""))
    return df.withColumn(out_col, F.concat(F.col(text_col), email, ip, phone))


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
