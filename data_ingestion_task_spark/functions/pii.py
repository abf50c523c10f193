"""PII detection/redaction expression library (C4/Dolma-style corpus
scrub). Shared by the batch accounting query (plans/corpus_plans.py:
``pii_redaction``) and the streaming redacting sink
(streaming/enrich.py): both apply the SAME regexes in the same order,
so the batch query doubles as the streaming path's oracle-checked twin.

Pure JVM ``regexp_replace``/``regexp_count`` — no Python in the hot
path; the pattern subset (classes, bounded repetition, \\b, \\d) means
Java regex and DuckDB's RE2 agree match-for-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Detection regexes, keyed by rule name; applied in sorted order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\(\d{3}\) \d{3}-\d{4}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(text: Column) -> Column:
    """Apply every PII rule as a global ``regexp_replace`` (rule-name
    order); the library entry point a sink calls before writing."""
    out = text
    for rule in sorted(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[rule], f"[{rule.upper()}]")
    return out


def pii_span_count(text: Column) -> Column:
    """Total spans any rule would redact — the audit/monitoring
    counter (0 on redacted output)."""
    combined = "|".join(PII_PATTERNS[r] for r in sorted(PII_PATTERNS))
    return F.regexp_count(text, F.lit(combined))
