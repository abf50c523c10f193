"""Normalization library: money, dates, account numbers, vendors,
addresses, canonicalizers.

Re-expresses the reference's row-at-a-time normalizers
(`code/python/post_pro_9_8.py:1-110`, `code/python/postpro_star_9_3.py:17-119`,
`code/python/doc_promp_8_21.py:8-32`, `code/python/new_prompt_7_2:64-120`)
as composable Spark ``Column`` expressions. Everything here is
JVM-side (regexp/when/decimal) — no Python UDFs — so it runs inside
whole-stage codegen and scales linearly with input at 100 TB.

ANSI-safety: all casts/parses use ``try_*`` variants so the same
expressions run under ``spark.sql.ansi.enabled`` true or false.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Money (reference: money_or_null, code/python/post_pro_9_8.py:1-41)
# ---------------------------------------------------------------------------


def money_is_negative(s: Column) -> Column:
    """Negativity flags: leading '-', parenthesized, trailing '-', or
    'CR' credit suffix (post_pro_9_8.py:8-19)."""
    t = F.trim(s)
    return (
        t.startswith("-")
        | t.rlike(r"^\(.*\)$")
        | t.rlike(r"-\s*$")
        | F.upper(t).rlike(r"CR\s*$")
    )


def money_decimal(s: Column) -> Column:
    """Parse a messy money string to DECIMAL(18,2) (signed); NULL when
    unparseable. Mirrors money_or_null's strip-non-[0-9.] step."""
    digits = F.regexp_replace(F.trim(s), r"[^0-9.]", "")
    dec = F.when(
        digits.rlike(r"^[0-9]+(\.[0-9]*)?$") | digits.rlike(r"^\.[0-9]+$"),
        digits.try_cast("decimal(18,2)"),
    )
    return F.when(money_is_negative(s), -dec).otherwise(dec)


def format_money(amount: Column) -> Column:
    """DECIMAL(18,2) → canonical display string ``-$1,053.75``
    (post_pro_9_8.py:33-38). NULL passes through."""
    body = F.concat(F.lit("$"), F.format_number(F.abs(amount), 2))
    return F.when(amount.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(amount < 0, F.concat(F.lit("-"), body)).otherwise(body)
    )


def money_or_null(s: Column) -> Column:
    """Full normalizer: messy string → canonical ``-$#,##0.00`` or NULL."""
    return format_money(money_decimal(s))


def ensure_negative_money(display: Column) -> Column:
    """Force credits negative, except exactly $0.00
    (post_pro_9_8.py:75-110)."""
    amt = money_decimal(display)
    return (
        F.when(display.isNull(), F.lit(None).cast("string"))
        .when(amt == 0, F.lit("$0.00"))
        .when(amt > 0, F.concat(F.lit("-"), F.trim(display)))
        .otherwise(F.trim(display))
    )


# ---------------------------------------------------------------------------
# Dates (reference: _date_sane, code/python/post_pro_9_8.py:48-73)
# ---------------------------------------------------------------------------

DATE_FORMATS = ["M/d/yyyy", "M/d/yy", "MMM d, yyyy", "MMMM d, yyyy", "yyyy-M-d"]


def parse_date_multi(s: Column) -> Column:
    """First format that parses wins (same precedence as the reference
    loop)."""
    t = F.trim(s)
    return F.coalesce(
        *[F.try_to_timestamp(t, F.lit(fmt)).cast("date") for fmt in DATE_FORMATS]
    )


def date_sane(s: Column, today: Column | None = None) -> Column:
    """Return the ORIGINAL string when it parses in any accepted format
    and lands in [1900-01-01, today+370d]; else NULL. The reference
    keeps the printed format, only validating (post_pro_9_8.py:61-71)."""
    if today is None:
        today = F.current_date()
    d = parse_date_multi(s)
    ok = d.isNotNull() & (d >= F.lit("1900-01-01").cast("date")) & (d <= F.date_add(today, 370))
    return F.when(ok, F.trim(s)).otherwise(F.lit(None).cast("string"))


# ---------------------------------------------------------------------------
# Account numbers (reference: code/python/doc_promp_8_21.py:8-23)
# ---------------------------------------------------------------------------


def acct_last4(s: Column) -> Column:
    """Only masked forms ``x...NNNN`` / ``ending in:NNNN`` yield the
    last-4; anything else → NULL (never expose full numbers)."""
    t = F.trim(s)
    masked = F.regexp_extract(t, r"(?i)^x+(\d{4})$", 1)
    ending = F.regexp_extract(t, r"(?i)ending\s+in\s*:?\s*(\d{4})$", 1)
    out = F.when(masked != "", masked).when(ending != "", ending)
    return out.otherwise(F.lit(None).cast("string"))


# ---------------------------------------------------------------------------
# Vendors / addresses (reference: doc_promp_8_21.py:25-32, postpro_star_9_3.py:17-52)
# ---------------------------------------------------------------------------


def normalize_vendor(s: Column) -> Column:
    """Canonical vendor names: collapse-space-and-case compare, e.g. any
    spacing/case of 'CapitalOne' → 'Capital One'."""
    squash = F.regexp_replace(F.lower(F.trim(s)), r"\s+", "")
    return (
        F.when(squash == "capitalone", F.lit("Capital One"))
        .when(squash == "bankofamerica", F.lit("Bank of America"))
        .when(squash == "wellsfargo", F.lit("Wells Fargo"))
        .otherwise(F.trim(s))
    )


def clean_address(s: Column) -> Column:
    """Whitespace collapse, ``P.O. Box``→``PO Box``, comma spacing."""
    t = F.regexp_replace(F.trim(s), r"\s+", " ")
    t = F.regexp_replace(t, r"(?i)p\.?\s*o\.?\s*box", "PO Box")
    t = F.regexp_replace(t, r"\s*,\s*", ", ")
    t = F.regexp_replace(t, r",\s*$", "")
    return t


# ---------------------------------------------------------------------------
# Canonicalizers (reference: new_prompt_7_2:76-120, prompt_3_7.py:1-16)
# ---------------------------------------------------------------------------


def cleanse(s: Column) -> Column:
    """GT-comparison canonicalizer: strip ``$ , ' [ ] "`` then
    upper+trim (new_prompt_7_2:119-120)."""
    return F.upper(F.trim(F.regexp_replace(s, "[$,'\\[\\]\"]", "")))


def null_canonical(s: Column) -> Column:
    """Presentation-edge NULL: SQL NULL / '' / 'no' / 'none' → literal
    'NULL' string (new_prompt_7_2:76-79). Engine-internal code keeps
    SQL NULL; this is applied only at output boundaries."""
    t = F.trim(s)
    return F.when(
        t.isNull() | (t == "") | F.lower(t).isin("no", "none", "null"), F.lit("NULL")
    ).otherwise(t)


def reference_number_extract(s: Column) -> Column:
    """17-char reference ``YYYYMMDD DP \\d{7}`` with a real-date check
    (prompt_3_7.py:1-16)."""
    m = F.regexp_extract(s, r"(\d{8})DP(\d{7})", 0)
    datepart = F.regexp_extract(s, r"(\d{8})DP\d{7}", 1)
    ok = (m != "") & F.try_to_timestamp(datepart, F.lit("yyyyMMdd")).isNotNull()
    return F.when(ok, m).otherwise(F.lit(None).cast("string"))


def combined_label(label: Column, first_pg: Column) -> Column:
    """``label:first_pg`` codec build (Faiss_2_10.py:528-529)."""
    return F.concat_ws(":", label, first_pg.cast("string"))


def split_combined_label(s: Column) -> tuple[Column, Column]:
    """Codec split (Neww_Fai.py:1083-1092)."""
    parts = F.split(s, ":")
    return parts.getItem(0), parts.getItem(1)


# ---------------------------------------------------------------------------
# Person/address matching normalizers (SoR confirmation, conf_5_22.py)
# ---------------------------------------------------------------------------

#: canonical nickname → first-name map (conf_5_22.py nickname rule)
NICKNAME_MAP = {
    "bill": "william",
    "bob": "robert",
    "liz": "elizabeth",
    "peggy": "margaret",
    "jack": "john",
}


def normalize_first_name(c: Column) -> Column:
    """Nickname-canonicalizing first-name normalizer: lower/trim, then
    map known nicknames to canonical firsts (conf_5_22.py)."""
    nick_map = F.create_map(
        *[F.lit(x) for pair in NICKNAME_MAP.items() for x in pair]
    )
    t = F.lower(F.trim(c))
    return F.coalesce(F.element_at(nick_map, t), t)


def normalize_street_address(c: Column) -> Column:
    """Street-abbreviation normalizer (St↔Street, Ave↔Avenue, Rd↔Road)
    + whitespace collapse — key_validation_4_17.py:17-27 rules."""
    t = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    t = F.regexp_replace(t, r"\bstreet\b", "st")
    t = F.regexp_replace(t, r"\bavenue\b", "ave")
    t = F.regexp_replace(t, r"\broad\b", "rd")
    return t
