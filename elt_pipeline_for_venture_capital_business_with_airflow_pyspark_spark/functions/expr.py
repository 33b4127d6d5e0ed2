"""Scalar expression builders (SURVEY.md §2.6, F1-F12).

Everything here returns a ``Column`` built from ``pyspark.sql.functions``
— no UDFs, so the whole surface stays inside Catalyst/whole-stage
codegen (same discipline the reference keeps,
reference: dags/helper/transform.py:45-116).

Each builder documents the reference semantics it reproduces
(file:line) so parity can be audited.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "clean_address",
    "to_usd",
    "FX_RATES",
    "entity_type",
    "null_if_empty",
    "normalize_lower",
    "normalize_upper",
    "concat_address",
    "scrub_newlines",
    "date_key",
    "try_date_key",
]


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clean_address(col: str | Column) -> Column:
    """Address cleansing (F1, reference helper/transform.py:45-88).

    Semantics: lowercase → strip leading ``#``/``.`` runs → NULL when
    the result is only symbols/digits/underscores (``^[\\W\\d_]+$``) or
    its trimmed length ≤ 2 → otherwise trimmed value.
    """
    cleaned = F.regexp_replace(F.lower(_col(col)), r"^[#.]+", "")
    is_only_symbols = cleaned.rlike(r"^[\W\d_]+$")
    is_too_short = F.length(F.trim(cleaned)) <= 2
    return F.when(is_only_symbols | is_too_short, F.lit(None)).otherwise(F.trim(cleaned))


# Hardcoded FX table (F2, reference helper/transform.py:104-112).
# Kept as data so the same semantics can also run as a broadcast-join
# against a rates dimension; unknown currency passes through unchanged
# (quirk §2.9.7) but is still rounded to 2 (round sits outside the CASE).
FX_RATES: dict[str, float] = {
    "USD": 1.0,
    "CAD": 0.72,
    "EUR": 1.14,
    "SEK": 0.10,
    "AUD": 0.64,
    "JPY": 0.007,
    "GBP": 1.33,
    "NIS": 0.28,
}


def to_usd(currency_col: str | Column, amount_col: str | Column) -> Column:
    """Currency→USD conversion (F2, reference helper/transform.py:91-116):
    CASE over the 8 hardcoded rates, unknown → passthrough, then
    ``round(x, 2)`` applied to every branch."""
    cur, amt = _col(currency_col), _col(amount_col)
    expr: Column | None = None
    for code, rate in FX_RATES.items():
        branch = amt if rate == 1.0 else amt * rate
        expr = F.when(cur == code, branch) if expr is None else expr.when(cur == code, branch)
    assert expr is not None
    return F.round(expr.otherwise(amt), 2)


def to_usd_exact(currency_col: str | Column, amount_col: str | Column) -> Column:
    """Decimal-exact variant of :func:`to_usd`: amounts cast to
    DECIMAL(18,3) (exact for ≤3-decimal inputs) and rates to
    DECIMAL(6,4) so every product and the HALF_UP round(2) are exact
    decimal arithmetic — bit-identical across engines (used by the
    oracle-checked surface; the reference's own path multiplies
    decimal×double → double). Returns DOUBLE."""
    cur = _col(currency_col)
    amt = _col(amount_col).cast("decimal(18,3)")
    expr: Column | None = None
    for code, rate in FX_RATES.items():
        branch = amt * F.lit(rate).cast("decimal(6,4)")
        expr = F.when(cur == code, branch) if expr is None else expr.when(cur == code, branch)
    assert expr is not None
    return F.round(expr.otherwise(amt), 2).cast("double")


def entity_type(object_id: str | Column) -> Column:
    """Prefix dispatch (F3, reference extract_transform.py:64-70):
    ``c:``→'company', ``f:``→'fund', else NULL."""
    c = _col(object_id)
    return (
        F.when(c.startswith("c:"), F.lit("company"))
        .when(c.startswith("f:"), F.lit("fund"))
        .otherwise(F.lit(None))
    )


def null_if_empty(col: str | Column) -> Column:
    """''→NULL passthrough (F5, reference extract_transform.py:206-211)."""
    c = _col(col)
    return F.when(c.isNull() | (c == ""), F.lit(None)).otherwise(c)


def normalize_lower(col: str | Column) -> Column:
    """trim+lower, ''→NULL (F5, reference extract_transform.py:94-107)."""
    return null_if_empty(F.trim(F.lower(_col(col))))


def normalize_upper(col: str | Column) -> Column:
    """trim+upper, ''→NULL (F5, country codes,
    reference extract_transform.py:100,114-119)."""
    return null_if_empty(F.trim(F.upper(_col(col))))


def concat_address(a1: str | Column, a2: str | Column) -> Column:
    """Null-aware address concat (F4, reference extract_transform.py:76-92):
    both null → NULL; one null/empty → the other; else ``a1, a2``."""
    a, b = _col(a1), _col(a2)
    return (
        F.when(a.isNull() & b.isNull(), F.lit(None))
        .when(a.isNull() | (a == ""), b)
        .when(b.isNull() | (b == ""), a)
        .otherwise(F.concat_ws(", ", a, b))
    )


def scrub_newlines(col: str | Column) -> Column:
    """Newline→space scrub (F6, reference extract.py:62-64), applied by
    callers over every string column of a frame."""
    return F.regexp_replace(_col(col), r"\n", " ")


def date_key(col: str | Column) -> Column:
    """date/timestamp → int yyyymmdd smart key (F7,
    reference extract_transform.py:194-197)."""
    return F.date_format(_col(col), "yyyyMMdd").cast("int")


def try_date_key(col: str | Column) -> Column:
    """Same as :func:`date_key` but tolerant of dirty varchar dates
    (reference staging.relationships start_at/end_at are varchar,
    init_stg.sql:158-169): unparseable → NULL."""
    return F.date_format(F.try_to_timestamp(_col(col)), "yyyyMMdd").cast("int")
