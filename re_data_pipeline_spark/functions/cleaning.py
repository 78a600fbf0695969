"""Lenient casting + normalization expressions (SURVEY §2.3 P8/P16/P17, §2.5 A4).

Reference semantics reproduced:

- ``safe_cast(val, type, default)`` — replace un-castable/NaN values with a
  default instead of failing (reference ``combine_broker_listings.py:167-175``,
  ``get_edm_building_permits.py:33-41``).  Spark-native: ``try_cast`` yields
  NULL on failure, ``coalesce`` applies the default.  Stays inside
  whole-stage codegen — no Python involved.
- ``normalize_sale_or_lease`` — keyword CASE chain with the reference's exact
  precedence (sale&lease → sale_or_lease, sale, sublease, lease — sublease is
  checked *before* lease; ``combine_broker_listings.py:78-94``).
- ``first_available`` — first non-null of several synonym keys in a map column
  (``get_AV_listings.py:50-58``).
- ``profile_completeness`` — percent non-null per column
  (``get_AV_listings.py:118``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Python float()/int() string acceptance (minus inf/nan spellings, underscore
# separators and non-ASCII digits — documented platform differences).  Spark's
# try_cast is LOOSER than Python here: it accepts Java-style typed-literal
# suffixes ('1D', '1.5F'), which the reference's float(val) rejects, so a bare
# try_cast returns 1.0 where the reference returns the default.
_STRICT_DOUBLE_RE = r"^[+-]?(\.[0-9]+|[0-9]+\.?[0-9]*)([eE][+-]?[0-9]+)?$"
_STRICT_INT_RE = r"^[+-]?[0-9]+$"
_INT_TYPES = {"int", "integer", "bigint", "long", "smallint", "short", "tinyint", "byte"}
_FLOAT_TYPES = {"double", "float", "real", "decimal", "numeric"}


def safe_cast(col: Column | str, dtype: str, default) -> Column:
    """Cast leniently; un-castable or null values become ``default``.

    Equivalent of the reference's ``safe_cast`` helper
    (``combine_broker_listings.py:167-175``): NaN/None/bad strings map to the
    default rather than raising.  ``try_cast`` alone is not enough — Spark
    accepts Java numeric-literal suffixes (``'1D'`` → 1.0) that Python's
    ``float()`` raises on — so numeric targets are guarded by a strict
    Python-``float()``/``int()`` shaped regex first.  Everything stays
    Catalyst-native (rlike + try_cast + coalesce), fully codegen'd.

    Numeric *columns* cast to int targets should be pre-cast by the caller
    (the guard assumes string inputs, like the reference's JSON payloads).
    """
    c = F.col(col) if isinstance(col, str) else col
    base = dtype.split("(")[0].strip().lower()
    if base in _INT_TYPES or base in _FLOAT_TYPES:
        pat = _STRICT_INT_RE if base in _INT_TYPES else _STRICT_DOUBLE_RE
        # strip ALL leading/trailing whitespace, not just ASCII space:
        # Python's float()/int() (the reference semantics) accept '\t7' and
        # '\n3.5', while F.trim strips ' ' only — a real divergence on
        # tab/newline-padded payloads (combine_broker_listings.py:167-175)
        t = F.regexp_replace(c.cast("string"), r"^\s+|\s+$", "")
        guarded = F.when(t.rlike(pat), t.try_cast(dtype))
        return F.coalesce(guarded, F.lit(default).cast(dtype))
    return F.coalesce(c.try_cast(dtype), F.lit(default).cast(dtype))


def try_numeric(col: Column | str) -> Column:
    """``pd.to_numeric(errors='coerce')`` analogue → DOUBLE or NULL
    (``aggregate_rental_rates.py:57-59,127``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def normalize_sale_or_lease(col: Column | str) -> Column:
    """Keyword-normalization CASE chain, reference precedence preserved
    (``combine_broker_listings.py:78-94``):

    1. contains both "sale" and "lease"  → ``sale_or_lease``
    2. contains "sale"                   → ``sale``
    3. contains "sublease"               → ``sublease``  (checked before lease)
    4. contains "lease"                  → ``lease``
    5. null input                        → ``''`` (reference except-branch)
    """
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return (
        F.when(c.isNull(), F.lit(""))
        .when(low.contains("sale") & low.contains("lease"), F.lit("sale_or_lease"))
        .when(low.contains("sale"), F.lit("sale"))
        .when(low.contains("sublease"), F.lit("sublease"))
        .when(low.contains("lease"), F.lit("lease"))
        .otherwise(c)
    )


def first_available(map_col: Column | str, keys: list[str]) -> Column:
    """First present key of a map column — the reference's price/size synonym
    lookup (``get_AV_listings.py:50-58``), as pure ``element_at`` coalescing."""
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    return F.coalesce(*[F.element_at(m, k) for k in keys])


def profile_completeness(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Percent-non-null profile per column, one output row
    (``get_AV_listings.py:118`` — ``df.count()/len(df)*100``).

    Single aggregation pass over all columns (no per-column scans); at scale
    this is one map-side-combined shuffle of a single row.
    """
    cols = cols or df.columns
    return df.agg(
        *[
            (F.count(F.col(c)) * 100.0 / F.count(F.lit(1))).alias(c)
            for c in cols
        ]
    )


def storeys_extract(col: Column | str) -> Column:
    """Five-case storeys-phrase extraction with the reference's precedence
    (``get_edm_zoning_bylaw_data.py:82-116``), case-insensitive:

    1. "up to X or Y storeys" → "Up to X or Y"
    2. "up to X storeys"      → "Up to X"
    3. "X to Y storeys"       → "X to Y"
    4. "X or Y storeys"       → "X or Y"
    5. "X storeys"            → "X"
    else NULL.
    """
    c = F.col(col) if isinstance(col, str) else col

    def ex(pat: str, idx: int) -> Column:
        return F.regexp_extract(c, f"(?i){pat}", idx)

    p1 = r"up\s*to\s*(\d+)\s*or\s*(\d+)\s*storeys"
    p2 = r"up\s*to\s*(\d+)\s*storeys"
    p3 = r"(\d+)\s*to\s*(\d+)\s*storeys"
    p4 = r"(\d+)\s*or\s*(\d+)\s*storeys"
    p5 = r"(\d+)\s*storeys"
    return (
        F.when(ex(p1, 1) != "", F.concat(F.lit("Up to "), ex(p1, 1), F.lit(" or "), ex(p1, 2)))
        .when(ex(p2, 1) != "", F.concat(F.lit("Up to "), ex(p2, 1)))
        .when(ex(p3, 1) != "", F.concat(ex(p3, 1), F.lit(" to "), ex(p3, 2)))
        .when(ex(p4, 1) != "", F.concat(ex(p4, 1), F.lit(" or "), ex(p4, 2)))
        .when(ex(p5, 1) != "", ex(p5, 1))
        .otherwise(F.lit(None).cast("string"))
    )


def day_of_iso(col: Column | str, default: int = 0) -> Column:
    """Day-of-month from an ISO date/timestamp string, 0 when unparseable —
    reference ``get_edm_building_permits.py:43-47``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.dayofmonth(F.try_to_timestamp(c)), F.lit(default))
