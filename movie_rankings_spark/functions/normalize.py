"""Title normalization + rank coercion expressions.

Re-expresses the reference's entity-resolution pipeline
(/root/reference/top_movies.py:131-135 and the parse-time overrides at
top_movies.py:76-77,91-94) as native Catalyst expressions. All of these
collapse into a single projection under the collapse-projects rule, so
the whole normalization is one codegen'd map stage — no shuffle, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Entity-resolution overrides, applied to the RAW title before
#: normalization (mirrors the reference's parse-time renames,
#: top_movies.py:76-77 and :91-94; README.md:9 calls for "a centralized
#: conversion list" — this is it).
ALIAS_OVERRIDES: tuple[tuple[str, str], ...] = (
    ("Seven", "Se7en"),
    ("Star Wars", "Star Wars: Episode IV — A New Hope"),
    ("Indiana Jones and the Raiders of the Lost Ark", "Raiders of the Lost Ark"),
)

#: Trailing "(YYYY)" year suffix (top_movies.py:27).
TRAIL_YR_PATTERN = r"^(.*?)\s*\(\d{4}\)\s*$"


def apply_alias_overrides(title: Column) -> Column:
    """CASE chain of the centralized rename list.

    For a large alias list this should become a broadcast-joined
    dimension table; at 3 entries a literal CASE is the better plan
    (constant-folded, no join at all).
    """
    expr = title
    for raw, canonical in reversed(ALIAS_OVERRIDES):
        expr = F.when(title == raw, F.lit(canonical)).otherwise(expr)
    return expr


def normalize_title(title: Column) -> Column:
    """`title_comp` derivation (top_movies.py:132-135): strip
    non-alphanumerics, collapse runs of whitespace, lowercase."""
    stripped = F.regexp_replace(title, r"[^a-zA-Z0-9 ]", "")
    collapsed = F.regexp_replace(stripped, r"\s{2,}", " ")
    return F.lower(collapsed)


def coerce_rank(rank: Column) -> Column:
    """`to_numeric(errors='coerce').fillna(0).astype(int)` parity
    (top_movies.py:131): unparseable ranks become 0, never an error —
    try_cast keeps this ANSI-safe."""
    return F.coalesce(rank.cast("string").try_cast("int"), F.lit(0))


def strip_year_suffix(title: Column) -> Column:
    """Regex year-strip (top_movies.py:88-89): drop a trailing
    " (YYYY)", keep the title unchanged when there is no year. Used by
    the ingestion dialects, NOT by the analytics layer (the reference
    strips years at parse time only)."""
    extracted = F.regexp_extract(title, TRAIL_YR_PATTERN, 1)
    return F.when(title.rlike(TRAIL_YR_PATTERN), F.trim(extracted)).otherwise(title)
