"""Spark column-expression helpers mirroring kernel string functions.

Where a kernel function has a direct Catalyst equivalent we expose it here so
relational plans stay JVM-side (reference F-inventory, SURVEY.md §2.8):
``normalise_str`` (F1) and the Levenshtein ratio (F14 — one of the few
direct built-in wins, ``F.levenshtein``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def normalise_str_col(col: Column) -> Column:
    """Column equivalent of kernel.normalize.normalise_str
    (lowercase; em/en dash -> '-'; thin space -> ' '; apostrophes -> '\"')."""
    c = F.lower(col)
    c = F.replace(c, F.lit("\u2014"), F.lit("-"))
    c = F.replace(c, F.lit("\u2013"), F.lit("-"))
    c = F.replace(c, F.lit(" "), F.lit(" "))
    c = F.replace(c, F.lit("&apos;"), F.lit('"'))
    c = F.replace(c, F.lit("'"), F.lit('"'))
    return c


def levenshtein_ratio_col(a: Column, b: Column) -> Column:
    """1 - levenshtein / max(len) — the reference's quality-check ratio
    (annotation/checks.py:168) as a pure Catalyst expression."""
    return 1.0 - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b))
