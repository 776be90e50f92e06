"""Surface-form normalization as pure Column expressions (JVM-side).

The reference lowercases everywhere (candidate_generator.py:60,70;
dataset.py:66,74,89) and otherwise matches raw surfaces. ``norm_key``
is the blocking normalizer: lowercase, strip non-alphanumerics,
collapse whitespace — stays inside whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def norm_key(col: Column | str) -> Column:
    """Normalized surface-form key for exact-match blocking."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


# ANSI-SQL twin of norm_key for DuckDB oracles (same semantics).
NORM_KEY_SQL = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"
