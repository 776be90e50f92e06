"""URL canonicalization: the normalize-before-dedup step of a crawl
curation pipeline (tracking-parameter strip, fragment strip, scheme +
host lowercasing, default-port removal). Raw crawl URLs differ in ways
that don't change the fetched resource; deduplicating or domain-
bucketing on the raw string over-counts — w3lib/scrapy's
canonicalize_url is the reference behavior for the subset implemented
here.

Every step is a regex from the Java∩RE2 common subset (NO lookahead —
RE2 has none) and both engines apply the identical step sequence: the
Spark Column expression and the DuckDB SQL twin are generated from the
same step table below, so the gate query's hash check certifies the
parity. Pure codegen'd string ops — at 100 TB this is a free map-side
transform on the scan.

Steps, in order:
1. drop the fragment (``#...``),
2. drop tracking parameters (utm_*, gclid, fbclid, msclkid, ref) with
   their ``?``/``&`` delimiter kept, then collapse the delimiter
   debris (``&&``→``&``, ``?&``→``?``, trailing ``?``/``&`` dropped),
3. lowercase the scheme://host[:port] prefix (path/query untouched),
4. strip default ports (``:80`` for http, ``:443`` for https).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (pattern, java_replacement, re2_replacement) — applied sequentially.
# Java backrefs are $1; RE2 (DuckDB) backrefs are \1.
_STEPS_PRE_LOWER: list[tuple[str, str, str]] = [
    (r"#.*", "", ""),
    (r"([?&])(utm_[a-zA-Z0-9_]+|gclid|fbclid|msclkid|ref)=[^&]*", "$1", r"\1"),
    (r"&&+", "&", "&"),
    (r"\?&", "?", "?"),
    (r"[?&]+$", "", ""),
]
_STEPS_POST_LOWER: list[tuple[str, str, str]] = [
    (r"^(https://[^/:?#]*):443($|/)", "$1$2", r"\1\2"),
    (r"^(http://[^/:?#]*):80($|/)", "$1$2", r"\1\2"),
]
_PREFIX = r"(?i)^(https?://[^/?#]*)"
_REST = r"(?i)^https?://[^/?#]*((/|\?|#|$).*)"


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep, _ in _STEPS_PRE_LOWER:
        c = F.regexp_replace(c, pat, rep)
    # lowercase scheme://host[:port]; a non-URL string (no match) is
    # passed through unchanged via the empty-prefix guard
    prefix = F.regexp_extract(c, _PREFIX, 1)
    rest = F.regexp_extract(c, _REST, 1)
    c = F.when(prefix == "", c).otherwise(F.concat(F.lower(prefix), rest))
    for pat, rep, _ in _STEPS_POST_LOWER:
        c = F.regexp_replace(c, pat, rep)
    return c


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin built from the same step table (single-quote SQL
    literals; 'g' flag matches Spark's replace-all default)."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    c = expr
    for pat, _, rep in _STEPS_PRE_LOWER:
        c = f"regexp_replace({c}, '{esc(pat)}', '{esc(rep)}', 'g')"
    p = f"regexp_extract({c}, '{esc(_PREFIX)}', 1)"
    r = f"regexp_extract({c}, '{esc(_REST)}', 1)"
    c = f"(case when {p} = '' then {c} else lower({p}) || {r} end)"
    for pat, _, rep in _STEPS_POST_LOWER:
        c = f"regexp_replace({c}, '{esc(pat)}', '{esc(rep)}', 'g')"
    return c
