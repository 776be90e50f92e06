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
same step tables below, so the gate query's hash check certifies the
parity. Pure codegen'd string ops — at 100 TB this is a free map-side
transform on the scan.

Structure (review-hardened):
- a string that does not start with http(s):// is returned UNCHANGED —
  the canonicalizer never mutates non-URL text;
- the fragment (``#...``) is dropped first;
- tracking parameters (utm_*, gclid, fbclid, msclkid, ref) are
  stripped ONLY inside the query string (from the first ``?`` on), so
  a path legitimately containing ``&ref=`` is untouched; delimiter
  debris is repaired (``&&``→``&``, ``?&``→``?``, trailing ``?``/``&``
  dropped);
- the scheme://host[:port] prefix is lowercased (path/query preserved);
- default ports are dropped when followed by end, ``/`` or ``?``
  (``:80`` for http, ``:443`` for https).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_URL_SHAPE = r"(?i)^https?://"
_FRAGMENT = r"#.*"
_PRE_QUERY = r"^[^?]*"
_QUERY = r"\?.*"

# (pattern, java_replacement, re2_replacement) — applied sequentially
# to the QUERY STRING only. Java backrefs are $1; RE2 backrefs are \1.
_QUERY_STEPS: list[tuple[str, str, str]] = [
    (r"([?&])(utm_[a-zA-Z0-9_]+|gclid|fbclid|msclkid|ref)=[^&]*", "$1", r"\1"),
    (r"&&+", "&", "&"),
    (r"\?&", "?", "?"),
    (r"[?&]+$", "", ""),
]
# applied to the reassembled URL after host lowercasing
_PORT_STEPS: list[tuple[str, str, str]] = [
    (r"^(https://[^/:?#]*):443($|[/?])", "$1$2", r"\1\2"),
    (r"^(http://[^/:?#]*):80($|[/?])", "$1$2", r"\1\2"),
]
_PREFIX = r"(?i)^(https?://[^/?#]*)"
_REST = r"(?i)^https?://[^/?#]*((/|\?|#|$).*)"


def canonical_url(col: Column | str) -> Column:
    c0 = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c0, _FRAGMENT, "")
    # tracking-param removal scoped to the query string: split at the
    # first '?', rewrite only the query part, reassemble
    pre = F.regexp_extract(c, _PRE_QUERY, 0)
    q = F.regexp_extract(c, _QUERY, 0)
    for pat, rep, _ in _QUERY_STEPS:
        q = F.regexp_replace(q, pat, rep)
    c = F.concat(pre, q)
    prefix = F.regexp_extract(c, _PREFIX, 1)
    rest = F.regexp_extract(c, _REST, 1)
    c = F.when(prefix == "", c).otherwise(F.concat(F.lower(prefix), rest))
    for pat, rep, _ in _PORT_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.when(F.regexp_extract(c0, _URL_SHAPE, 0) != "", c).otherwise(c0)


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin built from the same step tables (single-quote SQL
    literals; 'g' flag matches Spark's replace-all default)."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    c = f"regexp_replace({expr}, '{esc(_FRAGMENT)}', '', 'g')"
    pre = f"regexp_extract({c}, '{esc(_PRE_QUERY)}', 0)"
    q = f"regexp_extract({c}, '{esc(_QUERY)}', 0)"
    for pat, _, rep in _QUERY_STEPS:
        q = f"regexp_replace({q}, '{esc(pat)}', '{esc(rep)}', 'g')"
    c = f"({pre} || {q})"
    p = f"regexp_extract({c}, '{esc(_PREFIX)}', 1)"
    r = f"regexp_extract({c}, '{esc(_REST)}', 1)"
    c = f"(case when {p} = '' then {c} else lower({p}) || {r} end)"
    for pat, _, rep in _PORT_STEPS:
        c = f"regexp_replace({c}, '{esc(pat)}', '{esc(rep)}', 'g')"
    return (
        f"(case when regexp_extract({expr}, '{esc(_URL_SHAPE)}', 0) <> '' "
        f"then {c} else {expr} end)"
    )
