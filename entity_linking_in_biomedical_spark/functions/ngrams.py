"""Character n-grams, MinHash signatures and LSH band keys — all as
JVM-side Column expressions (no UDF, no Spark-ML vector objects).

Design notes (scale):
- Everything here is `transform`/`array_min`/`md5` over array columns,
  so it runs inside whole-stage codegen and never crosses into Python.
- md5 (not xxhash64) is used as the hash family because DuckDB computes
  the identical hex digest, which lets the driver's oracle verify the
  *exact* signature/band values, not just row counts. md5 is ~2-3x
  slower than xxhash64; for a pure-throughput deployment flip
  ``hash_expr`` below — every downstream operator is hash-agnostic.
- Taking `array_min` over hex strings is a valid min-hash: md5 output is
  uniform over the hex alphabet, and lexicographic string order on
  equal-length hex strings equals numeric order on the digest.

Replaces the reference's TF-IDF char 2-5-gram brute-force cosine
(candidate_generator.py:31-36, 89-127) as the approximate blocking
channel.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of character n-grams of ``col`` (strings shorter than n
    contribute themselves as a single gram)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(c) - F.lit(n - 1))),
        lambda i: F.substring(c, i, n),  # type: ignore[arg-type]
    )


def char_ngrams_multi(col: Column | str, ns: tuple[int, ...] = (2, 3)) -> Column:
    """Union of char n-gram sets for several n — the reference's char
    2-5-gram range (candidate_generator.py:31-36) rationale: short
    strings (acronyms) only overlap under small n, long strings get
    specificity from larger n."""
    arrs = [char_ngrams(col, n) for n in ns]
    out = arrs[0]
    for a in arrs[1:]:
        out = F.concat(out, a)
    return F.array_distinct(out)


def minhash_signature(grams: Column, num_hashes: int = 12) -> Column:
    """Array of ``num_hashes`` min-hash values (md5 hex strings) over a
    gram array. Empty gram arrays hash the empty string."""
    safe = F.when(F.size(grams) > 0, grams).otherwise(F.array(F.lit("")))

    def hasher(prefix: str):
        # NB: the inner lambda must take exactly one arg — a second arg
        # (even a defaulted one) makes PySpark pass the array index.
        return lambda g: F.md5(F.concat(F.lit(prefix), g))

    return F.array(
        *[F.array_min(F.transform(safe, hasher(f"mh{k}:"))) for k in range(num_hashes)]
    )


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Array of ``bands`` band keys; band j = md5 over rows [j*r, (j+1)*r)
    of the signature, prefixed with the band index so keys from
    different bands never collide after explode."""
    return F.array(
        *[
            F.md5(
                F.concat(
                    F.lit(f"b{j}:"),
                    F.concat_ws("|", F.slice(signature, j * rows + 1, rows)),
                )
            )
            for j in range(bands)
        ]
    )


def ngram_minhash_bands(
    col: Column | str,
    ns: tuple[int, ...] = (2, 3),
    num_hashes: int = 16,
    bands: int = 16,
) -> Column:
    """Convenience: string column -> array of LSH band keys.

    Default 16 bands x 1 row over mixed 2+3-grams: for surface-form
    blocking the miss probability for a Levenshtein-1/2 typo must be
    tiny even on 3-5 char acronyms (gram-Jaccard as low as ~0.25 there;
    (1-J)^16 < 1%) — the downstream scorer + hot-key cap absorb the
    extra false candidates. Near-dup *document* dedup uses multi-row
    bands (see operators/dedup.py) because there precision is the
    lever."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    return lsh_band_keys(
        minhash_signature(char_ngrams_multi(col, ns), num_hashes), bands, rows
    )


def duckdb_minhash_sql(col_sql: str, n: int = 3, num_hashes: int = 12) -> str:
    """DuckDB SQL expression producing the identical minhash signature
    (list of md5 hex strings) — used by oracle_sql() twins."""
    grams = (
        f"(case when length({col_sql}) > 0 then "
        f"[substr({col_sql}, i, {n}) for i in range(1, greatest(1, length({col_sql})-{n-1}) + 1)] "
        f"else [''] end)"
    )
    parts = ", ".join(
        f"list_min([md5('mh{k}:' || g) for g in {grams}])" for k in range(num_hashes)
    )
    return f"[{parts}]"


def duckdb_band_keys_sql(
    col_sql: str, n: int = 3, num_hashes: int = 12, bands: int = 6
) -> str:
    """DuckDB SQL expression for the identical LSH band-key array."""
    rows = num_hashes // bands
    sig = duckdb_minhash_sql(col_sql, n, num_hashes)
    parts = []
    for j in range(bands):
        elems = f"list_slice({sig}, {j * rows + 1}, {j * rows + rows})"
        parts.append(f"md5('b{j}:' || array_to_string({elems}, '|'))")
    return "[" + ", ".join(parts) + "]"
