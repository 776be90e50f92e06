"""Document-level text analytics as pure Column expressions.

These are the training-data-pipeline primitives (language-ID, quality
scoring, token counting, fingerprinting) layered on top of the ER
engine. All JVM-side — they run at full codegen speed over a 100 TB
documents table; every one has an exact DuckDB SQL twin for the
driver's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny embedded stopword lists for the n-gram language heuristic.
_EN_STOP = ["the", "and", "of", "to", "in", "is", "a", "that", "for", "with"]
_ES_STOP = ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"]


def tokens(col: Column | str) -> Column:
    """Whitespace/punct tokenization (lowercased, empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " ")), " "),
        lambda t: t != "",
    )


TOKENS_SQL = (
    "list_filter(string_split(trim(regexp_replace(lower({col}),"
    " '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')"
)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern, restricted to the Java∩RE2 subset
# (no lookahead, so the original's trailing-space alternatives are
# dropped — whitespace is simply never captured): contractions, then
# optionally-space-prefixed letter runs / digit runs / punctuation
# runs, then stray apostrophes. Counts SUBWORD-SPLIT-ELIGIBLE pieces,
# the unit LLM token budgets are quoted in, vs tokens()'s
# whitespace/punct words; on English prose this runs ~1.0-1.3x the
# whitespace count (punctuation counts, "don't" -> 2).
BPE_PIECE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+|'"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex (the pieces a byte-pair encoder would then merge within).
    Pure JVM regexp_extract_all — the cheap proxy for "how many LLM
    tokens is this corpus" that a mixture/budget plan needs before any
    real tokenizer runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PIECE_PATTERN), F.lit(0)))


def bpe_token_count_sql(col: str) -> str:
    """DuckDB twin (single-quote-escaped pattern)."""
    pat = BPE_PIECE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))"


def _stop_ratio(toks: Column, stop: list[str]) -> Column:
    arr = F.array(*[F.lit(s) for s in stop])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(col: Column | str) -> Column:
    """Heuristic language id: compare EN vs ES stopword hit-ratio;
    'und' when neither clears 2%."""
    toks = tokens(col)
    en, es = _stop_ratio(toks, _EN_STOP), _stop_ratio(toks, _ES_STOP)
    return (
        F.when((en >= es) & (en > 0.02), F.lit("en"))
        .when((es > en) & (es > 0.02), F.lit("es"))
        .otherwise(F.lit("und"))
    )


def quality_score(col: Column | str) -> Column:
    """[0,1] doc-quality heuristic: length band + alpha ratio + stopword
    presence. Deterministic, monotone in each component."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    alpha = F.length(F.regexp_replace(F.lower(c), r"[^a-z]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    toks = tokens(c)
    stop = _stop_ratio(toks, _EN_STOP)
    len_band = F.when(n >= 200, F.lit(1.0)).when(n >= 50, F.lit(0.5)).otherwise(F.lit(0.0))
    return F.round(0.4 * len_band + 0.4 * alpha_ratio + 0.2 * F.least(stop * 4, F.lit(1.0)), 6)


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted set of
    tokens — the classic 'fingerprint key' for fuzzy exact-dedup."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


# ---- PII redaction ---------------------------------------------------------
# Patterns restricted to the regex subset where Java (Spark executors)
# and RE2 (the DuckDB oracle) agree exactly: character classes, bounded
# repeats, alternation-free bodies, ASCII \b word boundaries — no
# lookaround, no backreferences. Order matters: emails are redacted
# before the digit patterns so an address' local part can never be
# half-eaten by the phone rule, and credit cards before phones so a
# 4-4-4-4 digit run is never half-eaten as a 3-3-4 phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # 16-digit card: fully-dashed 4-4-4-4 or fully bare, first digit
    # restricted to the major-network IIN range 2-6 (Mastercard 2/5,
    # Amex 3, Visa 4, Discover 6). Space separators are deliberately
    # NOT accepted: scientific prose is full of space-separated 4-digit
    # runs ("1999 2000 2001 2002" year series, table rows) that a space
    # form would silently destroy; '.' is excluded so IPv4 octets can
    # never feed it; mixed-separator runs (4111-11111111-1111) and
    # bare 16-digit identifiers outside the IIN range (accession
    # numbers starting 0/1/7/8/9) survive by construction. Bare
    # in-range 16-digit runs are still redacted without a Luhn check —
    # a 16-digit non-card ID starting 2-6 is the residual FP class,
    # accepted because regexp can't checksum and recall on real cards
    # matters more here.
    (
        "cc",
        r"\b(?:[2-6][0-9]{3}-[0-9]{4}-[0-9]{4}-[0-9]{4}|[2-6][0-9]{15})\b",
        "<CC>",
    ),
    # (212) 555-0147 / (212) 555 0147 — the paren prefix is distinctive
    # enough to allow a space separator in the tail
    ("phone_paren", r"\([0-9]{3}\) ?[0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    # 212-555-0147 / 212.555.0147; a bare space form ("100 200 3000")
    # would match measurement triples, so spaces need the paren prefix
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
]


def pii_redact(col: Column | str) -> Column:
    """Replace emails / SSNs / credit cards / phone numbers (dash, dot,
    and paren forms) / IPv4 addresses with typed placeholders —
    the standard scrubbing pass before a corpus becomes training data.
    Pure sequential regexp_replace: JVM-side, codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_count(col: Column | str, kind: str) -> Column:
    """Match count for one PII kind on the UNREDACTED text (each kind
    counted independently, so counts are order-free)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))


# ---- repetition metrics (Gopher-style quality rules) -----------------------


def dup_token_ratio(col: Column | str) -> Column:
    """1 - |distinct tokens| / |tokens| — the fraction of the document
    that is repeated words (0 for empty docs)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n > 0, F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6)
    ).otherwise(F.lit(0.0))


def top_token_ratio(col: Column | str) -> Column:
    """Frequency of the most common token over total tokens, exact at
    any document length: sort the token array (O(n log n)), then one
    aggregate() pass finds the longest equal-token run. The previous
    formulation (per-distinct-token filter counts) was O(u·n) per
    document — a single pathological 1M-unique-token doc would cost
    ~10^12 comparisons in one codegen cell; the sorted-run scan is
    ~2·10^7 for the same doc and needs no length cap or mapInPandas
    fallback. tokens() drops empty strings, so the '' sentinel in the
    initial accumulator can never match a real token."""
    toks = tokens(col)
    n = F.size(toks)
    runs = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(n > 0, F.round(runs / n, 6)).otherwise(F.lit(0.0))


def dup_2gram_ratio(col: Column | str) -> Column:
    """1 - |distinct word 2-grams| / |2-grams| (0 when fewer than two
    tokens). The Gopher dup-ngram filter family's base case."""
    toks = tokens(col)
    n = F.size(toks)
    m = F.greatest(n - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat_ws(" ", a, b)
    )
    return F.when(
        n >= 2, F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / m, 6)
    ).otherwise(F.lit(0.0))


def simhash64(col: Column | str) -> Column:
    """60-bit SimHash over tokens (md5-derived token hashes, so any
    engine reproduces it). Bit b of the result is the sign of the
    +-1 vote sum over tokens at that bit position.

    Single-pass formulation: ONE aggregate folds the token-hash array
    into a 60-element vote array (zip_with inside the merge lambda),
    then one zip_with turns votes into bit values. The naive
    alternative — 60 separate aggregate() expressions — re-evaluates
    the token hashing 60x (Catalyst does not CSE across higher-order
    lambdas; measured ~8x slower)."""
    toks = tokens(col)
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(60)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 60),
        # bit test via mask (shiftright needs a literal shift amount)
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
