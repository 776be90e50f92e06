"""Domain-level quality filtering: aggregate a per-doc quality signal
to the source domain and drop WHOLE domains whose average falls below
a floor (the RefinedWeb/C4-family "bad neighborhoods" rule — spam
farms, SEO mills and parked domains produce uniformly low-quality
pages, and cutting them wholesale is cheaper and higher-precision than
judging each page in isolation).

Determinism across engines (the DuckDB twin in ``__spark_entry__.py``
must replay the verdicts exactly): per-doc qualities are the 6-decimal
``quality_score`` doubles, summed as ``decimal(38,9)`` — an EXACT,
order-free aggregate, the repo-wide discipline for cross-engine float
sums — and the gate compares ``sum_quality < min_avg * n_docs`` in
decimal/integer arithmetic, so no division ever enters the decision.
The reported ``avg_quality`` is one final double division of exact
operands (display only).

Scale shape at 10^12 docs: quality is a codegen'd scan expression;
the rollup is ONE map-side-partial groupBy on the domain (the natural
short partition key — crawls are domain-clustered, so partial
aggregation collapses most rows before the exchange); the flagged
frame is one short row per BAD domain, and the gate folds back as one
key join against it (broadcast when the flag set is small — AQE
decides; the doc payload never shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text_metrics import quality_score

# Java∩RE2-safe host extraction, shared with the url_stats gate query.
DOMAIN_RE = "https?://([A-Za-z0-9.-]+)"


def domain_of(url_col: Column | str) -> Column:
    """Lowercased registrable host of an http(s) URL; '' when the
    value does not parse as one (those rows always PASS the gate —
    a missing domain is no evidence of spam)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(c, DOMAIN_RE, 1))


def domain_quality(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain quality rollup: (domain, n_docs, sum_quality
    decimal(38,9), avg_quality double). One scan + one map-side-partial
    groupBy; rows without a parseable domain aggregate under ''."""
    per_doc = docs.select(
        domain_of(url_col).alias("domain"),
        quality_score(text_col).cast("decimal(38,9)").alias("q"),
    )
    return (
        per_doc.groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("q").alias("sum_quality"),
        )
        .withColumn(
            "avg_quality",
            F.round(
                F.col("sum_quality").cast("double") / F.col("n_docs"), 6
            ),
        )
    )


def flag_bad_domains(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_avg_quality: float = 0.3,
    min_docs: int = 3,
) -> DataFrame:
    """Domain verdicts: ``domain_quality`` plus ``kept`` — False iff
    the domain has at least ``min_docs`` documents AND its decimal-
    exact mean quality is below ``min_avg_quality`` (small domains are
    never condemned on thin evidence; the '' pseudo-domain of
    unparseable URLs is always kept). The comparison is
    ``sum_quality < min_avg * n_docs`` in decimal arithmetic — no
    float division in the decision."""
    floor = F.lit(str(min_avg_quality)).cast("decimal(38,9)")
    bad = (
        (F.col("domain") != "")
        & (F.col("n_docs") >= int(min_docs))
        & (F.col("sum_quality") < floor * F.col("n_docs"))
    )
    return domain_quality(docs, url_col=url_col, text_col=text_col).withColumn(
        "kept", ~bad
    )


def drop_bad_domains(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_avg_quality: float = 0.3,
    min_docs: int = 3,
) -> DataFrame:
    """The transform: the caller's frame minus every row of a flagged
    domain — one short-key anti-join against the (tiny) bad-domain
    frame; all columns untouched."""
    bad_domains = flag_bad_domains(
        docs,
        url_col=url_col,
        text_col=text_col,
        min_avg_quality=min_avg_quality,
        min_docs=min_docs,
    ).filter(~F.col("kept"))
    return docs.withColumn("__dom", domain_of(url_col)).join(
        bad_domains.select(F.col("domain").alias("__dom")),
        "__dom",
        "left_anti",
    ).drop("__dom")
