"""Sequence packing: map a token-counted corpus onto fixed-length
training sequences (the GPT-style concat-and-chunk layout — documents
concatenated in a deterministic order, the stream cut every ``seq_len``
tokens). Emits one row per (sequence, document-fragment): which slice
of which document lands in which training sequence — the manifest a
tokenize-and-pack job materializes before writing packed examples.

Scale shape: the hard part is the global prefix sum (every document
needs the total token count BEFORE it). A naive window over a global
ORDER BY collapses to a single partition — unusable at 10^12 docs.
This uses the classic two-level distributed prefix sum instead
(functions/prefix_sum.py, shared with the contiguous shard packer):

1. bucket documents by ``order_col div bucket_size`` (order-compatible
   ranges, so bucket i's documents all precede bucket i+1's),
2. within-bucket running sums — a window partitioned BY BUCKET, fully
   parallel,
3. per-bucket totals (tiny: one row per bucket) get their own running
   sum on a single partition — O(n_buckets) rows, not O(n_docs) — and
   are **broadcast** back as each bucket's starting offset.

The fragment explode is per-row (a document spanning k sequence
boundaries yields k+1 fragments via sequence()), so no shuffle follows
the prefix sum. Integer arithmetic throughout (`div`, not double
floor) so offsets stay exact past 2^53 tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.prefix_sum import bucketed_prefix_sum
from ..functions.text_metrics import token_count, tokens


def _pack_manifest(
    n: DataFrame,
    seq_len: int,
    id_col: str,
    bucket_size: int,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """Shared packing tail: ``n`` carries (id_col, __ord bigint, __len
    bigint > 0 [, *extra]); returns the fragment manifest (seq_id,
    id_col, frag_start, frag_len [, *extra]). Two-level distributed
    prefix sum, then a per-row fragment explode — no shuffle after the
    prefix sum."""
    s = F.lit(int(seq_len)).cast("bigint")
    o = bucketed_prefix_sum(
        n.withColumn("__bkt", F.expr(f"__ord div {int(bucket_size)}")),
        "__bkt",
        ("__ord",),
        "__len",
        "__o",
    )

    # fragment explode: sequences floor(o/S) .. floor((o+L-1)/S)
    frag = o.select(
        F.col(id_col),
        "__o",
        "__len",
        *extra,
        F.explode(
            F.sequence(
                F.expr("__o div " + str(int(seq_len))),
                F.expr(f"(__o + __len - 1) div {int(seq_len)}"),
            )
        ).alias("seq_id"),
    )
    start_g = F.greatest(F.col("__o"), F.col("seq_id") * s)
    end_g = F.least(F.col("__o") + F.col("__len"), (F.col("seq_id") + 1) * s)
    return frag.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        id_col,
        (start_g - F.col("__o")).cast("bigint").alias("frag_start"),
        (end_g - start_g).cast("bigint").alias("frag_len"),
        *extra,
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
    bucket_size: int = 100_000,
) -> DataFrame:
    """(seq_id, doc_id, frag_start, frag_len) fragment manifest.

    ``order_col`` (default: ``id_col``) must be numeric and totally
    ordered — concatenation order is ascending ``order_col``. Documents
    with zero tokens are dropped (they occupy no stream positions).
    ``frag_start`` is the fragment's token offset WITHIN its document;
    every sequence except the last receives exactly ``seq_len`` tokens.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    order_col = order_col or id_col
    s = F.lit(int(seq_len)).cast("bigint")

    n = docs.select(
        F.col(id_col),
        F.col(order_col).cast("bigint").alias("__ord"),
        token_count(text_col).cast("bigint").alias("__len"),
    ).filter(F.col("__len") > 0)
    return _pack_manifest(n, seq_len, id_col, bucket_size)


def pack_interleaved(
    docs: DataFrame,
    seq_len: int,
    media_token_budget: int = 64,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    order_col: str | None = None,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Packing manifest for INTERLEAVED text+media documents (the
    input_hint span shape: array<struct<kind,text,media_ref,offset>>):
    each doc's stream length = sum of its text spans' token counts plus
    ``media_token_budget`` per media span — the fixed placeholder/patch
    budget a multimodal trainer reserves per asset (Flamingo/MM1-style
    interleaved packing quotes budgets in exactly these units). The
    concat-and-chunk layout is then identical to :func:`pack_sequences`.

    -> (seq_id, doc_id, frag_start, frag_len, n_text_tokens, n_media):
    one row per (sequence, document-fragment), with the doc's span
    accounting carried so a packer can materialize examples without
    re-reading the spans. Zero-length docs (no text tokens AND no
    media) are dropped.

    Scale shape: the per-doc length is ONE row-local higher-order
    aggregate over the span array (no explode, no shuffle), then the
    same two-level distributed prefix sum as pack_sequences — a global
    ORDER BY window would collapse to one partition at 10^12 docs.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if media_token_budget < 0:
        raise ValueError("media_token_budget must be non-negative")
    order_col = order_col or id_col

    sp = F.col(spans_col)
    text_toks = F.aggregate(
        F.filter(sp, lambda s: s["kind"] == F.lit("text")),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc + F.size(tokens(F.coalesce(s["text"], F.lit("")))),
    )
    n_media = F.size(F.filter(sp, lambda s: s["kind"] == F.lit("media")))
    n = docs.select(
        F.col(id_col),
        F.col(order_col).cast("bigint").alias("__ord"),
        text_toks.cast("bigint").alias("n_text_tokens"),
        n_media.cast("bigint").alias("n_media"),
    ).select(
        id_col,
        "__ord",
        "n_text_tokens",
        "n_media",
        (
            F.col("n_text_tokens")
            + F.col("n_media") * F.lit(int(media_token_budget)).cast("bigint")
        ).alias("__len"),
    ).filter(F.col("__len") > 0)
    return _pack_manifest(
        n, seq_len, id_col, bucket_size, extra=("n_text_tokens", "n_media")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking of long documents — the per-document
    counterpart of :func:`pack_sequences` (which cuts a concatenated
    STREAM; this cuts each document alone). The unit of an embedding /
    retrieval-index build, where a fragment must never span two
    documents and context overlap between adjacent chunks is wanted.

    Windows start at 0, ``stride``, 2*``stride``, ...; each takes
    ``chunk_tokens`` tokens (the last takes what remains). With
    ``stride`` < ``chunk_tokens`` adjacent chunks overlap by
    ``chunk_tokens - stride`` tokens. ``stride`` defaults to
    ``chunk_tokens`` (disjoint). Zero-token docs are dropped; docs
    shorter than one chunk emit exactly one chunk.

    -> (doc_id, chunk_id, n_chunks, chunk_len, chunk_text), one row per
    chunk, chunk_text re-joined with single spaces from the
    whitespace/punct token array (functions/text_metrics.tokens — the
    DuckDB twin is TOKENS_SQL, already certified by the token_count
    oracle).

    Scale shape: entirely row-local — tokenize, an integer n_chunks
    expression, one sequence() explode, slice + array_join per chunk.
    ZERO shuffles; Catalyst keeps the whole plan in one codegen stage.
    Integer `div` arithmetic throughout (no float ceil, same rule as
    the packers) so chunk counts are exact at any length.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    stride = stride or chunk_tokens
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in (0, chunk_tokens], got {stride}"
        )
    c, s = int(chunk_tokens), int(stride)
    t = (
        docs.select(F.col(id_col), tokens(text_col).alias("__t"))
        .withColumn("__n", F.size("__t").cast("bigint"))
        .filter(F.col("__n") > 0)
    )
    n_chunks = F.when(F.col("__n") <= c, F.lit(1).cast("bigint")).otherwise(
        F.expr(f"(__n - {c} + {s} - 1) div {s}") + F.lit(1)
    )
    exploded = t.withColumn("n_chunks", n_chunks).select(
        F.col(id_col),
        F.col("__t"),
        F.col("__n"),
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int"))).alias(
            "chunk_id"
        ),
    )
    start = (F.col("chunk_id").cast("bigint") * s).alias("__start")
    exploded = exploded.withColumn("__start", start).withColumn(
        "chunk_len", F.least(F.lit(c).cast("bigint"), F.col("__n") - F.col("__start"))
    )
    return exploded.select(
        id_col,
        "chunk_id",
        "n_chunks",
        "chunk_len",
        F.array_join(
            F.slice(
                "__t", (F.col("__start") + 1).cast("int"), F.col("chunk_len").cast("int")
            ),
            " ",
        ).alias("chunk_text"),
    )
