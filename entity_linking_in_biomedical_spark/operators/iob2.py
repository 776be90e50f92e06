"""IOB2 token tagging — the reference's containment join (J5).

The reference tags every stanza token against mention spans: B if
token.start == span.start, I if span.start < token.start < span.end,
else O (medmention_preprocess.py:226-237; duplicated with an
indentation bug at src/data/pre_processing.py:202-214 that drops
tokens — not replicated here). Both sides of the containment predicate
live in the same row (the doc's text and its mention spans), so the
idiomatic Spark form is an intra-row array computation in one Arrow
pandas UDF — zero shuffle, in contrast to a generic interval join.

Also provides the per-mention sentence explosion (the reference writes
one copy of each sentence per mention it contains, with only that
mention B-tagged — medmention_preprocess.py:242-270) as a plain
posexplode over the tagged output.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, functions as F

TAGGED_SCHEMA = "array<struct<token:string, start:int, tag:string>>"


def _tokenize_with_offsets(text: str, base: int) -> list[tuple[str, int]]:
    return [(m.group(0), base + m.start()) for m in re.finditer(r"\S+", text or "")]


def _tag_doc(spans) -> list[dict]:
    """One document's spans -> flat token list with IOB2 tags."""
    mentions = []
    for s in spans:
        if s["kind"] == "mention":
            start = s["offset"]
            mentions.append((start, start + len(s["text"] or "")))
    out = []
    for s in spans:
        if s["kind"] != "text":
            continue
        for tok, start in _tokenize_with_offsets(s["text"], s["offset"]):
            tag = "O"
            for mb, me in mentions:
                if start == mb:
                    tag = "B"
                    break
                if mb < start < me:
                    tag = "I"
                    break
            out.append({"token": tok, "start": start, "tag": tag})
    return out


def iob2_tags(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> (doc_id, tokens array<struct<token,
    start, tag>>)."""

    @F.pandas_udf(TAGGED_SCHEMA)
    def _udf(spans: pd.Series) -> pd.Series:
        return spans.apply(_tag_doc)

    return documents.select("doc_id", _udf("spans").alias("tokens"))


def per_mention_token_rows(documents: DataFrame) -> DataFrame:
    """The reference's per-mention sentence explosion, generalized: one
    row per (doc, mention B-token) carrying the doc's token sequence —
    posexplode keeps document order (W8)."""
    tagged = iob2_tags(documents)
    return (
        tagged.select(
            "doc_id",
            "tokens",
            F.posexplode(F.filter("tokens", lambda t: t["tag"] == "B")).alias(
                "mention_idx", "b_token"
            ),
        )
        .select("doc_id", "mention_idx", F.col("b_token.start").alias("mention_start"), "tokens")
    )


def mention_stats(documents: DataFrame) -> DataFrame:
    """A5: mention/media/text span counts per doc — pure JVM column
    aggregates over the span array (no explode, no shuffle)."""
    def n_of(kind: str):
        return F.size(F.filter("spans", lambda s: s["kind"] == kind))

    return documents.select(
        "doc_id",
        n_of("mention").alias("n_mentions"),
        n_of("media").alias("n_media"),
        n_of("text").alias("n_text"),
        F.size("spans").alias("n_spans"),
    )
