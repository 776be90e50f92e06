"""Crawl-cleaning operators: C4 line/page heuristics and CCNet-style
corpus-wide duplicate-line removal.

These are the earliest gates of a web-crawl training-data pipeline —
they run before quality scoring, LM perplexity, or any dedup family in
``operators/dedup.py``, and complement them at a different granularity:
``remove_duplicate_passages`` needs ``window_k`` consecutive tokens,
while navigation chrome ("share this page", cookie banners) is usually
a short single line repeated across millions of pages.

Both operators are deterministic pure functions of the input so the
DuckDB oracle twins in ``__spark_entry__.py`` replay them exactly.

Scale shape at 10^12 docs:
- ``c4_clean`` is entirely row-local whole-stage-codegen column
  expressions — ZERO shuffles, one scan (plan-asserted in
  tests/test_boilerplate.py).
- ``line_dedup`` pays exactly two shuffles: ONE map-side-partial
  groupBy on the 16-byte line hash (the corpus-wide duplicate
  detection a global rule cannot avoid) and ONE doc_id fold-back of
  drop positions; the rewrite itself is a row-local higher-order
  filter over the original rows — document payloads are never
  re-assembled from exploded parts (same discipline as
  ``operators/multimodal.drop_duplicate_media``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# C4 (Raffel et al. 2020, "Exploring the Limits of Transfer Learning
# with a Unified Text-to-Text Transformer", §2.2) line/page rules.
# The paper additionally drops pages containing words from a public
# blocklist; that list is corpus-policy, so it is a parameter here
# (default empty) rather than baked in.
C4_MIN_WORDS_PER_LINE = 3
C4_MIN_SENTENCES_PER_PAGE = 5
# terminal punctuation per the paper: period, exclamation mark,
# question mark, end quotation mark
C4_TERMINAL_RE = '[.!?"]$'
C4_SENTENCE_MARK_RE = "[.!?]"


def _c4_line_ok(t: Column) -> Column:
    """C4's per-line retention predicate over an already-trimmed line
    (the split array is trimmed once via ``transform`` before this
    filter, so no expression re-evaluates per reference — the
    lambda-CSE discipline of functions/lambdas.py)."""
    return (
        t.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(t, r"\s+")) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(t).contains("javascript")
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocked_phrases: tuple[str, ...] = (),
) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2): keep only lines that end
    in terminal punctuation, have >= 3 words, and do not mention
    "javascript"; then drop the whole page if the retained text has
    fewer than 5 sentences, or the ORIGINAL page contains "lorem
    ipsum", a curly brace ``{``, or any ``blocked_phrases`` entry
    (case-insensitive).

    -> (doc_id, n_lines, n_kept_lines, n_sentences, cleaned_text), one
    row per SURVIVING page. Entirely row-local: one scan, zero
    shuffles, all whole-stage-codegen expressions.

    Sentence count follows the paper's spirit deterministically: the
    number of sentence-terminal marks ``[.!?]`` in the retained text
    (a kept line has >= 1 by construction, so pages with >= 5 kept
    declarative lines always survive the sentence rule).
    """
    lines = F.split(F.col(text_col), "\n")
    # NOTE: must be a one-arg lambda — passing F.trim directly would
    # bind transform's optional (element, index) form to trim's
    # deprecated two-parameter signature and trim the wrong characters
    kept = F.filter(F.transform(lines, lambda l: F.trim(l)), _c4_line_ok)
    cleaned = F.array_join(F.col("_kept"), "\n")
    n_sentences = F.length(F.col("_cleaned")) - F.length(
        F.regexp_replace(F.col("_cleaned"), C4_SENTENCE_MARK_RE, "")
    )
    lowered = F.lower(F.col(text_col))
    page_ok = (
        (F.col("n_sentences") >= C4_MIN_SENTENCES_PER_PAGE)
        & ~F.col("_lowered").contains("lorem ipsum")
        & ~F.col("_lowered").contains("{")
    )
    for phrase in blocked_phrases:
        page_ok = page_ok & ~F.col("_lowered").contains(phrase.lower())
    return (
        docs.withColumn("_kept", kept)
        .withColumn("_cleaned", cleaned)
        .withColumn("_lowered", lowered)
        .withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(F.col("_kept")))
        .withColumn("n_sentences", n_sentences)
        .filter(page_ok)
        .select(
            F.col(id_col).cast("string").alias("doc_id"),
            "n_lines",
            "n_kept_lines",
            "n_sentences",
            F.col("_cleaned").alias("cleaned_text"),
        )
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicate-line removal, keep-first (the CCNet
    paragraph-hash dedup of Wenzek et al. 2020 at line granularity,
    also RefinedWeb's line-dedup stage): every non-empty line whose
    trimmed text occurs more than once in the corpus keeps exactly its
    FIRST occurrence — global min (doc_id, line_pos) for that line
    hash — and every other occurrence is dropped, including repeats
    within one document. Blank lines are document structure and are
    always kept.

    -> (doc_id, n_lines, n_dropped, cleaned_text), one row per input
    document.

    Shape at 10^12 docs: lines explode to ~one short row per line
    (payload stays behind); duplicate detection + global first
    occurrence is ONE map-side-partial groupBy on the md5 of the
    trimmed line (count + min struct in the same aggregate, exactly
    the ``remove_duplicate_passages`` discipline); drop positions fold
    back per doc as ONE array via a doc_id groupBy, and the rewrite is
    a row-local indexed ``filter`` over the original rows — the
    document text is never reassembled from exploded lines.
    """
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    occ = (
        base.select("doc_id", F.posexplode("_lines").alias("pos", "line"))
        .withColumn("_t", F.trim("line"))
        .filter(F.length("_t") > 0)
        .select("doc_id", "pos", F.md5("_t").alias("h"))
    )
    firsts = (
        occ.groupBy("h")
        .agg(F.count("*").alias("c"), F.min(F.struct("doc_id", "pos")).alias("first"))
        .filter(F.col("c") >= 2)
        .select("h", "first")
    )
    drops = (
        occ.join(firsts, "h")
        .filter(
            ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("_drops"))
    )
    dropped = F.coalesce(F.col("_drops"), F.array().cast("array<int>"))
    kept = F.filter(
        "_lines", lambda l, i: ~F.array_contains(F.col("_dropped"), i)
    )
    return (
        base.join(drops, "doc_id", "left")
        .withColumn("_dropped", dropped)
        .select(
            "doc_id",
            F.size("_lines").alias("n_lines"),
            F.size("_dropped").alias("n_dropped"),
            F.array_join(kept, "\n").alias("cleaned_text"),
        )
    )
