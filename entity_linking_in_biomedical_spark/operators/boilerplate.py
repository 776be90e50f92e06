"""Crawl-cleaning operators: C4 line/page heuristics and CCNet-style
corpus-wide duplicate-line removal.

These are the earliest gates of a web-crawl training-data pipeline —
they run before quality scoring, LM perplexity, or any dedup family in
``operators/dedup.py``, and complement them at a different granularity:
``remove_duplicate_passages`` needs ``window_k`` consecutive tokens,
while navigation chrome ("share this page", cookie banners) is usually
a short single line repeated across millions of pages.

Each operator has two faces sharing one rule construction:
- the stats projection (``c4_clean`` / ``line_dedup``) — one row per
  doc with counts + cleaned text, the oracled driver-query surface;
- the schema-preserving gate (``c4_apply`` / ``line_dedup_apply``) —
  the caller's frame with ``text_col`` rewritten in place, the form
  ``plans/curate.curate_corpus`` composes.

All rules are deterministic pure functions of the input so the DuckDB
oracle twins in ``__spark_entry__.py`` replay them exactly.

Scale shape at 10^12 docs:
- the C4 rules are entirely row-local whole-stage-codegen column
  expressions — ZERO shuffles, one scan (plan-asserted in
  tests/test_boilerplate.py).
- line dedup pays exactly two shuffles: ONE map-side-partial groupBy
  on the 16-byte line hash (the corpus-wide duplicate detection a
  global rule cannot avoid) and ONE doc-keyed fold-back of drop
  positions; the rewrite itself is a row-local higher-order filter
  over the original rows — document payloads are never re-assembled
  from exploded parts (same discipline as
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


def _c4_frame(
    docs: DataFrame, text_col: str, blocked_phrases: tuple[str, ...]
) -> DataFrame:
    """Shared rule construction: the input frame with temp columns
    ``_kept`` (trimmed surviving lines), ``_cleaned`` (their join),
    ``n_lines``/``n_kept_lines``/``n_sentences``, filtered to
    SURVIVING pages. Both public faces project from this."""
    lines = F.split(F.col(text_col), "\n")
    # NOTE: must be a one-arg lambda — passing F.trim directly would
    # bind transform's optional (element, index) form to trim's
    # deprecated two-parameter signature and trim the wrong characters
    kept = F.filter(F.transform(lines, lambda l: F.trim(l)), _c4_line_ok)
    n_sentences = F.length(F.col("_cleaned")) - F.length(
        F.regexp_replace(F.col("_cleaned"), C4_SENTENCE_MARK_RE, "")
    )
    page_ok = (
        (F.col("n_sentences") >= C4_MIN_SENTENCES_PER_PAGE)
        & ~F.col("_lowered").contains("lorem ipsum")
        & ~F.col("_lowered").contains("{")
    )
    for phrase in blocked_phrases:
        page_ok = page_ok & ~F.col("_lowered").contains(phrase.lower())
    return (
        docs.withColumn("_kept", kept)
        .withColumn("_cleaned", F.array_join(F.col("_kept"), "\n"))
        .withColumn("_lowered", F.lower(F.col(text_col)))
        .withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(F.col("_kept")))
        .withColumn("n_sentences", n_sentences)
        .filter(page_ok)
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocked_phrases: tuple[str, ...] = (),
) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2): keep only lines that
    (trimmed) end in terminal punctuation, have >= 3 words, and do not
    mention "javascript"; then drop the whole page if the retained
    text has fewer than 5 sentences, or the ORIGINAL page contains
    "lorem ipsum", a curly brace ``{``, or any ``blocked_phrases``
    entry (case-insensitive).

    -> (doc_id, n_lines, n_kept_lines, n_sentences, cleaned_text), one
    row per SURVIVING page. Entirely row-local: one scan, zero
    shuffles, all whole-stage-codegen expressions.

    Sentence count follows the paper's spirit deterministically: the
    number of sentence-terminal marks ``[.!?]`` in the retained text
    (a kept line has >= 1 by construction, so pages with >= 5 kept
    declarative lines always survive the sentence rule).
    """
    return _c4_frame(docs, text_col, blocked_phrases).select(
        F.col(id_col).cast("string").alias("doc_id"),
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        F.col("_cleaned").alias("cleaned_text"),
    )


def c4_apply(
    docs: DataFrame,
    text_col: str = "text",
    blocked_phrases: tuple[str, ...] = (),
) -> DataFrame:
    """Gate form of :func:`c4_clean` for pipeline composition
    (plans/curate.py): same rules, but returns the caller's frame —
    surviving pages only, with ``text_col`` replaced by the cleaned
    text and every other column untouched. Still zero shuffles."""
    out_cols = [
        F.col("_cleaned").alias(c) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return _c4_frame(docs, text_col, blocked_phrases).select(*out_cols)


def _line_drop_positions(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Shared keep-first rule: -> (__ldk string doc key, _drops
    array<int> of 0-based line positions to remove). Every non-empty
    trimmed line occurring more than once in the corpus keeps exactly
    its global first occurrence — min (doc key, pos) for that line's
    md5 — and all other occurrences land in ``_drops``. ONE
    map-side-partial groupBy on the hash, one doc-keyed fold-back."""
    occ = (
        docs.select(
            F.col(id_col).cast("string").alias("__ldk"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("_t", F.trim("line"))
        .filter(F.length("_t") > 0)
        .select("__ldk", "pos", F.md5("_t").alias("h"))
    )
    firsts = (
        occ.groupBy("h")
        .agg(F.count("*").alias("c"), F.min(F.struct("__ldk", "pos")).alias("first"))
        .filter(F.col("c") >= 2)
        .select("h", "first")
    )
    return (
        occ.join(firsts, "h")
        .filter(
            ~(
                (F.col("__ldk") == F.col("first.__ldk"))
                & (F.col("pos") == F.col("first.pos"))
            )
        )
        .groupBy("__ldk")
        .agg(F.collect_list("pos").alias("_drops"))
    )


def _rewrite_without_lines(lines_col: str, drops_col: str) -> Column:
    """Row-local rewrite: the lines array minus the dropped 0-based
    positions, re-joined — never re-assembled from exploded rows."""
    return F.array_join(
        F.filter(
            lines_col, lambda l, i: ~F.array_contains(F.col(drops_col), i)
        ),
        "\n",
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
    back per doc as ONE array via a doc-keyed groupBy, and the rewrite
    is a row-local indexed ``filter`` over the original rows — the
    document text is never reassembled from exploded lines.
    """
    base = docs.select(
        F.col(id_col).cast("string").alias("__ldk"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    drops = _line_drop_positions(docs, id_col, text_col)
    return (
        base.join(drops, "__ldk", "left")
        .withColumn(
            "_dropped",
            F.coalesce(F.col("_drops"), F.array().cast("array<int>")),
        )
        .select(
            F.col("__ldk").alias("doc_id"),
            F.size("_lines").alias("n_lines"),
            F.size("_dropped").alias("n_dropped"),
            _rewrite_without_lines("_lines", "_dropped").alias("cleaned_text"),
        )
    )


def line_dedup_apply(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gate form of :func:`line_dedup` for pipeline composition
    (plans/curate.py): the caller's frame with ``text_col`` rewritten
    in place (duplicate lines removed keep-first) and every other
    column untouched. Same two-shuffle shape; no rows are dropped —
    a page reduced to nothing keeps an empty text and is left for the
    downstream quality gate to cut."""
    drops = _line_drop_positions(docs, id_col, text_col)
    joined = (
        docs.withColumn("__ldk", F.col(id_col).cast("string"))
        .join(drops, "__ldk", "left")
        .withColumn(
            "_dropped",
            F.coalesce(F.col("_drops"), F.array().cast("array<int>")),
        )
        .withColumn("_lines", F.split(F.col(text_col), "\n"))
    )
    out_cols = [
        _rewrite_without_lines("_lines", "_dropped").alias(c)
        if c == text_col
        else F.col(c)
        for c in docs.columns
    ]
    return joined.select(*out_cols)
