"""S6/S7/K1: the reference's `.context`/`.txt` per-doc artifacts must
round-trip byte-for-byte through the Spark readers/writers, and convert
losslessly into the engine's spans model (offsets consistent, mention
order aligned with the `.txt` file)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.sources.context_files import (
    context_to_documents,
    read_all_mentions,
    read_context,
    read_mention_txt,
    write_all_mentions,
    write_context,
    write_mention_txt,
)

REF_DIR = "/root/reference/data/processed/st21pv/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference artifacts not present"
)


def test_context_roundtrip_all_shipped_files(spark, tmp_path):
    ctx = read_context(spark, f"{REF_DIR}/*.context")
    out = str(tmp_path / "ctx")
    write_context(ctx, out)
    originals = sorted(glob.glob(f"{REF_DIR}/*.context"))
    assert originals
    for orig in originals:
        name = os.path.basename(orig)
        with open(orig, encoding="utf-8") as f1, open(
            os.path.join(out, name), encoding="utf-8"
        ) as f2:
            assert f1.read() == f2.read(), f"byte mismatch: {name}"


def test_mention_txt_roundtrip_all_shipped_files(spark, tmp_path):
    txt = read_mention_txt(spark, f"{REF_DIR}/*.txt")
    out = str(tmp_path / "txt")
    write_mention_txt(txt, out)
    originals = sorted(glob.glob(f"{REF_DIR}/*.txt"))
    assert originals
    for orig in originals:
        name = os.path.basename(orig)
        with open(orig, encoding="utf-8") as f1, open(
            os.path.join(out, name), encoding="utf-8"
        ) as f2:
            assert f1.read() == f2.read(), f"byte mismatch: {name}"


def test_all_mentions_roundtrip(spark, tmp_path):
    """Corpus-wide `all_mention.txt` (reference byte format
    `docid||surface||CUI` + newline per line, src/data/
    pre_processing.py:230-237): the reference ships no such file, so the
    fixture is synthesized in the writer's exact byte format from the
    shipped per-doc `.txt` mention files, then write(read(f)) must
    reproduce it byte-for-byte and the parsed columns must line up."""
    originals = sorted(glob.glob(f"{REF_DIR}/*.txt"))
    assert originals
    lines = []
    for orig in originals:
        doc_id = os.path.basename(orig)[:-4]
        with open(orig, encoding="utf-8") as f:
            for line in f.read().split("\n"):
                if line:
                    cui, surface = line.split("||", 1)
                    lines.append(f"{doc_id}||{surface}||{cui}\n")
    src = tmp_path / "all_mention.txt"
    src.write_text("".join(lines), encoding="utf-8")

    df = read_all_mentions(spark, str(src))
    out = tmp_path / "out" / "all_mention.txt"
    write_all_mentions(df, str(out))
    assert out.read_text(encoding="utf-8") == src.read_text(encoding="utf-8")

    assert df.count() == len(lines)
    first = df.orderBy("seq").first()
    d0, s0, c0 = lines[0][:-1].split("||")
    assert (first["doc_id"], first["surface"], first["cui"]) == (d0, s0, c0)


def test_context_to_documents_offsets_and_alignment(spark):
    """Spans shape: every mention span's (offset, len) indexes its text
    inside the reconstructed document; mention count and order align
    with the sibling `.txt` file (one sentence block per mention)."""
    ctx = read_context(spark, f"{REF_DIR}/27395442.context")
    docs = context_to_documents(ctx)
    row = docs.collect()[0]
    text_spans = [s for s in row["spans"] if s["kind"] == "text"]
    mention_spans = [s for s in row["spans"] if s["kind"] == "mention"]
    full = "\n".join(s["text"] for s in text_spans)
    for m in mention_spans:
        assert full[m["offset"] : m["offset"] + len(m["text"])] == m["text"]
        assert m["media_ref"].startswith("cui://")

    txt = read_mention_txt(spark, f"{REF_DIR}/27395442.txt").orderBy("span_seq").collect()
    assert len(mention_spans) == len(txt)
    # CUIs align positionally (sentence blocks are written in doc order)
    assert [m["media_ref"][6:] for m in mention_spans] == [t["cui"] for t in txt]


def test_context_documents_feed_the_pipeline(spark):
    """The converted documents flow straight into extract_mentions —
    the S6 format is fully subsumed by the spans model."""
    from entity_linking_in_biomedical_spark.operators.mentions import extract_mentions

    ctx = read_context(spark, f"{REF_DIR}/27395442.context")
    docs = context_to_documents(ctx)
    mentions = extract_mentions(docs)
    got = mentions.filter(F.col("doc_id") == "27395442").count()
    # the overlap sweep may drop same-offset duplicates, never add
    assert 0 < got <= 30
