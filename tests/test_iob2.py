"""IOB2 containment tagging (J5) + per-mention explosion + span stats."""

from __future__ import annotations

from entity_linking_in_biomedical_spark.operators.iob2 import (
    _tag_doc,
    iob2_tags,
    mention_stats,
    per_mention_token_rows,
)

DOC_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def spans_fixture():
    # text: "BRCA1 mutations cause cancer" with mentions BRCA1 [0,5), cancer [22,28)
    return [
        ("text", "BRCA1 mutations cause cancer", None, 0),
        ("mention", "BRCA1", None, 0),
        ("mention", "cancer", None, 22),
    ]


def test_tag_doc_pure():
    spans = [dict(zip(["kind", "text", "media_ref", "offset"], s)) for s in spans_fixture()]
    toks = _tag_doc(spans)
    assert [(t["token"], t["tag"]) for t in toks] == [
        ("BRCA1", "B"),
        ("mutations", "O"),
        ("cause", "O"),
        ("cancer", "B"),
    ]


def test_tag_doc_inside_tag():
    spans = [
        {"kind": "text", "text": "acute breast cancer here", "media_ref": None, "offset": 0},
        # mention "breast cancer" covers [6, 19)
        {"kind": "mention", "text": "breast cancer", "media_ref": None, "offset": 6},
    ]
    toks = _tag_doc(spans)
    assert [(t["token"], t["tag"]) for t in toks] == [
        ("acute", "O"),
        ("breast", "B"),
        ("cancer", "I"),
        ("here", "O"),
    ]


def test_iob2_spark(spark):
    docs = spark.createDataFrame([("D1", spans_fixture())], DOC_SCHEMA)
    got = iob2_tags(docs).collect()[0]["tokens"]
    assert [t["tag"] for t in got] == ["B", "O", "O", "B"]


def test_per_mention_rows(spark):
    docs = spark.createDataFrame([("D1", spans_fixture())], DOC_SCHEMA)
    rows = per_mention_token_rows(docs).collect()
    assert len(rows) == 2  # one per B-mention, document order
    assert [r["mention_idx"] for r in rows] == [0, 1]
    assert rows[0]["mention_start"] == 0 and rows[1]["mention_start"] == 22


def test_mention_stats(spark):
    docs = spark.createDataFrame(
        [("D1", spans_fixture() + [("media", "", "img://D1/3", 29)])], DOC_SCHEMA
    )
    r = mention_stats(docs).collect()[0]
    assert (r["n_mentions"], r["n_media"], r["n_text"], r["n_spans"]) == (2, 1, 1, 4)
