"""Sequence-packing manifest (operators/packing.py) vs a pure Python
replay of the concat-and-chunk layout."""

from __future__ import annotations

import re

import pytest

from entity_linking_in_biomedical_spark.operators.packing import pack_sequences


def _toks(t: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ") if w]


def _reference(docs, seq_len):
    out = []
    o = 0
    for i, t in sorted(docs):
        n = len(_toks(t))
        if n == 0:
            continue
        for seq_id in range(o // seq_len, (o + n - 1) // seq_len + 1):
            s = max(o, seq_id * seq_len)
            e = min(o + n, (seq_id + 1) * seq_len)
            out.append((seq_id, i, s - o, e - s))
        o += n
    return out


DOCS = [
    (1, "a b c d e"),  # 5 tokens
    (2, "f g h"),  # 3
    (3, ""),  # dropped
    (4, "i j k l m n o p q r s t"),  # 12 -> spans boundaries at S=4
    (5, "u"),  # 1
]


@pytest.mark.parametrize("seq_len", [4, 7, 64])
def test_pack_sequences_matches_reference(spark, seq_len):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = sorted(
        (r["seq_id"], r["doc_id"], r["frag_start"], r["frag_len"])
        for r in pack_sequences(df, seq_len).collect()
    )
    assert got == sorted(_reference(DOCS, seq_len))


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = pack_sequences(df, 4).collect()
    total = 5 + 3 + 12 + 1  # 21 tokens
    # fragment lengths per doc reconstruct the doc
    by_doc: dict[int, int] = {}
    by_seq: dict[int, int] = {}
    for r in rows:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["frag_len"]
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + r["frag_len"]
        assert r["frag_len"] > 0
    assert by_doc == {1: 5, 2: 3, 4: 12, 5: 1}
    # every sequence except the last is exactly full
    last = max(by_seq)
    for s, n in by_seq.items():
        assert n == (4 if s != last else total - 4 * last)


def test_pack_sequences_bucket_boundaries_exact(spark):
    """Tiny bucket_size forces multi-bucket prefix sums; offsets must
    agree with the single-stream reference regardless of bucketing."""
    docs = [(i, "w " * (i % 7 + 1)) for i in range(1, 200)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    a = sorted(map(tuple, pack_sequences(df, 16, bucket_size=10).collect()))
    b = sorted(map(tuple, pack_sequences(df, 16, bucket_size=1_000_000).collect()))
    assert a == b == sorted(_reference(docs, 16))


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_pack_sequences_property_random_corpora(spark):
    """Hypothesis-style randomized invariants (seeded, deterministic):
    for random doc-length multisets and seq_len/bucket_size choices,
    the manifest must exactly tile the concatenated token stream."""
    import random

    rng = random.Random(20260817)
    for trial in range(5):
        n_docs = rng.randint(1, 120)
        seq_len = rng.choice([1, 3, 16, 100])
        bucket = rng.choice([1, 7, 1000])
        docs = [(i, "w " * rng.randint(0, 30)) for i in range(n_docs)]
        df = spark.createDataFrame(docs, "doc_id int, text string")
        rows = pack_sequences(df, seq_len, bucket_size=bucket).collect()
        want = _reference(docs, seq_len)
        got = sorted((r["seq_id"], r["doc_id"], r["frag_start"], r["frag_len"]) for r in rows)
        assert got == sorted(want), (trial, n_docs, seq_len, bucket)


# ---- interleaved (span-shaped) packing --------------------------------------

SPAN_SCHEMA = (
    "doc_id int, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _t(text):
    return ("text", text, None, 0)


def _m(ref):
    return ("media", None, ref, 1)


def _reference_interleaved(rows, seq_len, budget):
    out = []
    o = 0
    for i, spans in sorted(rows):
        nt = sum(len(_toks(s[1] or "")) for s in spans if s[0] == "text")
        nm = sum(1 for s in spans if s[0] == "media")
        L = nt + nm * budget
        if L == 0:
            continue
        for seq_id in range(o // seq_len, (o + L - 1) // seq_len + 1):
            s = max(o, seq_id * seq_len)
            e = min(o + L, (seq_id + 1) * seq_len)
            out.append((seq_id, i, s - o, e - s, nt, nm))
        o += L
    return out


INTERLEAVED = [
    (1, [_t("a b c"), _m("img://1"), _t("d e")]),  # 5 text + 1 media
    (2, [_m("img://2a"), _m("img://2b")]),  # media-only: 2*budget
    (3, []),  # empty span list -> dropped
    (4, [_t("")]),  # zero tokens, no media -> dropped
    (5, [_t("f g h i j k l m n o p q")]),  # text-only, 12 tokens
]


def test_pack_interleaved_matches_reference(spark):
    from entity_linking_in_biomedical_spark.operators.packing import pack_interleaved

    df = _span_docs(spark, INTERLEAVED)
    for seq_len, budget in ((8, 4), (16, 64), (3, 0)):
        rows = pack_interleaved(
            df, seq_len, media_token_budget=budget, bucket_size=2
        ).collect()
        got = sorted(
            (
                r["seq_id"],
                r["doc_id"],
                r["frag_start"],
                r["frag_len"],
                r["n_text_tokens"],
                r["n_media"],
            )
            for r in rows
        )
        assert got == sorted(
            _reference_interleaved(INTERLEAVED, seq_len, budget)
        ), (seq_len, budget)


def test_pack_interleaved_stream_tiles_exactly(spark):
    """The manifest must tile [0, total) with no gaps or overlaps:
    fragment lengths sum to the corpus stream length and every
    sequence except the last carries exactly seq_len tokens."""
    from entity_linking_in_biomedical_spark.operators.packing import pack_interleaved

    df = _span_docs(spark, INTERLEAVED)
    rows = pack_interleaved(df, 8, media_token_budget=4, bucket_size=2).collect()
    total = sum(r["frag_len"] for r in rows)
    want = sum(
        nt + nm * 4
        for nt, nm in (
            (5, 1),
            (0, 2),
            (12, 0),
        )
    )
    assert total == want
    per_seq = {}
    for r in rows:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["frag_len"]
    last = max(per_seq)
    assert all(v == 8 for s, v in per_seq.items() if s != last)
    assert 0 < per_seq[last] <= 8


def test_pack_interleaved_bucket_invariance(spark):
    from entity_linking_in_biomedical_spark.operators.packing import pack_interleaved

    rows = [
        (
            i,
            [_t("w " * (i % 5)), _m(f"img://{i}")] if i % 3 else [_t("w " * (i % 5))],
        )
        for i in range(1, 80)
    ]
    df = _span_docs(spark, rows)
    a = sorted(
        map(tuple, pack_interleaved(df, 16, 7, bucket_size=5).collect())
    )
    b = sorted(
        map(tuple, pack_interleaved(df, 16, 7, bucket_size=1_000_000).collect())
    )
    assert a == b == sorted(_reference_interleaved(rows, 16, 7))


def test_pack_interleaved_rejects_bad_args(spark):
    from entity_linking_in_biomedical_spark.operators.packing import pack_interleaved

    df = _span_docs(spark, INTERLEAVED)
    with pytest.raises(ValueError):
        pack_interleaved(df, 0)
    with pytest.raises(ValueError):
        pack_interleaved(df, 8, media_token_budget=-1)


def _chunk_reference(texts, chunk, stride):
    out = []
    for did, text in texts:
        tk = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if t]
        n = len(tk)
        if n == 0:
            continue
        nc = 1 if n <= chunk else (n - chunk + stride - 1) // stride + 1
        for i in range(nc):
            ln = min(chunk, n - i * stride)
            out.append((did, i, nc, ln, " ".join(tk[i * stride : i * stride + ln])))
    return sorted(out)


def test_chunk_documents_matches_reference(spark):
    from entity_linking_in_biomedical_spark.operators.packing import chunk_documents

    texts = [
        (1, "a b c d e f g h i j"),        # 10 tokens
        (2, "one two three"),              # shorter than a chunk
        (3, ""),                           # dropped
        (4, "x " * 25),                    # exact multi-window tail
        (5, "Word, word; WORD word!"),     # punct/case normalization
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    got = sorted(map(tuple, chunk_documents(df, chunk_tokens=4, stride=3).collect()))
    assert got == _chunk_reference(texts, 4, 3)


def test_chunk_documents_overlap_and_coverage(spark):
    """Every token position is covered; adjacent chunks overlap by
    chunk - stride; re-concatenating stride-prefixes + last chunk
    reproduces the token stream."""
    from entity_linking_in_biomedical_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=8, stride=5).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert rows[0]["n_chunks"] == len(rows)
    toks = []
    for r in rows[:-1]:
        assert r["chunk_len"] == 8
        toks += r["chunk_text"].split(" ")[:5]
    toks += rows[-1]["chunk_text"].split(" ")
    assert toks == [f"t{i}" for i in range(50)]


def test_chunk_documents_disjoint_default_and_bad_args(spark):
    from entity_linking_in_biomedical_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    got = sorted(map(tuple, chunk_documents(df, chunk_tokens=2).collect()))
    assert got == [(1, 0, 3, 2, "a b"), (1, 1, 3, 2, "c d"), (1, 2, 3, 1, "e")]
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, stride=5)
