"""End-to-end preprocess plan: PubTator corpus -> .context/.txt files
(the reference's medmention_preprocess.py as one Spark plan), with the
shipped-artifact tagging semantics asserted token by token."""

from __future__ import annotations

from entity_linking_in_biomedical_spark.plans.preprocess import (
    pubtator_to_context,
    regex_sentencizer,
    regex_tokenizer,
)

# title sentence holds two mentions (to pin the B-current / I-any rule);
# the abstract's second annotation crosses a sentence boundary (dropped)
CORPUS = """\
201|t|Dynactin modifies chronic lung infection in mice.
201|a|We saw it. Clearly not here.
201\t0\t8\tDynactin\tGene\tT028:C111
201\t18\t40\tchronic lung infection\tDisease\tT047:C222
201\t57\t67\tit. Clearly\tOther\tT000:C333

202|t|Solo title here.
202|a|Nothing else.
202\t0\t4\tSolo\tThing\tT001:C444
"""


def test_tokenizer_and_sentencizer():
    toks = regex_tokenizer("p.Tyr263Cys costs 0.06 (approx).")
    assert [t for t, _ in toks] == ["p.Tyr263Cys", "costs", "0.06", "(", "approx", ")", "."]
    sents = regex_sentencizer("We saw it. Clearly not here.")
    assert [s for s, _ in sents] == ["We saw it.", "Clearly not here."]
    assert [b for _, b in sents] == [0, 11]


def test_mid_token_mention_dropped_cleanly(spark, tmp_path):
    """A mention whose begin sits inside a token (e.g. 'Tyr263Cys'
    within 'p.Tyr263Cys') is dropped entirely: no block, no .txt line,
    and no stray I tags from it in other blocks."""
    corpus = (
        "301|t|Variant p.Tyr263Cys alters Dynactin function.\n"
        "301|a|Filler abstract.\n"
        "301\t10\t19\tTyr263Cys\tVariant\tT000:C900\n"
        "301\t27\t35\tDynactin\tGene\tT028:C901\n"
    )
    p = tmp_path / "c.txt"
    p.write_text(corpus)
    res = pubtator_to_context(spark, str(p))
    ms = [(r["cui"], r["surface"]) for r in res["mentions"].collect()]
    assert ms == [("C901", "Dynactin")]
    blocks = res["context"].collect()
    assert len(blocks) == 1
    tags = {t["tag"] for t in blocks[0]["tokens"]}
    assert "B:C901" in tags and not any("C900" in t for t in tags)


def test_pubtator_to_context_end_to_end(spark, tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(CORPUS)
    out = tmp_path / "processed"
    res = pubtator_to_context(spark, str(corpus), out_dir=str(out))

    # mention crossing the abstract's sentence boundary is dropped (P4)
    m = {
        (r["doc_id"], r["span_seq"]): (r["cui"], r["surface"])
        for r in res["mentions"].collect()
    }
    assert m == {
        ("201", 0): ("C111", "Dynactin"),
        ("201", 1): ("C222", "chronic lung infection"),
        ("202", 0): ("C444", "Solo"),
    }

    # shipped-artifact tagging: in Dynactin's block the other mention's
    # FIRST token ('chronic') is O but its interior tokens are I:its-cui
    ctx = {
        (r["doc_id"], r["sent_seq"]): [(t["token"], t["tag"]) for t in r["tokens"]]
        for r in res["context"].collect()
    }
    assert ctx[("201", 0)] == [
        ("Dynactin", "B:C111"),
        ("modifies", "O"),
        ("chronic", "O"),
        ("lung", "I:C222"),
        ("infection", "I:C222"),
        ("in", "O"),
        ("mice", "O"),
        (".", "O"),
    ]
    assert ctx[("201", 1)][0] == ("Dynactin", "O")
    assert ctx[("201", 1)][2] == ("chronic", "B:C222")
    assert ctx[("201", 1)][3] == ("lung", "I:C222")

    # files on disk, reference format
    assert (out / "201.context").exists() and (out / "201.txt").exists()
    assert (out / "201.txt").read_text() == (
        "C111||Dynactin\nC222||chronic lung infection"
    )
    first_block = (out / "201.context").read_text().split("\n\n")[0]
    assert first_block.splitlines()[0] == "Dynactin\tB:C111"

    # round-trip through the readers back to the spans model
    from entity_linking_in_biomedical_spark.sources.context_files import (
        context_to_documents,
        read_context,
    )

    docs2 = context_to_documents(read_context(spark, str(out / "*.context")))
    surfs = {
        (d["doc_id"], s["text"])
        for d in docs2.collect()
        for s in d["spans"]
        if s["kind"] == "mention"
    }
    assert ("201", "Dynactin") in surfs and ("201", "chronic lung infection") in surfs


# ---------------------------------------------------------------------------
# Stanza-parity fixtures: shipped st21pv docs whose artifacts the regex
# tokenizer reproduces BYTE-exactly end-to-end (found by
# tools/find_parity_docs.py — 285 of 3,514 shipped docs qualify; the
# rest diverge only where stanza's neural tokenization differs from the
# regex default: hyphen/symbol token grouping and multi-space surfaces).
# ---------------------------------------------------------------------------

import os

import pytest

REF_ST21PV = "/root/reference/data/processed/st21pv"
# (split, doc_id) drawn from the scanner's passing set: first train doc,
# a mid-corpus train doc, and a test-split doc
PARITY_DOCS = [("train", "27010511"), ("train", "27332832"), ("test", "27235559")]


def _load_parity_tools():
    import importlib.util

    p = os.path.join(os.path.dirname(__file__), "..", "tools", "find_parity_docs.py")
    spec = importlib.util.spec_from_file_location("find_parity_docs", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.isdir(REF_ST21PV), reason="reference artifacts not present"
)
def test_shipped_artifact_byte_parity_end_to_end(spark, tmp_path):
    """Full byte parity with the reference's processed artifacts through
    the SPARK plan: reconstruct each fixture doc's PubTator input from
    its shipped `.context`/`.txt` (the artifact bytes depend only on
    token sequences + mention spans, so a reconstruction that
    re-tokenizes identically must reproduce them exactly), run
    pubtator_to_context, and compare the written files byte-for-byte
    against data/processed/st21pv."""
    tools = _load_parity_tools()
    lines = []
    shipped = {}
    for split, doc_id in PARITY_DOCS:
        rec, why = tools.reconstruct(doc_id, split)
        assert rec is not None, why
        spans, cuis, want_ctx, want_txt = rec
        title, abstract = spans[0]["text"], spans[1]["text"]
        lines.append(f"{doc_id}|t|{title}")
        lines.append(f"{doc_id}|a|{abstract}")
        for s, c in zip([s for s in spans if s["kind"] == "mention"], cuis):
            b = s["offset"]
            lines.append(
                f"{doc_id}\t{b}\t{b + len(s['text'])}\t{s['text']}\tX\tT000:{c}"
            )
        lines.append("")
        shipped[doc_id] = (want_ctx, want_txt)
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(lines))
    out = tmp_path / "processed"
    pubtator_to_context(spark, str(corpus), out_dir=str(out))
    for _, doc_id in PARITY_DOCS:
        want_ctx, want_txt = shipped[doc_id]
        assert (out / f"{doc_id}.context").read_text() == want_ctx, doc_id
        assert (out / f"{doc_id}.txt").read_text() == want_txt, doc_id
