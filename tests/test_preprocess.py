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
