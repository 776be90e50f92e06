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
# Stanza-parity fixtures: shipped st21pv docs whose artifacts are
# reproduced BYTE-exactly end-to-end (tools/find_parity_docs.py).
# Counts over all 3,514 shipped docs (surface-embedding reconstruction):
#   regex default tokenizer/sentencizer ........  708
#   stanza_like plugin (rules + mined lexicons) . 2,689
#   + (prev_token, chunk) context lexicon (r5) .. 2,916
# The residue is segmentation decided by context longer than one token,
# quote attachment, and 154 unalignable surfaces (see
# plans/stanza_like.py's honesty note).
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


# docs the regex tokenizer CANNOT reproduce (glued stanza tokens /
# lowercase sentence starts) but the stanza_like plugin can
PLUGIN_PARITY_DOCS = [
    ("train", "26883265"),
    ("train", "26424709"),
    ("train", "27196563"),
]


@pytest.fixture(scope="session")
def stanza_lexicons():
    from entity_linking_in_biomedical_spark.plans.stanza_like import mine_lexicons

    return mine_lexicons(REF_ST21PV)


@pytest.mark.skipif(
    not os.path.isdir(REF_ST21PV), reason="reference artifacts not present"
)
def test_stanza_like_plugin_byte_parity_end_to_end(spark, tmp_path, stanza_lexicons):
    """The stanza-compatible tokenizer/sentencizer plugin, driven
    through the full SPARK preprocess plan, reproduces shipped docs the
    regex default cannot (hyphen compounds kept/split per stanza's
    observed choices, sentences split before lowercase starts)."""
    from entity_linking_in_biomedical_spark.plans.stanza_like import (
        make_tokenizer,
        stanza_like_sentencizer,
    )

    tools = _load_parity_tools()
    seg_lex, tok_lex = stanza_lexicons
    tokenizer = make_tokenizer(seg_lex, tok_lex)
    # the regex default genuinely fails these docs (guards fixture rot)
    from entity_linking_in_biomedical_spark.plans.preprocess import (
        regex_sentencizer,
        regex_tokenizer,
    )

    assert not any(
        tools.check(d, s, regex_tokenizer, regex_sentencizer)[0]
        for s, d in PLUGIN_PARITY_DOCS
    )
    lines, shipped = [], {}
    for split, doc_id in PLUGIN_PARITY_DOCS:
        rec, why = tools.reconstruct(doc_id, split)
        assert rec is not None, why
        spans, cuis, want_ctx, want_txt = rec
        lines.append(f"{doc_id}|t|{spans[0]['text']}")
        lines.append(f"{doc_id}|a|{spans[1]['text']}")
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
    pubtator_to_context(
        spark,
        str(corpus),
        out_dir=str(out),
        tokenizer=tokenizer,
        sentencizer=stanza_like_sentencizer,
    )
    for _, doc_id in PLUGIN_PARITY_DOCS:
        want_ctx, want_txt = shipped[doc_id]
        assert (out / f"{doc_id}.context").read_text() == want_ctx, doc_id
        assert (out / f"{doc_id}.txt").read_text() == want_txt, doc_id


@pytest.mark.skipif(
    not os.path.isdir(REF_ST21PV), reason="reference artifacts not present"
)
def test_stanza_like_plugin_aggregate_parity_rate(stanza_lexicons):
    """Kernel-level (no Spark) aggregate parity over a 400-doc prefix:
    the plugin must hold its measured rate (313/401 at last full scan;
    floor 300 leaves slack for rule tweaks without masking a
    regression). Full-corpus numbers: tools/find_parity_docs.py."""
    from entity_linking_in_biomedical_spark.plans.stanza_like import (
        make_tokenizer,
        stanza_like_sentencizer,
    )

    tools = _load_parity_tools()
    seg_lex, tok_lex = stanza_lexicons
    passing = tools.evaluate(
        make_tokenizer(seg_lex, tok_lex),
        stanza_like_sentencizer,
        "pytest-400",
        limit=400,
    )
    assert len(passing) >= 300


@pytest.mark.skipif(
    not os.path.isdir(REF_ST21PV), reason="reference artifacts not present"
)
def test_stanza_ctx_lexicon_lifts_parity(stanza_lexicons):
    """The (prev_token, chunk) context lexicon must lift the 400-doc
    prefix rate above the context-free plugin's (measured 333 vs 313 at
    last full scan; floor 320 leaves regression slack)."""
    from entity_linking_in_biomedical_spark.plans.stanza_like import (
        make_tokenizer,
        mine_context_lexicon,
        stanza_like_sentencizer,
    )

    tools = _load_parity_tools()
    seg_lex, tok_lex = stanza_lexicons
    ctx_lex = mine_context_lexicon(REF_ST21PV)
    passing = tools.evaluate(
        make_tokenizer(seg_lex, tok_lex, ctx_lexicon=ctx_lex),
        stanza_like_sentencizer,
        "pytest-400-ctx",
        limit=400,
    )
    assert len(passing) >= 320


def test_stanza_ctx_lexicon_disambiguates():
    """Unit semantics of the context layer: the same chunk spelling
    segments differently depending on the previous token; chunks with
    no context hit fall through to the global layers; a malformed ctx
    entry (tokens don't concatenate to the chunk) is rejected."""
    import pytest as _pytest

    from entity_linking_in_biomedical_spark.plans.stanza_like import (
        CTX_START,
        make_tokenizer,
    )

    ctx = {
        ("a", "meta-analysis"): ("meta", "-", "analysis"),
        (CTX_START, "meta-analysis"): ("meta-analysis",),
    }
    tok = make_tokenizer(ctx_lexicon=ctx)
    assert [t for t, _ in tok("meta-analysis")] == ["meta-analysis"]
    assert [t for t, _ in tok("a meta-analysis")] == ["a", "meta", "-", "analysis"]
    # offsets derived from token lengths at the chunk position
    assert tok("a meta-analysis") == [
        ("a", 0), ("meta", 2), ("-", 6), ("analysis", 7),
    ]
    # no ctx hit -> rule layer still applies
    assert [t for t, _ in tok("b meta-analysis.")] == ["b", "meta-analysis", "."]

    with _pytest.raises(ValueError, match="context lexicon"):
        make_tokenizer(ctx_lexicon={("x", "ab"): ("a", "c")})


def test_stanza_like_tokenizer_raw_text_rules():
    """Raw-text behavior without lexicons: prose punctuation splits,
    systematic scientific clusters stay glued."""
    from entity_linking_in_biomedical_spark.plans.stanza_like import (
        make_tokenizer,
        stanza_like_sentencizer,
    )

    tok = make_tokenizer()
    toks = lambda s: [t for t, _ in tok(s)]
    assert toks("the virus, (EBV) spread.") == [
        "the", "virus", ",", "(", "EBV", ")", "spread", ".",
    ]
    assert toks("p<0.05 and n=10") == ["p<0.05", "and", "n=10"]
    assert toks("Epstein-Barr virus") == ["Epstein-Barr", "virus"]
    assert toks("1,200 mg/kg at 37°") == ["1,200", "mg/kg", "at", "37°"]
    assert toks("the patient's E. coli") == ["the", "patient", "'s", "E.", "coli"]
    # offsets point into the original text
    assert tok("a (b)") == [("a", 0), ("(", 2), ("b", 3), (")", 4)]
    # sentencizer: splits before lowercase starts ("low pain...") but
    # never after an abbreviation dot ("E." initial, "vs.")
    sents = [s for s, _ in stanza_like_sentencizer("We treated E. coli. low pain was seen. vs. nothing")]
    assert sents == ["We treated E. coli.", "low pain was seen.", "vs. nothing"]
    # lexicon override wins over rules
    tok2 = make_tokenizer({"LC-MS": ("LC", "-MS")}, {"Ca("})
    assert [t for t, _ in tok2("LC-MS via Ca(")] == ["LC", "-MS", "via", "Ca("]
    # pathological crawled-garbage chunk: the peel is iterative, so
    # thousands of nested brackets segment without recursion — and the
    # >_MAX_TOKEN_LEN bulk peel keeps it linear-time
    deep = tok("(" * 2500 + "x" + ")" * 2500)
    assert len(deep) == 5001 and deep[2500] == ("x", 2500)
    # a malformed segmentation entry (tokens don't concatenate to the
    # key) must fail loudly at construction, not corrupt offsets later
    import pytest as _pytest

    with _pytest.raises(ValueError, match="concatenation"):
        make_tokenizer({"LC-MS": ("LC", "MS")})
