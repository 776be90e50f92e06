"""End-to-end curation composition (plans/curate.py): every gate cuts
exactly the planted docs and the funnel accounts for each cut."""

from __future__ import annotations

from entity_linking_in_biomedical_spark.plans.curate import (
    CurateConfig,
    curate_corpus,
)

_GOOD = (
    "the study of distributed data processing systems shows that careful "
    "partitioning and shuffle planning are the keys to throughput at scale "
)


def test_curate_corpus_gates_and_funnel(spark):
    rows = [
        (1, _GOOD + "alpha", "en"),
        (2, _GOOD + "alpha", "en"),  # exact dup of 1 -> exact_dedup cut
        (3, _GOOD + "beta", "fr"),  # -> lang cut
        (4, "!!! ??? $$$", "en"),  # -> quality cut
        (5, _GOOD + "alpha variant", "en"),  # near-dup of 1 -> near_dup cut
        (6, "completely different prose about the economics of publishing "
            "open access journals and the incentives they create for authors "
            "and for the reviewers who donate their time", "en"),
        (7, "leaked eval text one two three four five six seven eight nine "
            "ten eleven twelve thirteen fourteen and some trailing padding "
            "so the quality gate does not cut this document first", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    test = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine ten eleven "
               "twelve thirteen fourteen")],
        "test_id int, text string",
    )
    res = curate_corpus(docs, test=test, cfg=CurateConfig(jaccard_threshold=0.5))
    kept = sorted(r["doc_id"] for r in res["clean"].collect())
    assert kept == [1, 6]
    assert res["funnel"] == [
        ("input", 7),
        ("lang", 6),  # -3
        ("quality", 5),  # -4
        ("exact_dedup", 4),  # -2 (keep-first: 1 survives)
        ("near_dup", 3),  # -5 (canonical '1' survives)
        ("decontaminate", 2),  # -7
    ]
    # output schema is the input schema, untouched
    assert res["clean"].columns == docs.columns


def test_curate_lm_gate_cuts_high_perplexity(spark):
    rows = [(i, _GOOD + f"variant number {i}", "en") for i in range(20)] + [
        (99, "zq xv qk jw vz kx wj zzq xxv qqk jjw vvz kkx wwj", "en")
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    cfg = CurateConfig(near_dup=False, max_avg_nll=3.5, lm_vocab_cap=50)
    res = curate_corpus(docs, cfg=cfg)
    kept = {r["doc_id"] for r in res["clean"].collect()}
    assert 99 not in kept  # gibberish doc scores far above the corpus NLL
    assert len(kept) >= 15  # the normal docs survive
    gates = [g for g, _ in res["funnel"]]
    assert gates == ["input", "lang", "quality", "exact_dedup", "lm_nll"]


def test_curate_interleaved_gates_media_and_text(spark):
    from entity_linking_in_biomedical_spark.plans.curate import curate_interleaved

    def t(s):
        return ("text", s, None, 0)

    def m(ref):
        return ("media", None, ref, 1)

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    rows = [
        # survivor: good text split across two spans with media between;
        # img://dup appears here FIRST so d1 keeps it
        ("d1", [t(_GOOD), m("img://dup"), t("alpha"), m("img://d1")]),
        # exact dup of d1's PROJECTED text (media refs differ) -> cut,
        # and its img://dup copy is dropped by the media gate first
        ("d2", [t(_GOOD + " alpha"), m("img://dup")]),  # " " = projection sep
        # quality cut (stopword 'the' keeps lang=en; symbols sink quality)
        ("d3", [t("the !!! ??? $$$ %%%"), m("img://d3")]),
        # lang cut (es stopwords)
        ("d4", [t("el que de la los en se del y las " * 8)]),
        # survivor with no media
        ("d5", [t("completely different prose about the economics of "
                  "publishing open access journals and the incentives "
                  "they create for authors and reviewers")]),
    ]
    docs = spark.createDataFrame(rows, schema)
    res = curate_interleaved(docs, cfg=CurateConfig(near_dup=False))
    clean = {r["doc_id"]: r["spans"] for r in res["clean"].collect()}
    assert sorted(clean) == ["d1", "d5"]
    # d1's spans survive media-deduped and ORDER-preserved (it owns the
    # first occurrence of img://dup, so nothing is dropped from it)
    assert [s["kind"] for s in clean["d1"]] == ["text", "media", "text", "media"]
    assert [s["media_ref"] for s in clean["d1"] if s["kind"] == "media"] == [
        "img://dup", "img://d1"
    ]
    # funnel counts docs through the text gates on the projection
    assert res["funnel"] == [
        ("input", 5),
        ("lang", 4),
        ("quality", 3),
        ("exact_dedup", 2),
    ]
    # media gate accounting: 10 spans in, 9 out (d2's img://dup dropped)
    assert res["media_spans"] == (10, 9)
    # projection separator joins multi-span text: d1 == d2's single span
    # is exactly why d2 was cut as an exact dup


def test_curate_interleaved_no_media_dedup_passthrough(spark):
    from entity_linking_in_biomedical_spark.plans.curate import curate_interleaved

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    docs = spark.createDataFrame(
        [("a", [("text", _GOOD, None, 0), ("media", None, "img://x", 1)]),
         ("b", [("text", _GOOD, None, 0), ("media", None, "img://x", 1)])],
        schema,
    )
    res = curate_interleaved(
        docs, cfg=CurateConfig(near_dup=False), media_dedup=False
    )
    assert res["media_spans"] is None
    kept = {r["doc_id"] for r in res["clean"].collect()}
    assert kept == {"a"}  # exact keep-first on projected text
    # b's media span untouched pre-cut: media_dedup=False never rewrites


def test_curate_ppl_bucket_gate_keeps_named_tertiles(spark):
    """ppl_keep=('head','middle') is CCNet's relative LM gate: the
    highest-nll THIRD of the scored survivors drops, with no absolute
    threshold to tune; the funnel records the cut; sub-2-token docs
    pass through ungated (the scorer never sees them)."""
    rows = (
        # head: one massively repeated bigram (lengths differ so the
        # pipeline's unconditional exact-dedup gate keeps all three)
        [(i, "alpha beta " * (30 + i), "en") for i in range(3)]
        # middle: a 4-cycle of medium-frequency bigrams
        + [(10 + i, "cc dd ee ff " * (8 + i), "en") for i in range(3)]
        # tail: per-doc singleton bigrams
        + [
            (20 + i, " ".join(f"tok{i}x{j}" for j in range(20)), "en")
            for i in range(3)
        ]
        # 1-token doc: below the scorer's domain, must survive
        + [(30, "solo", "en")]
    )
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    cfg = CurateConfig(
        langs=(),
        min_quality=None,
        near_dup=False,
        ppl_keep=("head", "middle"),
        lm_vocab_cap=200,
    )
    res = curate_corpus(docs, cfg=cfg)
    kept = sorted(r["doc_id"] for r in res["clean"].collect())
    assert kept == [0, 1, 2, 10, 11, 12, 30]
    assert ("ppl_bucket", 7) in res["funnel"]
    # head-only keeps just the cleanest third (plus the unscored doc)
    res2 = curate_corpus(
        docs,
        cfg=CurateConfig(
            langs=(),
            min_quality=None,
            near_dup=False,
            ppl_keep=("head",),
            lm_vocab_cap=200,
        ),
    )
    assert sorted(r["doc_id"] for r in res2["clean"].collect()) == [0, 1, 2, 30]


def test_curate_scrub_mode_pieces_rule(spark):
    """decontam_scrub swaps the whole-doc decontamination drop for the
    GPT-3 Appendix C rule: collision tokens are removed, docs
    shattering into > max_pieces runs (or removed entirely) drop, and
    untouched docs keep their original bytes."""
    rows = [
        (1, "Aaa, bbb ccc ddd eee fff!"),            # clean -> original bytes
        (2, "p q r s t u v w"),                      # 1 collision -> 2 pieces, kept scrubbed
        (3, "a1 q r s a2 q r s a3"),                 # 2 collisions -> 3 pieces, dropped
        (4, "q r s"),                                # fully removed -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    test = spark.createDataFrame(
        [(100, "x q r s y")], "test_id int, text string"
    )
    cfg = CurateConfig(
        langs=(),
        min_quality=None,
        near_dup=False,
        decontam_scrub=True,
        decontam_ngram=3,
        decontam_margin=0,
        decontam_max_pieces=2,
    )
    res = curate_corpus(docs, test=test, cfg=cfg)
    clean = {r["doc_id"]: r["text"] for r in res["clean"].collect()}
    assert clean == {1: "Aaa, bbb ccc ddd eee fff!", 2: "p t u v w"}
    assert res["funnel"] == [
        ("input", 4),
        ("exact_dedup", 4),
        ("decontam_scrub", 2),
    ]
    assert res["clean"].columns == docs.columns


def test_curate_interleaved_scrub_mode(spark):
    """Interleaved scrub mode: a flagged doc's clean spans SURVIVE (the
    default whole-doc gate would drop the doc), media spans pass
    through, and only a doc scrubbed down to zero spans drops."""
    from entity_linking_in_biomedical_spark.plans.curate import curate_interleaved

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    rows = [
        ("d1", [("text", "good words here", None, 0),
                ("media", None, "img://a", 1),
                ("text", "q r s tail one", None, 2)]),
        ("d2", [("text", "q r s", None, 0), ("media", None, "img://b", 1)]),
        ("d3", [("text", "q r s q r s", None, 0)]),
    ]
    docs = spark.createDataFrame(rows, schema)
    test = spark.createDataFrame([("t1", "x q r s y")], "test_id string, text string")
    cfg = CurateConfig(
        langs=(), min_quality=None, near_dup=False,
        decontam_scrub=True, decontam_ngram=3,
    )
    res = curate_interleaved(docs, test=test, cfg=cfg, media_dedup=False)
    clean = {r["doc_id"]: r["spans"] for r in res["clean"].collect()}
    assert sorted(clean) == ["d1", "d2"]
    assert [(s["kind"], s["text"], s["media_ref"]) for s in clean["d1"]] == [
        ("text", "good words here", None),
        ("media", None, "img://a"),
        ("text", "tail one", None),
    ]
    assert [(s["kind"], s["media_ref"]) for s in clean["d2"]] == [
        ("media", "img://b")
    ]
    assert res["funnel"] == [
        ("input", 3),
        ("exact_dedup", 3),
        ("decontam_scrub", 2),
    ]
