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
