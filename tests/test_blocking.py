"""Blocking channels: exact, deletion-neighborhood, LSH; hot-key cap;
per-surface top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.blocking import (
    block_candidates,
    blocking_keys,
    deletion_keys,
    entity_names,
)


def keys_of(spark, s, **kw):
    df = spark.createDataFrame([(s,)], "norm string")
    return df.select(blocking_keys(F.col("norm"), **kw).alias("k")).collect()[0]["k"]


def test_exact_key_always_present(spark):
    ks = keys_of(spark, "melanoma")
    assert "x|melanoma" in ks


def test_deletion_keys_lev1_guarantee(spark):
    """Any lev-1 edit pair (substitution, deletion, insertion,
    transposition-ish) shares a d| key."""
    cases = [
        ("rb96", "rb6"),  # deletion
        ("rb96", "rb966"),  # insertion... rb966 del-1 -> rb96
        ("rb96", "rb97"),  # substitution (shares del of last char? rb9)
        ("abcde", "abdce"),  # adjacent transposition = 2 subs; del2 covers
    ]
    for a, b in cases:
        ka = set(keys_of(spark, a))
        kb = set(keys_of(spark, b))
        shared = {k for k in ka & kb if k.startswith("d|")}
        assert shared, f"{a} vs {b}: no shared deletion key"


def test_no_short_variant_keys(spark):
    ks = keys_of(spark, "ak34")
    assert all(len(k) - 2 >= 3 for k in ks if k.startswith("d|"))


def test_long_strings_skip_deletion_use_lsh(spark):
    s = "a" * 20
    ks = keys_of(spark, s)
    assert not any(k.startswith("d|") for k in ks)
    assert any(not k.startswith(("d|", "x|")) for k in ks)  # lsh bands


def test_short_strings_skip_lsh(spark):
    ks = keys_of(spark, "ab")
    assert all(k.startswith(("d|", "x|")) for k in ks)


def _mentions(spark, surfaces):
    return spark.createDataFrame(
        [("D1", i, s, s) for i, s in enumerate(surfaces)],
        "doc_id string, span_seq int, surface string, norm string",
    )


def _names(spark, pairs):
    return spark.createDataFrame(
        [(c, n, n) for c, n in pairs], "cui string, name string, norm string"
    )


def test_exact_and_typo_candidates(spark):
    mentions = _mentions(spark, ["melanoma", "melanona", "zzz999xx"])
    names = _names(spark, [("C1", "melanoma"), ("C2", "carcinoma")])
    got = block_candidates(mentions, names)
    pairs = {(r["norm"], r["cui"]) for r in got.collect()}
    assert ("melanoma", "C1") in pairs
    assert ("melanona", "C1") in pairs  # typo found via del/lsh channel
    assert not any(n == "zzz999xx" for n, _ in pairs)


def test_hot_key_cap_drops_mega_blocks(spark):
    # 100 entities share the same norm -> the x| key is hot and dropped
    mentions = _mentions(spark, ["shared name"])
    names = _names(spark, [(f"C{i}", "shared name") for i in range(100)])
    got = block_candidates(mentions, names, max_key_freq=50)
    assert got.count() == 0


def test_top_k_cap(spark):
    mentions = _mentions(spark, ["akx"])
    # 40 near-matching entities; top_k=5 keeps 5
    names = _names(spark, [(f"C{i:02d}", "ak" + chr(97 + i % 26)) for i in range(40)])
    got = block_candidates(mentions, names, top_k=5)
    assert got.filter(F.col("norm") == "akx").count() <= 5


def test_entity_names_explode_dedup(spark):
    ents = spark.createDataFrame(
        [("C1", "T", ["Breast Cancer", "breast cancer", "BC tumor"])],
        "cui string, sem_type string, synonyms array<string>",
    )
    got = entity_names(ents).collect()
    norms = sorted(r["norm"] for r in got)
    assert norms == ["bc tumor", "breast cancer"]  # case-dup collapsed


def test_word_channel_catches_token_reorder(spark):
    """Reordered multi-word synonyms share no useful char n-grams or
    deletion variants — only the word channel blocks them together."""
    from entity_linking_in_biomedical_spark.operators.blocking import blocking_keys

    df = spark.createDataFrame(
        [("egfr kinase inhibitor", "kinase egfr inhibitor")], "a string, b string"
    )
    row = df.select(
        blocking_keys(F.col("a")).alias("ka"), blocking_keys(F.col("b")).alias("kb")
    ).collect()[0]
    # pure reorderings are GUARANTEED a shared sorted-token key (char
    # LSH also usually collides here, but only probabilistically)
    shared_w = {k for k in set(row["ka"]) & set(row["kb"]) if k.startswith("w")}
    assert "w|egfr inhibitor kinase" in shared_w
    # token minhash keys shared too (identical token sets)
    assert any(k.startswith("w0|") for k in shared_w)
    # and the oracle twin produces the identical key sets
    from entity_linking_in_biomedical_spark.plans.pipeline import PipelineConfig
    from tests.oracle_impl import blocking_keys_py

    cfg = PipelineConfig()
    assert sorted(row["ka"]) == sorted(blocking_keys_py("egfr kinase inhibitor", cfg))
    assert sorted(row["kb"]) == sorted(blocking_keys_py("kinase egfr inhibitor", cfg))


def test_blocking_skew_invariant_guard(spark, corpus):
    """The explicit repartition('norm') inside block_candidates is safe
    from mega-partitions only while per-surface pre-dedup fan-out stays
    under blocking_skew_bound() (AQE cannot split an explicit
    repartition). skew_assert=True verifies it at run time; the bound
    must also hold for the post-dedup output a fortiori."""
    from entity_linking_in_biomedical_spark.operators.blocking import (
        blocking_skew_bound,
        max_candidates_per_surface,
    )
    from entity_linking_in_biomedical_spark.operators.mentions import (
        extract_mentions,
    )

    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    mentions = extract_mentions(docs, abbr)
    names = entity_names(ents)
    cands = block_candidates(mentions, names, skew_assert=True)  # no raise
    assert max_candidates_per_surface(cands) <= blocking_skew_bound()


def test_blocking_skew_guard_trips_when_bound_shrinks(spark, corpus, monkeypatch):
    """Wiring check: if a future change broke the fan-out bound (e.g.
    removing the hot-key cap), the guard raises instead of silently
    shipping a skewed exchange."""
    import pytest

    import entity_linking_in_biomedical_spark.operators.blocking as B
    from entity_linking_in_biomedical_spark.operators.mentions import (
        extract_mentions,
    )

    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    mentions = extract_mentions(docs, abbr)
    names = B.entity_names(ents)
    monkeypatch.setattr(B, "blocking_skew_bound", lambda *a, **k: 0)
    with pytest.raises(AssertionError, match="skew invariant"):
        B.block_candidates(mentions, names, skew_assert=True)


def test_phonetic_channel_blocks_spelling_variants(spark):
    """Opt-in 'p|' Soundex channel: Robert/Rupert share no 2-gram and
    differ at edit distance 3, but co-block phonetically; default-off
    keeps the standard key set byte-stable."""
    from entity_linking_in_biomedical_spark.operators.blocking import (
        blocking_keys,
        channel_of,
    )

    df = spark.createDataFrame([("robert",), ("rupert",)], "norm string")
    keys_on = df.select(
        "norm",
        F.explode(blocking_keys(F.col("norm"), phonetic=True)).alias("bk"),
    )
    ph = keys_on.filter(F.col("bk").startswith("p|"))
    got = {r["norm"]: r["bk"] for r in ph.collect()}
    assert got["robert"] == got["rupert"] == "p|R163"
    assert (
        ph.select(channel_of(F.col("bk")).alias("c")).distinct().collect()[0]["c"]
        == "phonetic"
    )
    # default-off: no p| keys
    keys_off = df.select(F.explode(blocking_keys(F.col("norm"))).alias("bk"))
    assert keys_off.filter(F.col("bk").startswith("p|")).count() == 0


def test_block_candidates_phonetic_channel_end_to_end(spark):
    """With phonetic=True a spelling variant pairs through the 'p|'
    channel even when exact/deletion channels miss it (edit distance 3,
    LSH below min length after n-gram sparsity)."""
    from entity_linking_in_biomedical_spark.operators.blocking import (
        block_candidates,
    )

    mentions = spark.createDataFrame([("robert",)], "norm string")
    names = spark.createDataFrame([("C1", "rupert")], "cui string, norm string")
    # robert/rupert ALSO co-block via delete-2 ("rert") and often LSH;
    # disable the other fuzzy channels so the candidate can only come
    # from the Soundex key
    narrow = dict(del_max_len=0, del2_max_len=0, lsh_min_len=99, word_num_hashes=0)
    off = block_candidates(mentions, names, phonetic=False, **narrow)
    on = block_candidates(mentions, names, phonetic=True, **narrow)
    assert off.count() == 0
    got = on.collect()
    assert [(r["norm"], r["cui"], r["channel"]) for r in got] == [
        ("robert", "C1", "phonetic")
    ]
