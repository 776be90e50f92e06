"""Unit tests for the JVM-side column helpers and Python string kernels."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.functions.ngrams import (
    char_ngrams,
    lsh_band_keys,
    minhash_signature,
)
from entity_linking_in_biomedical_spark.functions.normalize import norm_key
from entity_linking_in_biomedical_spark.functions.strings import (
    jaro_winkler,
    tfidf_cosine,
)
from entity_linking_in_biomedical_spark.functions.vectors import cosine_sim, dot_product


def test_norm_key(spark):
    df = spark.createDataFrame(
        [("  Hello,  World! ",), ("BRCA-1/2",), ("",), ("...",)], "s string"
    )
    got = [r[0] for r in df.select(norm_key("s")).collect()]
    assert got == ["hello world", "brca 1 2", "", ""]


def test_char_ngrams(spark):
    df = spark.createDataFrame([("hello",), ("ab",), ("",)], "s string")
    got = [r[0] for r in df.select(char_ngrams("s", 3)).collect()]
    assert got[0] == ["hel", "ell", "llo"]
    assert got[1] == ["ab"]  # shorter than n -> itself
    assert got[2] == [""]


def test_minhash_matches_hashlib(spark):
    """Spark minhash (md5-base + universal hashing) must equal a
    pure-Python reimplementation (the property the DuckDB oracle and
    the pandas pipeline oracle both rely on)."""
    from entity_linking_in_biomedical_spark.functions.ngrams import (
        MINHASH_P,
        minhash_coeffs,
    )

    s = "hello world"
    df = spark.createDataFrame([(s,)], "s string")
    sig = df.select(minhash_signature(char_ngrams("s", 3), 4).alias("sig")).collect()[0]["sig"]
    grams = [s[i : i + 3] for i in range(len(s) - 2)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % MINHASH_P for g in grams]
    expect = []
    for k in range(4):
        a, b = minhash_coeffs(k)
        expect.append(min((a * h + b) % MINHASH_P for h in hs))
    assert sig == expect


def test_minhash_matches_duckdb(spark):
    import duckdb

    from entity_linking_in_biomedical_spark.functions.ngrams import (
        char_ngrams_multi,
        duckdb_band_keys_sql,
        lsh_band_keys,
    )

    s = "melanoma"
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(
        lsh_band_keys(minhash_signature(char_ngrams_multi("s", (2, 3)), 4), 4, 1).alias("b")
    ).collect()[0]["b"]
    grams_sql = (
        "list_distinct([substr('melanoma', i, 2) for i in range(1, 8)] || "
        "[substr('melanoma', i, 3) for i in range(1, 7)])"
    )
    duck = duckdb.sql("select " + duckdb_band_keys_sql(grams_sql, 4, 4)).fetchone()[0]
    assert got == duck


def test_band_keys_shape(spark):
    from entity_linking_in_biomedical_spark.functions.ngrams import char_ngrams_multi

    df = spark.createDataFrame([("melanoma",), ("melanona",)], "s string")
    out = df.select(
        lsh_band_keys(minhash_signature(char_ngrams_multi("s", (2, 3)), 12), 12, 1).alias("bands")
    ).collect()
    a, b = out[0]["bands"], out[1]["bands"]
    assert len(a) == len(b) == 12
    # one-char typo on an 8-char string should still share >=1 band
    assert set(a) & set(b)


def test_jaro_winkler_known_values():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert jaro_winkler("", "abc") == 0.0


def test_tfidf_cosine_basic():
    idf: dict[str, float] = {}
    assert tfidf_cosine("melanoma", "melanoma", idf) == pytest.approx(1.0)
    assert tfidf_cosine("melanoma", "zzzzzz", idf) == 0.0
    near = tfidf_cosine("melanoma", "melanona", idf)
    assert 0.4 < near < 1.0


def test_vector_helpers(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<double>, b array<double>"
    )
    got = df.select(
        dot_product("a", "b").alias("d"), cosine_sim("a", "b").alias("c")
    ).collect()
    assert got[0]["d"] == pytest.approx(1.0) and got[0]["c"] == pytest.approx(1.0)
    assert got[1]["d"] == pytest.approx(0.0) and got[1]["c"] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# batch kernels == scalar reference (the production scoring path)
# ---------------------------------------------------------------------------


def _random_pairs():
    import random

    random.seed(1234)
    alph = "abcdefghij 0123é漢"
    pool = [
        "".join(random.choice(alph) for _ in range(random.randint(0, 15)))
        for _ in range(500)
    ]
    a = [random.choice(pool) for _ in range(1500)]
    b = [random.choice(pool) for _ in range(1500)]
    # adversarial fixtures: empties, equals, prefixes, unicode
    a += ["", "", "martha", "MARTHA", "dwayne", "abc", "ab", "é漢é"]
    b += ["", "x", "marhta", "MARHTA", "duane", "abc", "abd", "é漢x"]
    return a, b


def test_jaro_winkler_batch_equals_scalar():
    from entity_linking_in_biomedical_spark.functions.strings import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    a, b = _random_pairs()
    got = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert got[i] == pytest.approx(jaro_winkler(x, y), abs=1e-12), (x, y)


def test_tfidf_cosine_batch_equals_scalar():
    from collections import Counter

    from entity_linking_in_biomedical_spark.functions.strings import (
        _grams,
        pack_vocab,
        tfidf_cosine,
        tfidf_cosine_batch,
    )

    a, b = _random_pairs()
    dfc = Counter()
    for s in a + b:
        dfc.update(set(_grams(s, 3)))
    idf = {g: math.log((len(a) + 1) / (d + 1)) + 1.0 for g, d in dfc.items()}
    vc, vi = pack_vocab(idf)
    got = tfidf_cosine_batch(a, b, vc, vi, n=3)
    for i, (x, y) in enumerate(zip(a, b)):
        assert got[i] == pytest.approx(tfidf_cosine(x, y, idf, n=3), abs=1e-12), (x, y)


def test_tfidf_cosine_batch_equals_scalar_n2():
    """Regression: n=2 batch codes were right-aligned while the vocab
    packs left-aligned, so every idf lookup silently missed."""
    from collections import Counter

    from entity_linking_in_biomedical_spark.functions.strings import (
        _grams,
        pack_vocab,
        tfidf_cosine,
        tfidf_cosine_batch,
    )

    a, b = _random_pairs()
    dfc = Counter()
    for s in a + b:
        dfc.update(set(_grams(s, 2)))
    idf = {g: math.log((len(a) + 1) / (d + 1)) + 1.0 for g, d in dfc.items()}
    vc, vi = pack_vocab(idf)
    got = tfidf_cosine_batch(a, b, vc, vi, n=2)
    for i, (x, y) in enumerate(zip(a, b)):
        assert got[i] == pytest.approx(tfidf_cosine(x, y, idf, n=2), abs=1e-12), (x, y)


def test_tfidf_cosine_batch_rejects_oversize_n():
    import pytest as _pytest

    from entity_linking_in_biomedical_spark.functions.strings import (
        tfidf_cosine_batch,
    )
    import numpy as np

    with _pytest.raises(ValueError):
        tfidf_cosine_batch(["abcd"], ["abcd"], np.zeros(0, dtype=np.int64), np.zeros(0), n=4)


def test_batch_kernels_empty_and_null_safe():
    import numpy as np

    from entity_linking_in_biomedical_spark.functions.strings import (
        jaro_winkler_batch,
        tfidf_cosine_batch,
    )

    assert len(jaro_winkler_batch([], [])) == 0
    vc = np.zeros(0, dtype=np.int64)
    vi = np.zeros(0)
    assert len(tfidf_cosine_batch([], [], vc, vi)) == 0
    got = jaro_winkler_batch([None, "a"], ["a", None])
    assert got[0] == 0.0 and got[1] == 0.0


def test_jaro_winkler_matches_duckdb_independent_impl():
    """Cross-check the JW kernels against DuckDB's built-in
    jaro_winkler_similarity — an independent C++ implementation — on
    random non-empty pairs: bit-for-bit agreement (the documented
    divergence is only the empty-string convention: ours scores
    '' == '' as 1.0, DuckDB as 0.0)."""
    import random

    import duckdb

    from entity_linking_in_biomedical_spark.functions.strings import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    rng = random.Random(11)
    al = "abcdefghij xyz"
    pairs = [
        (
            "".join(rng.choice(al) for _ in range(rng.randint(1, 14))),
            "".join(rng.choice(al) for _ in range(rng.randint(1, 14))),
        )
        for _ in range(800)
    ] + [("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish")]
    con = duckdb.connect()
    batch = jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
    for i, (a, b) in enumerate(pairs):
        d = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert jaro_winkler(a, b) == d
        assert batch[i] == d


def test_monge_elkan_hand_and_batch_consistency():
    from decimal import ROUND_HALF_UP, Decimal

    from entity_linking_in_biomedical_spark.functions.strings import (
        jaro_winkler,
        monge_elkan,
        monge_elkan_batch,
    )

    def q(x):
        return Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)

    a, b = ["john", "smith"], ["smith", "jon"]
    want = float(
        q(max(jaro_winkler("john", t) for t in b))
        + q(max(jaro_winkler("smith", t) for t in b))
    ) / 2
    assert monge_elkan(a, b) == want
    # reordering-insensitive on the b side; asymmetric by definition
    assert monge_elkan(a, list(reversed(b))) == want
    assert monge_elkan(["smith"], ["smith", "zzz"]) == 1.0
    # empty conventions
    assert monge_elkan([], ["x"]) == 0.0
    assert monge_elkan(["x", "y"], []) == 0.0
    # batch == scalar over a mixed batch (incl. empties)
    batch_a = [a, ["smith"], [], ["x", "y"], ["alpha", "beta", "beta"]]
    batch_b = [b, ["smith", "zzz"], ["x"], [], ["beta", "gamma"]]
    got = monge_elkan_batch(batch_a, batch_b)
    for i, (xa, xb) in enumerate(zip(batch_a, batch_b)):
        assert got[i] == monge_elkan(xa, xb)
