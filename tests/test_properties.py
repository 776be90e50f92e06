"""Property-based tests (hypothesis) — pure-Python kernels only, so
they run in milliseconds: overlap sweep postconditions, connected
components vs a union-find oracle, Jaro-Winkler/minhash invariants."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from entity_linking_in_biomedical_spark.functions.strings import jaro_winkler
from entity_linking_in_biomedical_spark.operators.mentions import _sweep


def mk_span(kind, text, offset):
    return {"kind": kind, "text": text, "media_ref": None, "offset": offset}


spans_strategy = st.lists(
    st.tuples(
        st.sampled_from(["mention", "text", "media"]),
        st.text(alphabet="abcdef ", min_size=0, max_size=8),
        st.integers(min_value=0, max_value=50),
    ).map(lambda t: mk_span(*t)),
    max_size=12,
)


@given(spans_strategy)
@settings(max_examples=200, deadline=None)
def test_sweep_postconditions(spans):
    kept = _sweep(spans)
    # indices valid, sorted, mention-only
    assert kept == sorted(kept)
    for i in kept:
        assert spans[i]["kind"] == "mention"
    # surviving mentions are non-overlapping in (start, end)
    ivs = sorted(
        (spans[i]["offset"], spans[i]["offset"] + len(spans[i]["text"] or "")) for i in kept
    )
    for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
        assert s2 >= e1, f"overlap survived: {(s1, e1)} vs {(s2, e2)}"


@given(spans_strategy)
@settings(max_examples=100, deadline=None)
def test_sweep_idempotent(spans):
    kept = _sweep(spans)
    survivors = [spans[i] for i in kept]
    again = _sweep(survivors)
    assert again == list(range(len(survivors)))


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).map(
            lambda t: (f"n{t[0]:02d}", f"n{t[1]:02d}")
        ),
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_cc_matches_union_find(spark, edges):
    from tests.oracle_impl import UF

    from entity_linking_in_biomedical_spark.operators.clustering import (
        connected_components,
    )

    e = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    if not edges:
        e = e.limit(0)
    assign, _ = connected_components(e)
    got = {r["node"]: r["cluster_id"] for r in assign.collect()}
    uf = UF()
    for a, b in edges:
        if a != b:
            uf.union(a, b)
    want = {n: uf.find(n) for n in {x for ab in edges for x in ab if ab[0] != ab[1]}}
    assert got == want


@given(st.text(max_size=12), st.text(max_size=12))
@settings(max_examples=500, deadline=None)
def test_jw_bounds_and_symmetry(a, b):
    v = jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert abs(v - jaro_winkler(b, a)) < 1e-12
    if a == b and a:
        assert v == 1.0


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_stanza_like_tokenizer_offset_invariant(text):
    """For ANY input text: every emitted (token, start) satisfies
    text[start:start+len(token)] == token, tokens are non-empty,
    non-overlapping, in order, and cover exactly the non-whitespace
    characters (nothing dropped, nothing invented) — the contract the
    IOB2 kernel's B-position alignment depends on."""
    from entity_linking_in_biomedical_spark.plans.stanza_like import (
        make_tokenizer,
    )

    toks = make_tokenizer()(text)
    prev_end = 0
    covered = 0
    for t, start in toks:
        assert t and not any(c.isspace() for c in t)
        assert text[start : start + len(t)] == t
        assert start >= prev_end
        prev_end = start + len(t)
        covered += len(t)
    assert covered == sum(1 for c in text if not c.isspace())
