"""Connected components (large-star/small-star) on hand-built graphs."""

from __future__ import annotations

from entity_linking_in_biomedical_spark.operators.clustering import connected_components


def cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges or [("x", "x")], "src string, dst string")
    if not edges:
        e = e.limit(0)
    n = spark.createDataFrame([(x,) for x in nodes], "node string") if nodes else None
    assign, iters = connected_components(e, nodes=n)
    return {r["node"]: r["cluster_id"] for r in assign.collect()}, iters


def test_chain(spark):
    got, _ = cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_star(spark):
    got, _ = cc(spark, [("m", "a"), ("m", "b"), ("m", "c")])
    assert set(got.values()) == {"a"}


def test_two_components(spark):
    got, _ = cc(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    assert got["a"] == got["b"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"


def test_self_loop_and_dup_edges(spark):
    got, _ = cc(spark, [("a", "a"), ("a", "b"), ("b", "a")])
    assert got == {"a": "a", "b": "a"}


def test_empty_edges_with_singletons(spark):
    got, _ = cc(spark, [], nodes=["p", "q"])
    assert got == {"p": "p", "q": "q"}


def test_long_chain_converges(spark):
    n = 40
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    got, iters = cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert iters <= 10  # O(log^2 n) rounds


def test_entity_prefix_pins_cluster(spark):
    # "e|" sorts before "s|": components with an entity root at the CUI
    got, _ = cc(spark, [("s|melanoma", "e|C0025202"), ("s|melanona", "s|melanoma")])
    assert set(got.values()) == {"e|C0025202"}


def test_digest_every_2_halves_driver_barriers(spark, monkeypatch):
    """Each _digest is one driver-blocking job; at digest_every=2 the
    convergence loop must issue roughly half as many as at 1, while the
    assignments themselves are identical (the fixpoint doesn't move)."""
    from entity_linking_in_biomedical_spark.operators import clustering

    n = 40
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    e = spark.createDataFrame(edges, "src string, dst string")

    counts = {}

    def run(every):
        calls = {"n": 0}
        orig = clustering._digest

        def counting(df):
            calls["n"] += 1
            return orig(df)

        monkeypatch.setattr(clustering, "_digest", counting)
        assign, iters = connected_components(e, digest_every=every)
        got = {r["node"]: r["cluster_id"] for r in assign.collect()}
        monkeypatch.setattr(clustering, "_digest", orig)
        counts[every] = calls["n"]
        return got, iters

    got1, iters1 = run(1)
    got2, iters2 = run(2)
    assert got1 == got2
    assert set(got1.values()) == {"n000"}
    # stride-2 checks at most ceil(rounds/2)+1 times; the per-round
    # form checks once per round — the barrier count must drop
    assert counts[2] < counts[1]
    assert counts[2] <= iters2 // 2 + 1
