"""Distribution profiling (operators/profiling.py)."""

from __future__ import annotations

from entity_linking_in_biomedical_spark.operators.profiling import length_quantiles


def test_exact_quantiles_known_values(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 101)], "v int")
    row = length_quantiles(df, "v", probs=(0.5, 0.9), exact=True).collect()[0]
    assert row["n"] == 100 and row["mean"] == 50.5
    # interpolated: 0.5 -> 50.5, 0.9 -> 90.1 over 1..100
    assert row["q"][0] == 50.5
    assert abs(row["q"][1] - 90.1) < 1e-9


def test_approx_mode_rank_contract(spark):
    """The sketch mode must land within 1% rank error of exact — the
    contract that makes it usable as the 100 TB path."""
    df = spark.createDataFrame([(i,) for i in range(1, 10_001)], "v int")
    exact = length_quantiles(df, "v", probs=(0.25, 0.5, 0.75), exact=True).collect()[0]["q"]
    approx = length_quantiles(
        df, "v", probs=(0.25, 0.5, 0.75), exact=False, accuracy=1000
    ).collect()[0]["q"]
    for e, a in zip(exact, approx):
        assert abs(a - e) <= 0.01 * 10_000


def test_grouped_profile_shape(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(1, 21)], "v int, g string"
    )
    rows = {r["g"]: r for r in length_quantiles(df, "v", by="g").collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n"] == rows["b"]["n"] == 10
    assert len(rows["a"]["q"]) == 6
