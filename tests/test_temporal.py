"""Temporal operators: as-of join, range join, sessionization, funnel.

Differential oracles: pandas.merge_asof for asof_join, a naive
cross-join filter for range_join — both on seeded random inputs — plus
hand-computed micro-cases for tie/tolerance/boundary semantics and
plan assertions that the bucketed range join never degenerates into a
BroadcastNestedLoop/cartesian plan.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.temporal import (
    asof_join,
    funnel,
    range_join,
    sessionize,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


def test_asof_join_micro_semantics(spark):
    """Backward as-of: most recent right row with r.ts <= l.ts; equal
    timestamps match; rows before any right row get nulls."""
    left = spark.createDataFrame(
        [(1, _ts(5)), (1, _ts(10)), (1, _ts(2)), (2, _ts(7))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), "a"), (1, _ts(10), "b"), (2, _ts(8), "c")],
        "k int, rts timestamp, v string",
    )
    got = {
        (r["k"], r["ts"]): r["v_right"]
        for r in asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    }
    assert got[(1, _ts(5))] == "a"
    assert got[(1, _ts(10))] == "b"  # equal ts matches
    assert got[(1, _ts(2))] is None  # nothing earlier
    assert got[(2, _ts(7))] is None  # right row is later


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(100))], "k int, ts timestamp")
    right = spark.createDataFrame([(1, _ts(10), 9.0)], "k int, rts timestamp, v double")
    keep = asof_join(left, right, "k", "ts", "rts", ["v"], tolerance_us=90_000_000)
    drop = asof_join(left, right, "k", "ts", "rts", ["v"], tolerance_us=89_999_999)
    assert keep.collect()[0]["v_right"] == 9.0
    assert drop.collect()[0]["v_right"] is None


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = random.Random(7)
    lrows = [(rng.randrange(5), _ts(rng.randrange(10_000))) for _ in range(400)]
    # unique (k, ts) on the right — the operator's documented contract
    rkeys = {(rng.randrange(5), rng.randrange(10_000)) for _ in range(300)}
    rrows = [(k, _ts(s), float(i)) for i, (k, s) in enumerate(sorted(rkeys))]
    left = spark.createDataFrame(lrows, "k int, ts timestamp")
    right = spark.createDataFrame(rrows, "k int, rts timestamp, v double")
    got = (
        asof_join(left, right, "k", "ts", "rts", ["v"])
        .toPandas()
        .sort_values(["k", "ts", "v_right"])
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values("ts").reset_index(drop=True)
    rp = pd.DataFrame(rrows, columns=["k", "rts", "v"]).sort_values("rts")
    exp = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k", direction="backward")
    exp = exp.sort_values(["k", "ts", "v"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["v_right"].equals(exp["v"].rename("v_right"))
    # matched timestamp comes back epoch-equal as <right_ts>_right
    mask = exp["v"].notna().values
    assert (
        got.loc[mask, "rts_right"].reset_index(drop=True)
        == exp.loc[mask, "rts"].reset_index(drop=True)
    ).all()


def test_range_join_matches_naive_and_plan_has_no_nested_loop(spark):
    rng = random.Random(11)
    lrows = [(rng.randrange(4), i, _ts(rng.randrange(2_000))) for i in range(250)]
    rrows = [(rng.randrange(4), i, _ts(rng.randrange(2_000))) for i in range(250)]
    left = spark.createDataFrame(lrows, "k int, lid int, ts timestamp")
    right = spark.createDataFrame(rrows, "k int, rid int, ts timestamp")
    lo, hi = 5_000_000, 120_000_000  # gap in [5s, 120s]
    out = range_join(left, right, "k", "ts", "ts", lo, hi)
    got = {(r["k"], r["lid"], r["rid"]) for r in out.collect()}
    exp = {
        (lk, lid, rid)
        for (lk, lid, lt) in lrows
        for (rk, rid, rt) in rrows
        if lk == rk and lo <= (rt - lt).total_seconds() * 1e6 <= hi
    }
    assert got == exp and len(exp) > 50
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    # each output row appears exactly once despite the <=2-bucket explode
    assert out.count() == len(got)


def test_range_join_negative_lower_bound(spark):
    left = spark.createDataFrame([(1, _ts(100))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, 1, _ts(95)), (1, 2, _ts(105)), (1, 3, _ts(200))],
        "k int, rid int, rts timestamp",
    )
    got = {
        r["rid"]
        for r in range_join(
            left, right, "k", "ts", "rts", -10_000_000, 10_000_000
        ).collect()
    }
    assert got == {1, 2}


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, 0, _ts(0)),
            (1, 1, _ts(100)),
            (1, 2, _ts(100 + 1801)),  # gap 1801s > 30min -> new session
            (1, 3, _ts(100 + 1801 + 1800)),  # exactly 30min -> same session
            (2, 4, _ts(50)),
        ],
        "user int, eid int, ts timestamp",
    )
    got = {
        r["eid"]: (r["session_seq"], r["session_id"])
        for r in sessionize(ev, "user", "ts", 1800 * 1_000_000, "eid").collect()
    }
    assert got[0] == (1, "1#1") and got[1] == (1, "1#1")
    assert got[2] == (2, "1#2") and got[3] == (2, "1#2")
    assert got[4] == (1, "2#1")


def test_funnel_strict_ordering(spark):
    ev = spark.createDataFrame(
        [
            # user 1 completes view -> click -> buy in order
            (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "buy", _ts(3)),
            # user 2 clicks BEFORE its first view: click must not count
            (2, "click", _ts(1)), (2, "view", _ts(2)), (2, "buy", _ts(3)),
            # user 3 views only
            (3, "view", _ts(1)),
            # user 4 never views: excluded from every step
            (4, "click", _ts(1)), (4, "buy", _ts(2)),
        ],
        "user int, etype string, ts timestamp",
    )
    rows = {
        r["step"]: (r["n_keys"], r["conversion"])
        for r in funnel(ev, "user", "ts", "etype", ["view", "click", "buy"]).collect()
    }
    assert rows["view"] == (3, 1.0)
    assert rows["click"] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert rows["buy"] == (1, 1.0)


def test_funnel_is_single_lazy_plan(spark):
    """The funnel must not fire per-step count() actions at build
    time: constructing it runs zero jobs."""
    ev = spark.createDataFrame([(1, "a", _ts(1))], "user int, etype string, ts timestamp")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = funnel(ev, "user", "ts", "etype", ["a", "b"])
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    assert df.count() == 2
