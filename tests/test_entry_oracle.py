"""Self-check of the driver contract: every queries() entry runs, and
every oracle_sql() twin produces identical values in DuckDB on the same
parquet (the driver's CORRECTNESS gate, replayed at sf0.01)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    import numpy as np

    def norm_val(v):
        if isinstance(v, float):
            return round(v, 9)
        if isinstance(v, np.floating):
            return round(float(v), 9)
        if isinstance(v, (list, tuple, np.ndarray)):
            return tuple(norm_val(x) for x in v)
        return v

    out = []
    for r in rows:
        out.append(tuple(norm_val(r[c]) for c in cols))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_callable():
    assert len(QUERIES) >= 20
    # oracle-less entries are the documented non-SQL-expressible ones
    assert set(ORACLES) - set(QUERIES) == set()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF)
    sdf = df.toPandas()
    assert sdf is not None
    if name not in ORACLES:
        # rows-only contract: non-empty unless genuinely empty input
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), f"{name}: column names differ"
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    a = _normalize(sdf.to_dict("records"), cols)
    b = _normalize(odf.to_dict("records"), cols)
    mismatch = [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert a == b, f"{name}: value mismatch, e.g. {mismatch}"


@pytest.mark.parametrize("name", ["anti_join", "exact_dedup"])
def test_planted_phenomena_not_vacuous(spark, name):
    """anti_join and exact_dedup plant their phenomena in-query (round-5
    fix: both returned 0 rows at the driver's sf, so their hash checks
    proved only that two engines agree on the empty set). Guard the
    planting: a 0-row result here means the oracle pass is vacuous."""
    assert QUERIES[name](spark, SF).count() > 0


def test_er_golden_matches_fresh_oracle():
    """Drift guard: the frozen er_golden.py rows must equal a fresh run
    of the single-node pandas oracle (tools/gen_er_golden.py logic). If
    pipeline math changes legitimately, regenerate the golden."""
    import er_golden
    from tools.gen_er_golden import N_DOCS, N_ENTITIES, SEED, golden_rows

    assert (er_golden.N_DOCS, er_golden.N_ENTITIES, er_golden.SEED) == (
        N_DOCS,
        N_ENTITIES,
        SEED,
    )
    assert [tuple(r) for r in er_golden.ROWS] == golden_rows()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
