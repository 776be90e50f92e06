"""Local mirror of the driver's correctness gate: run any subset of
``__spark_entry__.queries()`` against its ``oracle_sql()`` DuckDB twin
at an arbitrary scale-factor directory and report row/schema/value
agreement. Used for pre-driver regression sweeps (sf0.01, ~3 min) and
the sf0.1 heavy-family sweep, where caps (max_bucket, SRP bits, IVF
sample) bind differently than at the gate's sf0.01.

Usage:
    python tools/oracle_check.py [--sf-dir /root/testdata/sf0.1] \
        [--out BENCH/oracle_sweep.json] [query ...]

With no query names, sweeps every entry that has an oracle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by every column (stringified for
    a total order), mirroring the driver's sort-then-hash compare."""
    df = df[sorted(df.columns)].copy()
    if len(df):
        key = df.astype(str)
        df = df.loc[key.sort_values(by=list(df.columns)).index].reset_index(drop=True)
    return df


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-6, atol=1e-9, equal_nan=True
            ):
                return False
        else:
            if not (av.astype(str).values == bv.astype(str).values).all():
                return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=None, help="write a JSON record here")
    ap.add_argument("queries", nargs="*", help="subset to check (default: all oracled)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from entity_linking_in_biomedical_spark.session import get_spark

    spark = get_spark("oracle-check", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    names = args.queries or [n for n in qs if n in oracles]
    results: dict[str, dict] = {}
    ok = True
    for name in names:
        if name not in oracles:
            results[name] = {"err": "no oracle"}
            continue
        t0 = time.time()
        try:
            got = _canon(qs[name](spark, args.sf_dir).toPandas())
            want = _canon(con.execute(oracles[name]).df())
            r = {
                "rows_match": len(got) == len(want),
                "schema_match": list(got.columns) == list(want.columns),
                "values_match": _values_match(got, want),
                "spark_rows": len(got),
                "oracle_rows": len(want),
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            r = {"err": f"{type(e).__name__}: {e}", "sec": round(time.time() - t0, 2)}
        results[name] = r
        good = r.get("rows_match") and r.get("schema_match") and r.get("values_match")
        ok = ok and bool(good)
        print(f"  {name}: {'OK' if good else 'FAIL ' + json.dumps(r)} ({r['sec']}s)", file=sys.stderr)

    record = {"sf_dir": args.sf_dir, "results": results, "all_ok": ok}
    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
