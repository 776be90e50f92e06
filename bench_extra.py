#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): time any subset of the
declared queries in isolation with the noop sink, min-of-K, labelled
jobs, and optionally capture `.explain("formatted")` to
plans/r06/<query>_<tag>.txt. `bench.py` stays frozen; this file exists
so optimization measurements don't touch the driver's timing contract.

Usage:
    python bench_extra.py --repeats 3 [--explain-tag before] \
        [--sf-dir /root/testdata/sf0.1] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas  # noqa: F401  (pandas_udf type-hint resolution)

from pyspark.sql import functions as F


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain-tag", default=None,
                    help="when set, write plans/r06/<query>_<tag>.txt")
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    from entity_linking_in_biomedical_spark.session import get_spark

    spark = get_spark("el-spark-bench-extra", master=f"local[{cpus}]")

    import __spark_entry__ as E

    qs = E.queries()
    # warm the Python-UDF worker pool + codegen once, as bench.py does
    @F.pandas_udf("long")
    def _warm(x: pandas.Series) -> pandas.Series:
        return x

    spark.range(cpus * 10000, numPartitions=cpus).select(F.sum(_warm(F.col("id")))).collect()

    results: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"  {name}: UNKNOWN", file=sys.stderr)
            continue
        if args.explain_tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            with open(f"plans/r06/{name}_{args.explain_tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            force(qs[name](spark, args.sf_dir))
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(samples), "samples": samples}
        print(f"  {name}: min {min(samples):.2f}s  {samples}", file=sys.stderr)

    line = json.dumps({"sf_dir": args.sf_dir, "cpus": cpus, "results": results})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
