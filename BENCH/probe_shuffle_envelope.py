#!/usr/bin/env python
"""Platform-envelope probe: how does SPARK ITSELF scale on this host?

Runs the most canonical JVM-only map-shuffle-reduce there is — range →
xxhash64 key → groupBy sum/count → noop sink, no Python, no UDFs, no
custom operators — at local[2] (busy-core equalized with 6 floating
spinners) vs local[8], min of 3 runs each.

Measured on the sandbox host (round 3): 15.6 s → 5.95 s = 2.63×/4 =
**0.66 efficiency**. The full ER pipeline measures 0.60 under the same
controls, i.e. the engine tracks the platform envelope of Spark's own
exchange machinery on this single-host silicon; its heaviest custom
stage (Arrow pairwise scoring) scales at 0.82, above the envelope.
See BENCH/BASELINE.md for the complete experiment ladder.
"""

from __future__ import annotations

import subprocess
import sys

SPIN = "x=0\nwhile True:\n x+=1"

WORKLOAD = """
import time
from entity_linking_in_biomedical_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("shufprobe", master="local[{cores}]", shuffle_partitions={parts})
df = spark.range(0, 40_000_000, 1, {parts}).select(
    F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k"), F.col("id").alias("v"))
df.limit(1000).groupBy("k").agg(F.sum("v")).write.format("noop").mode("overwrite").save()
t0 = time.time()
df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).write.format(
    "noop").mode("overwrite").save()
print("TIME", time.time() - t0)
spark.stop()
"""


def run(cores: int, spinners: int) -> float | None:
    sp = [
        subprocess.Popen(
            [sys.executable, "-c", SPIN],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(spinners)
    ]
    try:
        out = subprocess.run(
            [sys.executable, "-c", WORKLOAD.format(cores=cores, parts=cores * 2)],
            capture_output=True,
            text=True,
            timeout=600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("TIME"):
                return float(line.split()[1])
        sys.stderr.write(out.stderr[-500:])
        return None
    finally:
        for p in sp:
            p.terminate()


def main() -> None:
    results = {}
    for cores, spinners in ((2, 6), (8, 0)):
        # `t is not None`, not truthiness: a (theoretical) 0.0s run is a
        # measurement, while None marks a failed/timed-out run
        ts = [t for t in (run(cores, spinners) for _ in range(3)) if t is not None]
        if not ts:
            sys.exit(
                f"probe: all 3 runs at local[{cores}] failed or timed out — "
                f"no envelope measurement possible (see stderr above)"
            )
        results[cores] = min(ts)
        print(f"local[{cores}] (+{spinners} spinners): {ts} min={min(ts):.2f}")
    eff = results[2] / results[8] / 4
    print(f"JVM shuffle envelope 2->8 cores: {eff:.3f} efficiency")


if __name__ == "__main__":
    main()
