#!/usr/bin/env python
"""Two-parallelism scaling measurement (the sandbox stand-in for the
north rule's N vs 4N executor criterion).

Runs the full ER pipeline via bench.py at local[8] (N) and local[32]
(4N) in separate JVMs on the identical input, ALTERNATING the levels
for ``rounds`` rounds and taking the minimum wall time per level — this
sandbox is multi-tenant (run-to-run wall variance up to 2.5x measured),
and the min is the least-contended sample of the machine's capability.
Reports throughput at both levels plus scaling efficiency
(T_N / T_4N) / 4, and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str, n_docs: str) -> float:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY_ER="1",
        SPARK_GRAFT_BENCH_DOCS=n_docs,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return float(json.loads(line)["queries"]["er_pipeline"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = os.environ.get("SPARK_GRAFT_BENCH_DOCS", "150000")
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))
    t8s, t32s = [], []
    for r in range(rounds):
        t8s.append(run(8, sf_dir, n_docs))
        print(f"round {r}: local[8] {t8s[-1]:.1f}s", file=sys.stderr)
        t32s.append(run(32, sf_dir, n_docs))
        print(f"round {r}: local[32] {t32s[-1]:.1f}s", file=sys.stderr)
    t_n, t_4n = min(t8s), min(t32s)
    nd = int(n_docs)
    eff = (t_n / t_4n) / 4
    result = {
        "sf_dir": sf_dir,
        "corpus_docs": nd,
        "local8_sec": t_n,
        "local8_docs_per_sec": round(nd / t_n, 1),
        "local32_sec": t_4n,
        "local32_docs_per_sec": round(nd / t_4n, 1),
        "scaling_efficiency": round(eff, 4),
        "all_runs": {"local8": t8s, "local32": t32s},
    }
    print(json.dumps(result))
    md = f"""# BENCH / BASELINE — measured

ER pipeline (blocking -> scoring -> transitive clustering) on the
seeded synthetic corpus ({nd} docs), identical input at two parallelism
levels. Single-JVM local[N] stands in for N executors per the driver's
instruction (no real cluster in this sandbox). The sandbox host is
multi-tenant with measured wall-time variance up to 2.5x between
identical runs, so each level is measured {rounds}x interleaved and the
minimum (least-contended) sample is reported; all samples are listed.

| parallelism | wall sec (min of {rounds}) | docs/sec | all samples (s) |
|---|---|---|---|
| local[8]  (N)  | {t_n:.2f} | {nd / t_n:.1f} | {", ".join(f"{t:.1f}" for t in t8s)} |
| local[32] (4N) | {t_4n:.2f} | {nd / t_4n:.1f} | {", ".join(f"{t:.1f}" for t in t32s)} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}**

Caveats vs a real 4N-executor cluster: a single JVM shares one driver
(job scheduling is serialized), one GC, one shuffle service and one
Python-worker pool across all task threads, so thread-level scale-up
systematically underestimates multi-executor scaling; the per-stage
shuffle boundaries that dominate here are exactly the points a real
cluster parallelizes across machines.

Correctness companions (pytest): pairwise F1 >= 0.99 vs ground truth,
exact cluster equality vs the single-node pandas oracle, span-sequence
invariant, resume-from-manifest identity.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
