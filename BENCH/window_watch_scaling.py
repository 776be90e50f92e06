"""Healthy-window N-vs-4N scaling watcher.

Same probe loop as window_watch.py, but the payload is the official
cluster-scaling fleet (BENCH/run_cluster_scaling.py): the round-5
official record (cluster_scaling_r5_s5.json) landed entirely in a
DEGRADED host window, and the best absolute legs on record came from a
quiet one — so this watcher fires ONE fleet run the first time the
membw probe reads healthy, writing the runner's normal output plus a
pointer log here.

Run detached:  python BENCH/window_watch_scaling.py &
Stops by itself after MAX_HOURS or after a successful run.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

THRESHOLD_GBPS = float(os.environ.get("WATCH_THRESHOLD_GBPS", "5.0"))
PROBE_INTERVAL_SEC = int(os.environ.get("WATCH_INTERVAL_SEC", "150"))
MAX_HOURS = float(os.environ.get("WATCH_MAX_HOURS", "4.0"))
LOG = os.path.join(os.path.dirname(__file__), "window_watch_scaling.log")


def probe_membw_gbps() -> float:
    import numpy as np

    buf = np.zeros(2**23)  # 64 MiB float64
    t0 = time.time()
    for _ in range(2):
        buf = buf.copy()
    return round(2 * 2 * (2**23 * 8) / (time.time() - t0) / 1e9, 2)


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


def main() -> None:
    deadline = time.time() + MAX_HOURS * 3600
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    while time.time() < deadline:
        bw = probe_membw_gbps()
        log(f"probe_membw_gbps={bw}")
        if bw >= THRESHOLD_GBPS:
            log("healthy window — firing cluster scaling fleet")
            # same topology as the official record
            # (cluster_scaling_r5_s5.json): equalized 1x2-core vs
            # 4x2-core, 150k docs, 3 rounds
            env = dict(os.environ)
            env.setdefault("SPARK_GRAFT_SCALE_ROUNDS", "3")
            env.setdefault("SPARK_GRAFT_SCALE_N_WORKERS", "1")
            env.setdefault("SPARK_GRAFT_SCALE_4N_WORKERS", "4")
            env.setdefault("SPARK_GRAFT_SCALE_CORES", "2")
            env.setdefault("SPARK_GRAFT_SCALE_EQUALIZE", "1")
            env["SPARK_GRAFT_SCALE_OUT"] = os.path.join(
                os.path.dirname(__file__), "cluster_scaling_r5_quiet.json"
            )
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, os.path.join("BENCH", "run_cluster_scaling.py")],
                cwd=repo,
                env=env,
                capture_output=True,
                text=True,
                timeout=5400,
            )
            wall = round(time.time() - t0, 1)
            if proc.returncode == 0:
                log(f"fleet complete in {wall}s (see runner output json)")
                return
            log(f"fleet failed rc={proc.returncode}: {proc.stderr[-500:]}")
        time.sleep(PROBE_INTERVAL_SEC)
    log("deadline reached without a healthy window")


if __name__ == "__main__":
    main()
