"""Canary-GATED executor scaling: the round-5 measurement protocol.

This host's hypervisor steal can swing a single paired 1-vs-4-executor
invocation of run_executors.py between E=0.69 and E=1.09 — a dirty
window landing on either side of the pair dominates the ratio. This
runner makes the window a measured variable:

  1. before each cluster run, a fresh Spark JVM computes the canary
     (sum over 2e9 rows, min-of-3); the run only launches if the canary
     is below ``CLEAN`` seconds,
  2. the canary is re-measured AFTER the run; samples whose after-canary
     is dirty are discarded (the window shifted mid-run),
  3. min wall time is taken PER CLUSTER SIZE across all accepted
     samples, and E = T1 / (4 * T4) is reported from those minima —
     each configuration's least-stolen measurement, the same estimator
     run_executors.py's min-of-N uses, with the windows made explicit.

Usage: python BENCH/run_gated_scaling.py [n_attempts_per_size]
Writes one JSON line with per-sample detail + the gated minima.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CLEAN = 0.52  # accept-threshold (s); clean floor on this host 0.26-0.47

_CANARY = """
import sys, time
sys.path.insert(0, {repo!r})
from jpspark.session import get_spark
from pyspark.sql import functions as F
s = get_spark("canary", master="local[32]", shuffle_partitions=32)
s.sparkContext.setLogLevel("ERROR")
s.range(10_000_000).select(F.sum("id")).collect()
best = 9e9
for _ in range(3):
    t0 = time.perf_counter()
    s.range(2_000_000_000).select(F.sum("id")).collect()
    best = min(best, time.perf_counter() - t0)
print(f"canary_jvm_sum_sec={{best:.3f}}")
"""


def canary() -> float:
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_CANARY.format(repo=REPO))
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, path], capture_output=True, text=True, timeout=300
        )
        for line in out.stdout.splitlines():
            if line.startswith("canary_jvm_sum_sec="):
                return float(line.split("=")[1])
        return 9.9
    finally:
        os.unlink(path)


def main() -> None:
    import run_executors as rx

    # run_executors reads ITS sf_dir from sys.argv at import time, so our
    # [n_attempts] argument would leak in as a bogus SF path — pin it
    if len(sys.argv) > 1:
        rx.SF_DIR = "/root/testdata/sf0.1"

    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    samples: dict[int, list[dict]] = {1: [], 4: []}
    for n_exec in (1, 4):
        done = 0
        while done < attempts:
            c0 = canary()
            if c0 >= CLEAN:
                time.sleep(150)
                continue
            r = rx.run_cluster(n_exec)
            c1 = canary()
            r["canary_before"], r["canary_after"] = c0, c1
            r["accepted"] = c1 < CLEAN + 0.03
            samples[n_exec].append(r)
            done += 1
            print(
                f"n_exec={n_exec} total={r['total']:.2f} "
                f"canary={c0:.3f}/{c1:.3f} accepted={r['accepted']}",
                flush=True,
            )
    ok1 = [s for s in samples[1] if s["accepted"]]
    ok4 = [s for s in samples[4] if s["accepted"]]
    if not ok1 or not ok4:
        raise SystemExit("no accepted samples for one of the sizes; re-run")
    best1 = min(ok1, key=lambda s: s["total"])
    best4 = min(ok4, key=lambda s: s["total"])
    out = {
        "metric": "gated_executor_scaling_1_vs_4",
        "clean_threshold_sec": CLEAN,
        "accepted_samples": {"1": len(ok1), "4": len(ok4)},
        "one_executor_sec": {k: round(best1[k], 2) for k in ("pip", "tiles", "knn", "total")},
        "four_executors_sec": {k: round(best4[k], 2) for k in ("pip", "tiles", "knn", "total")},
        "efficiency": {
            k: round(
                min(s[k] for s in ok1) / (4 * min(s[k] for s in ok4)), 3
            )
            for k in ("pip", "tiles", "knn", "total")
        },
        "samples": {
            str(n): [
                {k: round(s[k], 2) for k in ("pip", "tiles", "knn", "total")}
                | {"canary_before": s["canary_before"], "canary_after": s["canary_after"],
                   "accepted": s["accepted"]}
                for s in samples[n]
            ]
            for n in (1, 4)
        },
    }
    line = json.dumps(out)
    print(line)
    with open("/tmp/bench_gated_scaling.json", "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
