"""Memory-bandwidth ceiling probe for the scaling emulation.

The process-per-executor scaling bench runs every "executor" inside ONE
VM, so all cluster sizes share a single memory domain — unlike a real
N->4N scale-out where each node brings its own channels.  This probe
measures how aggregate achievable bandwidth scales from 4 to 16 pinned
cores with the same disjoint-taskset layout the bench uses, giving the
hardware envelope any same-box scaling number must be read against.

Each worker repeatedly copies a 256 MB numpy buffer (read+write ~= the
string-heavy conversion workload's traffic pattern) for a fixed wall
window and reports GB/s.  Workers pin to disjoint 4-cpu sets filling
from the top cpu ids, exactly like tools/scaling_bench.py.

Usage: python tools/bandwidth_probe.py [--seconds 10]
Prints one JSON line {"gbps_4core": ..., "gbps_16core": ...,
"bandwidth_scaling": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

WORKER = r"""
import json, sys, time
import numpy as np

seconds = {seconds}
out = {out!r}
src = np.random.default_rng(7).integers(0, 255, size=256 * 1024 * 1024 // 8,
                                        dtype=np.int64)
dst = np.empty_like(src)
# touch both buffers (first-touch faulting outside the timed window)
dst[:] = src
t0 = time.time()
n = 0
while time.time() - t0 < seconds:
    np.copyto(dst, src)
    n += 1
dt = time.time() - t0
# copy moves 256 MB read + 256 MB write per iteration
gb = n * 2 * src.nbytes / 1e9
with open(out, "w") as f:
    json.dump({{"gb": gb, "seconds": dt, "gbps": gb / dt}}, f)
"""


def run_level(n_workers: int, cores_per: int, seconds: int) -> float:
    rundir = tempfile.mkdtemp(prefix=f"bw_{n_workers}x_")
    n_cpus = os.cpu_count() or 32
    procs = []
    for wid in range(n_workers):
        hi = n_cpus - wid * cores_per
        cpus = ",".join(str(c) for c in range(hi - cores_per, hi))
        out = os.path.join(rundir, f"out_{wid}")
        code = WORKER.format(seconds=seconds, out=out)
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", cpus, sys.executable, "-c", code],
                stdout=subprocess.DEVNULL,
            )
        )
    for p in procs:
        p.wait(timeout=seconds * 20 + 120)
    total = 0.0
    for wid in range(n_workers):
        with open(os.path.join(rundir, f"out_{wid}")) as f:
            total += json.load(f)["gbps"]
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=10)
    args = ap.parse_args()
    # one 4-core worker (the N level's footprint) vs four (the 4N level)
    g4 = run_level(1, 4, args.seconds)
    time.sleep(2)
    g16 = run_level(4, 4, args.seconds)
    print(
        json.dumps(
            {
                "gbps_4core": round(g4, 2),
                "gbps_16core": round(g16, 2),
                "bandwidth_scaling": round(g16 / (4 * g4), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
