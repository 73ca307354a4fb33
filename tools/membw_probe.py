"""Host resource-scaling probe: how much CPU and memory bandwidth does
THIS box actually give N concurrent processes?

Motivation: the north_rule's scaling criterion (>=0.8 efficiency from N
to 4N executors) assumes a real cluster, where 4N executors bring 4N x
cores AND 4N x memory channels.  A single box scales neither past its
socket limits: this probe measures both curves so BENCH/BASELINE.md can
pick the largest honest N/4N pair — the one where the HARDWARE still
scales and the measurement reflects the engine.

Each worker does a FIXED amount of work; perfect scaling = flat wall
time as process count rises.

    python tools/membw_probe.py            # prints JSON

Typical output on the sandbox VM (32 vCPU): pure-CPU stays ~flat to 16
procs, but memory-streaming degrades ~2x at 8, ~3x at 16, ~17x at 32 —
the DIMMs saturate long before the cores run out.
"""

from __future__ import annotations

import json
import os
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

from multiprocessing import Pool  # noqa: E402

import numpy as np  # noqa: E402


def cpu_burn(_) -> int:
    s = 0
    for i in range(20_000_000):
        s += i * i & 1023
    return s


def mem_burn(_) -> float:
    a = np.empty(40_000_000, dtype=np.float64)  # 320 MB stream
    a[:] = 1.0
    s = 0.0
    for _ in range(6):
        s += float(a.sum())
        a *= 1.0000001
    return s


def curve(fn, levels=(1, 2, 4, 8, 16, 32)) -> dict[int, float]:
    out: dict[int, float] = {}
    for n in levels:
        with Pool(n) as p:
            p.map(fn, range(n))  # warm forks + allocators
            t0 = time.time()
            p.map(fn, range(n))
            out[n] = round(time.time() - t0, 3)
    return out


def main() -> dict:
    cpu = curve(cpu_burn)
    mem = curve(mem_burn)
    result = {
        "cpu_flat_wall_by_procs": cpu,
        "membw_flat_wall_by_procs": mem,
        "cpu_scaling_vs_1proc": {
            n: round(cpu[1] / w, 3) for n, w in cpu.items()
        },
        "membw_scaling_vs_1proc": {
            n: round(mem[1] / w, 3) for n, w in mem.items()
        },
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
