#!/usr/bin/env python
"""Ray-free host-ceiling microbenchmark for the N-vs-4N scaling question.

Two workloads at P=8 and P=32 worker processes on this box:

- mem: each worker repeatedly memcpys a 200 MB numpy buffer (DRAM-
  bandwidth-bound, zero IPC, zero shared state). On a real 4-node-vs-
  1-node cluster aggregate DRAM bandwidth scales with node count; on
  one box it is a fixed shared resource, so sub-4x scaling here is a
  property of the host, not of any pipeline running on it.
- cpu: each worker hammers a 256 KB buffer (cache-resident integer
  multiply-add — no DRAM traffic). This is the control: if the 32
  logical CPUs are real, it should scale close to 4x.

Prints one JSON line with aggregate ops/s at both sizes and the
scaling efficiency (agg32 / agg8 / 4) per workload. Used by
BASELINE.md to separate "the pipeline stops scaling" from "the box
stops scaling".
"""
from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

MEM_MB = 200
CPU_KB = 256
WARM_S = 1.0
RUN_S = 6.0


def _worker(kind: str, out, idx: int) -> None:
    if kind == "mem":
        buf = np.ones(MEM_MB * 1_000_000, np.uint8)
        unit = MEM_MB / 1000.0  # GB copied per op

        def op():
            buf.copy()
    else:
        buf = np.arange(CPU_KB * 128, dtype=np.int64)  # 256 KB, L2-resident
        unit = 1.0

        def op():
            np.multiply(buf, 6364136223846793005, out=buf)
            np.add(buf, 1442695040888963407, out=buf)

    deadline = time.monotonic() + WARM_S
    while time.monotonic() < deadline:
        op()
    n = 0
    t0 = time.monotonic()
    deadline = t0 + RUN_S
    while time.monotonic() < deadline:
        op()
        n += 1
    out[idx] = n * unit / (time.monotonic() - t0)


def run(kind: str, procs: int) -> float:
    out = mp.Array("d", procs)
    ps = [mp.Process(target=_worker, args=(kind, out, i)) for i in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return float(sum(out[:]))


def main() -> None:
    res: dict[str, object] = {"metric": "bus_ceiling", "mem_unit": "GB/s",
                              "cpu_unit": "Mops/s"}
    for kind in ("mem", "cpu"):
        lo = run(kind, 8)
        hi = run(kind, 32)
        scale = 1e6 if kind == "cpu" else 1.0
        res[f"{kind}_agg_8"] = round(lo / scale, 2)
        res[f"{kind}_agg_32"] = round(hi / scale, 2)
        res[f"{kind}_eff"] = round(hi / lo / 4.0, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
