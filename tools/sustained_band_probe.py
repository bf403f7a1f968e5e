#!/usr/bin/env python3
"""Discriminate AMBIENT slow bands from LOAD-INDUCED throttling.

Round-10 observation: every bench.py launch gated on a quiet standalone
calibration (gemm ≈ 0.045 s) still recorded in-run gemm probes of
0.24–1.9 s and a 1.2–1.6× uniform query inflation vs the r8 readings —
the band arrives DURING the run, every run. Two hypotheses:

- AMBIENT: the host drifts into slow bands on its own; bench launches
  are just unlucky (the r9 thesis).
- INDUCED: sustained many-core load triggers host/hypervisor
  throttling after a few seconds, so ANY full-width bench run creates
  the band it then measures.

Protocol: for each sustained-load duration T in SECONDS_LIST, saturate
all cores with a busy spin for T seconds, stop, then immediately probe
gemm/pyloop (single-rep) at +0 s, +10 s, +20 s idle. If post-load
probes degrade with T (and recover with idle time), the band is
INDUCED with a cooldown; if they are flat at the quiet anchor for all
T, the bands are AMBIENT and the bench overlaps them by coincidence.

Prints one JSON line per (T, delay) cell.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def _spin(stop_at: float) -> None:
    x = 1
    while time.time() < stop_at:
        x = (x * 1103515245 + 12345) % (1 << 31)


def _probe() -> dict[str, float]:
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    t0 = time.perf_counter()
    c = a
    for _ in range(4):
        c = c @ b
    float(c[0, 0])
    gemm = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i & 1023
    pyloop = time.perf_counter() - t0
    return {"gemm_sec": round(gemm, 4), "pyloop_sec": round(pyloop, 4)}


def main() -> None:
    n = os.cpu_count() or 8
    for t_load in (0, 15, 30, 60, 120):
        if t_load:
            stop_at = time.time() + t_load
            procs = [mp.Process(target=_spin, args=(stop_at,)) for _ in range(n)]
            for p in procs:
                p.start()
            for p in procs:
                p.join()
        for delay in (0, 10, 20):
            if delay:
                time.sleep(10)
            out = {"t_load": t_load, "delay": delay, **_probe(),
                   "load_1min": round(os.getloadavg()[0], 2)}
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
