#!/usr/bin/env python3
"""Host-speed calibration: a fixed, Spark-free CPU workload whose
runtime depends only on the box, never on this repo's code.

Why this exists: BENCH readings on this host show sustained "slow
band" regimes — every query uniformly 1.2–4× slower at ZERO load
(BASELINE.md rounds 6/8/9), so a cross-round bench delta is
ambiguous between "the code regressed" and "the host regressed".
Running this next to bench.py disambiguates QUANTITATIVELY: if the
calibration moved by the same factor as the bench total, the band is
ambient; if the bench moved and the calibration did not, it's the
code. Round-9 anchor (quiet band that measured bench 13.9 s in r8
reading 16.1–16.6 s): see BASELINE.md.

Three probes, each min-of-3:
- gemm_sec: 1024³ float64 matmul ×4 (BLAS, multi-core — detects CPU
  contention/throttling that parallel Spark stages would feel).
- pyloop_sec: 20M-iteration pure-Python accumulate (single core,
  interpreter-bound — detects per-core slowdown).
- scan_sec: one sequential read of sf0.1 lineitem.parquet bytes
  (page-cache-warm I/O + memcpy path).

Prints ONE JSON line; pass a different sf dir as argv[1] if needed.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _burn(_: int) -> int:
    """2-second busy loop — module-level so multiprocessing can pickle
    it (the steal-under-load probe maps it across every core)."""
    t_end = time.time() + 2
    x = 0
    while time.time() < t_end:
        x += 1
    return x


def _min_of(n: int, fn) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))

    def gemm() -> None:
        c = a
        for _ in range(4):
            c = c @ b
        float(c[0, 0])

    def pyloop() -> None:
        acc = 0
        for i in range(20_000_000):
            acc += i & 1023
        assert acc > 0

    path = os.path.join(sf_dir, "lineitem.parquet")

    def scan() -> None:
        with open(path, "rb") as f:
            while f.read(1 << 22):
                pass

    # Disk-WRITE probe (round 10): the r10 10× sweeps showed the slow
    # band migrating onto shuffle/spill-heavy queries while gemm/pyloop
    # sat near their anchors — the band throttles the virtual-disk
    # WRITE path too, which the CPU and page-cache-read probes cannot
    # see. 256 MB written + fsync'd to /tmp, then removed.
    wpath = "/tmp/_host_calib_write_probe"
    block = b"\xa5" * (1 << 22)

    def write() -> None:
        with open(wpath, "wb") as f:
            for _ in range(64):
                f.write(block)
            f.flush()
            os.fsync(f.fileno())
        os.remove(wpath)

    # Steal-under-load probe (round 11 — the band's measured root
    # cause, BASELINE.md): %CPU the hypervisor steals from a 2-second
    # full-width busy burn, from /proc/stat jiffy deltas. The
    # single-thread probes above under-observe this because the host
    # keeps headroom for one core but not for all of them; this is the
    # signal that actually predicts whether a 32-thread Spark run will
    # land in the quiet band. None on non-Linux.
    def steal_under_load() -> float | None:
        try:
            before = [int(x) for x in open("/proc/stat").readline().split()[1:9]]
        except (OSError, ValueError):
            return None
        import multiprocessing as mp

        with mp.Pool(os.cpu_count()) as pool:
            pool.map(_burn, range(os.cpu_count()))
        after = [int(x) for x in open("/proc/stat").readline().split()[1:9]]
        d = [y - x for x, y in zip(before, after)]
        total = sum(d)
        return round(100.0 * d[7] / total, 2) if total > 0 else None

    out = {
        "gemm_sec": _min_of(3, gemm),
        "pyloop_sec": _min_of(3, pyloop),
        "scan_sec": _min_of(3, scan),
        "write_sec": _min_of(3, write),
        "steal_under_load_pct": steal_under_load(),
        "load_1min": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
