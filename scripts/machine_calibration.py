"""Machine scaling calibration — context for BENCH/BASELINE.md.

Measures what THIS host can physically deliver when parallelism is scaled
N -> 4N, independent of Spark:

- pure-ALU: per-process busy loops (no memory traffic) — the hypervisor /
  SMT ceiling;
- memory-stream: per-process large-array sums (numpy) — the shared
  memory-bandwidth ceiling, the regime a parquet-scan + string pipeline
  actually lives in.

Prints one JSON line: efficiency = (rate_4N / rate_N) / 4 per workload.
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Pool


def _burn(_):
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return time.time() - t0


def _stream(_):
    import numpy as np

    a = np.random.default_rng(0).random(30_000_000)  # ~240 MB
    t0 = time.time()
    s = 0.0
    for _ in range(4):
        s += float(a.sum())
    return time.time() - t0


def rate(fn, n_procs: int, pin: bool = True) -> tuple[float, bool]:
    """(tasks/sec, actually_pinned) with n_procs workers pinned to
    n_procs CPUs. Pinning can fail when n_procs exceeds the host's cores
    (bench.py guards the identical call); the flag is REPORTED so the
    emitted calibration never silently compares a pinned level against
    an unpinned one."""
    pinned = False
    if pin:
        try:
            os.sched_setaffinity(0, set(range(n_procs)))
            pinned = True
        except OSError:
            pass
    try:
        with Pool(n_procs) as p:
            t0 = time.time()
            p.map(fn, range(n_procs * 2))  # 2 waves to amortize pool spin-up
            wall = time.time() - t0
        return (n_procs * 2) / wall, pinned
    finally:
        try:
            os.sched_setaffinity(0, set(range(os.cpu_count() or 32)))
        except OSError:
            pass


def main() -> int:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    out = {}
    for name, fn in (("pure_alu", _burn), ("memory_stream", _stream)):
        r_lo, pin_lo = rate(fn, n)
        r_hi, pin_hi = rate(fn, 4 * n)
        out[name] = {
            "N": n, "rate_N": round(r_lo, 2),
            "rate_4N": round(r_hi, 2),
            "efficiency": round((r_hi / r_lo) / 4, 3),
        }
        if not (pin_lo and pin_hi):  # flag only on fallback: honest evidence
            out[name]["pinned"] = {"N": pin_lo, "4N": pin_hi}
        print(f"{name}: N={r_lo:.2f}/s 4N={r_hi:.2f}/s eff={out[name]['efficiency']}",
              file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
