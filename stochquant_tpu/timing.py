"""Shared wall-clock measurement helpers for the bench/experiment tools.

One copy of the paired-timing harness the perf methodology hinges on
(r5 review: bench.py and tools/perf_experiments.py carried line-for-line
duplicates — a divergence here silently makes the two tools' numbers
incomparable).

Environment note (BASELINE.md r5 diagnosis): every timed rep through the
TPU tunnel carries ~22 ms of fixed dispatch+readback overhead — size the
work per rep so that overhead is <10%, or the measurement tracks tunnel
jitter instead of the kernel.
"""

from __future__ import annotations

import time

__all__ = ["timeit", "ab_timeit"]


def timeit(run, reps=5):
    """Median of ``reps`` timed calls (after one warm/compile call), plus
    the (min, max) spread — no min-of-N headline numbers; the tunnel's
    readback variance is reported, not hidden."""
    run()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0], ts[-1]


def ab_timeit(runs, reps=5):
    """Paired A/B timing in ONE process: warm every variant once, then
    round-robin the timed reps so machine drift hits all variants equally.
    Returns {name: (median, min, max)}."""
    for r in runs.values():
        r()
    ts = {k: [] for k in runs}
    for _ in range(reps):
        for k, r in runs.items():
            t0 = time.time()
            r()
            ts[k].append(time.time() - t0)
    out = {}
    for k, v in ts.items():
        v.sort()
        out[k] = (v[len(v) // 2], v[0], v[-1])
    return out
