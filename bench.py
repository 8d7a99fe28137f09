#!/usr/bin/env python
"""Headline benchmark: lattice site-updates/sec/chip (MLUPS) on the
reference's default double-well workload (taumain.py:101-123: N=200 sites,
1000 micro-steps per frame), scaled to a TPU-sized chain ensemble and run
through the fused Pallas kernel.

Prints ONE JSON line:
  {"metric": ..., "value": MLUPS, "unit": "MLUPS", "vs_baseline": x}

vs_baseline divides by the measured throughput of the C++ reference oracle
(the exact reference algorithm, cc/oracle.cpp) on this host's CPU — the
reference publishes no numbers and its OpenCL build cannot run here
(BASELINE.md).  All diagnostics go to stderr.

Robustness notes for this environment:
- the TPU is reached through a tunnel whose remote-compile service can wedge
  indefinitely → the measurement runs in a watchdogged subprocess with
  retries;
- ``block_until_ready`` does not reliably synchronize through the tunnel →
  every timed call is followed by a host readback of a kernel output, and
  the median over chained repetitions is reported.
"""

import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def worker() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import numpy as np

    from stochquant_tpu import actions, oracle
    from stochquant_tpu.config import ChainConfig
    from stochquant_tpu.integrators import langevin
    from stochquant_tpu.kernels import chain_kernel

    on_tpu = jax.devices()[0].platform != "cpu"
    log(f"devices: {jax.devices()}")

    # Reference-derived workload (SURVEY.md §6): double well, N=200 sites,
    # loops=1000; Δτ pinned at the stability-adapted value the reference's
    # controller converges to (its preset 0.002 is unstable at Δt=0.02).
    n_chains = 65536 if on_tpu else 512
    block = 64 if on_tpu else 32
    n_frames = 3
    reps = 4 if on_tpu else 1
    # rng_impl="hardware": pltpu.prng_random_bits in-kernel (deterministic
    # for this fixed seed + chain blocking) — measured 1.44x the Threefry
    # path on v5e (r1: 17.1 vs 11.9 GLUPS).  The layout-invariant Threefry
    # path remains the framework default; this benchmark reports the fast
    # configuration, as a production throughput run would use it.
    cfg = ChainConfig(
        action="double_well",
        n_sites=200,
        dt=0.02,
        dtau=2e-4,
        n_chains=n_chains,
        loops=1000,
        seed=2026,
        grow_after=10**9,
        rng_impl="hardware" if on_tpu else "threefry",
    )
    act = actions.get(cfg.action)
    state = langevin.init_chain_state(cfg, act)

    t0 = time.time()
    state, _ = chain_kernel.run_frames_pallas(
        state, act, cfg, n_frames, block_chains=block, interpret=not on_tpu
    )
    np.asarray(state.lrg_vl)  # force completion through the tunnel
    log(f"warmup (compile + {n_frames} frames): {time.time() - t0:.1f}s")

    times = []
    for rep in range(reps):
        t0 = time.time()
        state, metrics = chain_kernel.run_frames_pallas(
            state, act, cfg, n_frames, block_chains=block, interpret=not on_tpu
        )
        np.asarray(state.lrg_vl)  # host readback = real completion barrier
        times.append(time.time() - t0)
        log(f"rep {rep}: {times[-1]:.3f}s")
    times.sort()
    elapsed = times[len(times) // 2]
    updates = cfg.n_chains * cfg.n_sites * cfg.loops * n_frames
    mlups = updates / elapsed / 1e6
    stable = float(np.asarray(metrics["stable"]).mean())
    log(f"{updates:.3g} site-updates in {elapsed:.3f}s (median of {reps}) "
        f"-> {mlups:.0f} MLUPS (stable fraction {stable:.3f})")

    ref = oracle.run_reference(200, 0.02, 2e-4, frames=5, loops=1000, seed=7)
    ref_mlups = ref.updates_per_sec / 1e6
    log(f"oracle baseline: {ref_mlups:.1f} MLUPS (serial CPU)")

    print(json.dumps({
        "metric": "double_well_site_updates_per_sec_per_chip",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / ref_mlups, 2),
    }))


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    attempts = 3
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                stdout=subprocess.PIPE,
                timeout=420,
            )
            lines = [l for l in out.stdout.decode().splitlines() if l.strip()]
            if out.returncode == 0 and lines:
                print(lines[-1])
                return
            log(f"attempt {attempt}: worker exit {out.returncode}")
        except subprocess.TimeoutExpired:
            log(f"attempt {attempt}: worker timed out (TPU tunnel wedged?)")
        time.sleep(90)
    log("all attempts failed")
    print(json.dumps({
        "metric": "double_well_site_updates_per_sec_per_chip",
        "value": 0.0,
        "unit": "MLUPS",
        "vs_baseline": 0.0,
        "error": "benchmark worker failed (TPU tunnel unavailable)",
    }))


if __name__ == "__main__":
    main()
