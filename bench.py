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
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from stochquant_tpu import actions, oracle  # noqa: E402
from stochquant_tpu.config import ChainConfig  # noqa: E402
from stochquant_tpu.integrators import langevin  # noqa: E402
from stochquant_tpu.kernels import chain_kernel  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    log(f"devices: {jax.devices()}")

    # Reference-derived workload (SURVEY.md §6): double well, N=200 sites,
    # loops=1000; Δτ pinned at the stability-adapted value the reference's
    # controller converges to (its preset 0.002 is unstable at Δt=0.02 and
    # gets walked down ×0.95 per rejected frame).
    n_chains = 65536 if on_tpu else 512
    block = 64 if on_tpu else 32
    cfg = ChainConfig(
        action="double_well",
        n_sites=200,
        dt=0.02,
        dtau=2e-4,
        n_chains=n_chains,
        loops=1000,
        seed=2026,
        grow_after=10**9,
    )
    act = actions.get(cfg.action)
    state = langevin.init_chain_state(cfg, act)

    t0 = time.time()
    state, _ = chain_kernel.run_frames_pallas(
        state, act, cfg, 1, block_chains=block, interpret=not on_tpu
    )
    jax.block_until_ready(state)
    log(f"warmup (compile + 1 frame): {time.time() - t0:.1f}s")

    n_frames = 3 if on_tpu else 1
    t0 = time.time()
    state, metrics = chain_kernel.run_frames_pallas(
        state, act, cfg, n_frames, block_chains=block, interpret=not on_tpu
    )
    jax.block_until_ready(state)
    elapsed = time.time() - t0
    updates = cfg.n_chains * cfg.n_sites * cfg.loops * n_frames
    mlups = updates / elapsed / 1e6
    stable = float(metrics["stable"].mean())
    log(f"{updates:.3g} site-updates in {elapsed:.3f}s -> {mlups:.0f} MLUPS "
        f"(stable fraction {stable:.3f})")

    # Reference baseline: the exact reference algorithm on this host's CPU.
    t0 = time.time()
    ref = oracle.run_reference(200, 0.02, 2e-4, frames=5, loops=1000, seed=7)
    ref_mlups = ref.updates_per_sec / 1e6
    log(f"oracle baseline: {ref_mlups:.1f} MLUPS (serial CPU, {time.time()-t0:.1f}s)")

    print(json.dumps({
        "metric": "double_well_site_updates_per_sec_per_chip",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / ref_mlups, 2),
    }))


if __name__ == "__main__":
    main()
