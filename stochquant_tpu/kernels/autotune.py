"""On-device autotuning for fused-kernel launch geometry.

The chain kernel tiles the chain batch into (block_chains, padded_sites)
grid programs; the best block size depends on N, the chain count, the RNG
path and the chip generation (r1 measured bc=64 best for the 200-site
double-well config on v5e — the bench default).  This module measures the
candidates on the actual device for the actual config and caches the
winner per process (ROADMAP perf item "chain-kernel block-size autotune").

Opt-in via ``ChainConfig.block_chains = 0`` (autotune on first use) because
each candidate costs one kernel compile — worth it for production runs of
thousands of frames, not for one-off smoke runs.
"""

from __future__ import annotations

import time

import jax
import numpy as np

__all__ = ["best_block_chains", "best_exchange_steps", "clear_cache"]

_CACHE: dict = {}

#: frames per timed call / timed calls per candidate: each timed rep pays
#: ~22 ms of fixed dispatch+readback overhead through the tunnel
#: (BASELINE.md r5 diagnosis) — a single 1-frame timing (~25 ms) made the
#: tuner pick by NOISE, not by kernel speed.  Several frames per call put
#: the overhead under ~20%, and min-of-3 is the right statistic for
#: comparing candidates under one-sided overhead noise.
_TUNE_FRAMES = 4
_TUNE_REPS = 3


def _timed(run) -> float:
    ts = []
    for _ in range(_TUNE_REPS):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    return min(ts)


def clear_cache() -> None:
    _CACHE.clear()


def _candidates(n_chains: int):
    cands = [c for c in (32, 64, 128, 256, 512) if c <= n_chains and n_chains % c == 0]
    return cands or [n_chains]


def best_block_chains(
    action,
    cfg,
    *,
    candidates=None,
    interpret: bool = False,
) -> int:
    """Measure one frame per candidate chain-block size, return the fastest.

    Results are cached per (config fingerprint, device kind) for the
    process lifetime.  Timing uses the real config (same loops/RNG — the
    quantity being tuned is the steady-state frame rate); each candidate
    pays one warm-up call for compile + one timed call.
    """
    from stochquant_tpu.integrators import langevin
    from stochquant_tpu.kernels import chain_kernel

    cands = tuple(candidates) if candidates else tuple(_candidates(cfg.n_chains))
    key = (
        cfg.action, cfg.n_sites, cfg.n_chains, cfg.loops, cfg.rng_impl,
        int(cfg.scheme), int(cfg.formulation), int(cfg.bc), interpret,
        cands,  # restricted candidate sets (tests) must not poison the
                # process-wide winner for full-candidate calls (ADVICE r3)
        jax.devices()[0].device_kind,
    )
    if key in _CACHE:
        return _CACHE[key]
    state = langevin.init_chain_state(cfg, action)
    best, best_t = None, float("inf")
    for cb in cands:
        def run():
            s, _ = chain_kernel.run_frames_pallas(
                state, action, cfg, _TUNE_FRAMES, block_chains=cb,
                interpret=interpret,
            )
            np.asarray(s.lrg_vl)  # host readback = completion barrier

        try:
            run()  # compile + warm
            t = _timed(run)
        except Exception:
            continue  # candidate fails Mosaic compile (e.g. VMEM overflow
            # at large blocks) — skip it rather than abort the run (ADVICE r3)
        if t < best_t:
            best, best_t = cb, t
    best = best if best is not None else min(cfg.n_chains, 256)  # heuristic
    _CACHE[key] = best
    return best


def best_tile_rows(
    action,
    cfg,
    *,
    candidates=None,
    interpret: bool = False,
) -> int:
    """Measure one D >= 3 frame per candidate dim-0 ``tile_rows`` and
    return the fastest (VERDICT r3 item 7 — the nd analog of
    ``best_block_chains``).  Opt-in via ``FieldConfig.tile_rows = 0``.
    Candidates default to the divisors of L0 whose extended strip is within
    2x the VMEM budget (the r4 sweep showed the budget boundary is soft);
    failing candidates (Mosaic VMEM overflow) are skipped."""
    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.kernels import field_kernel_nd as fknd

    key = (
        "T0", cfg.action, cfg.shape, cfg.n_chains, cfg.loops, cfg.rng_impl,
        int(cfg.sweep), cfg.exchange_steps, interpret,
        tuple(candidates) if candidates else None,
        jax.devices()[0].device_kind,
    )
    if key in _CACHE:
        return _CACHE[key]
    L0 = cfg.shape[0]
    if not candidates:
        slab = 1
        for n in cfg.shape[1:]:
            slab *= n
        slab *= 4
        H = fknd._halo_depth(cfg)
        candidates = [
            t for t in range(1, L0 + 1)
            if L0 % t == 0
            and (t + 2 * H) * slab <= 2 * fknd._STRIP_BUDGET_BYTES
        ]
    state = field_mod.init_field_state(cfg)
    best, best_t = None, float("inf")
    for t0 in candidates:
        try:
            def run():
                s, _ = fknd.run_field_frames_nd(
                    state, action, cfg, _TUNE_FRAMES, tile_rows=int(t0),
                    interpret=interpret,
                )
                np.asarray(s.lrg_vl)

            run()  # compile + warm
            t = _timed(run)
        except Exception:
            continue  # VMEM overflow / invalid tile — skip
        if t < best_t:
            best, best_t = int(t0), t
    best = best or fknd.default_tile_rows(cfg)
    _CACHE[key] = best
    return best


def best_exchange_steps(
    action,
    cfg,
    mesh,
    *,
    candidates=None,
    interpret: bool = False,
) -> int:
    """Measure one halo-runner frame per candidate ``exchange_steps`` (the
    wide-halo W) and return the fastest; cached per (config, mesh, device).

    Opt-in via ``FieldConfig.exchange_steps = 0`` — each candidate costs a
    kernel compile, worth it for long runs.  Candidates that violate the
    chunk kernel's geometry constraints (slab thinner than the halo, odd W)
    are skipped; if none fit, the per-dimension default is returned.

    Default candidates: (2, 4, 8, 16) for D >= 3 (slab halos there are a
    volume-fraction cost, deep halos lose); 2-D adds 32 and 64 — the halo
    is one ROW per step and gets 8-padded for DMA alignment anyway, so the
    128-lane-alignment regime wants the deeper exchanges (VERDICT r4
    weak #8: the sweep stopped at 16 there).
    """
    import dataclasses

    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.kernels import field_kernel_nd as fknd
    from stochquant_tpu.parallel import shard_field_state
    from stochquant_tpu.parallel.halo import make_halo_runner

    if candidates is None:
        candidates = (2, 4, 8, 16, 32, 64) if cfg.ndim == 2 else (2, 4, 8, 16)
    key = (
        "W", cfg.action, cfg.shape, cfg.n_chains, cfg.loops, cfg.rng_impl,
        int(cfg.sweep), cfg.mesh_axes, cfg.mesh_chain_axis,
        tuple(np.shape(mesh.devices)), interpret, tuple(candidates),
        jax.devices()[0].device_kind,
    )
    if key in _CACHE:
        return _CACHE[key]
    default = fknd.default_exchange_steps(cfg)
    state = shard_field_state(field_mod.init_field_state(cfg), mesh, cfg)
    best, best_t = None, float("inf")
    for W in candidates:
        cfg_w = dataclasses.replace(cfg, exchange_steps=int(W))
        try:
            runner = make_halo_runner(
                action, cfg_w, mesh, backend="pallas_pair", interpret=interpret
            )

            def run():
                out, _ = runner(state, _TUNE_FRAMES)
                np.asarray(out.lrg_vl)

            run()  # compile + warm
            t = _timed(run)
        except Exception:
            continue  # geometry constraint (thin slab etc.) or a candidate
            # that fails Mosaic compile — skip
        if t < best_t:
            best, best_t = int(W), t
    best = best or default
    _CACHE[key] = best
    return best
