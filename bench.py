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
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# timing helpers shared with tools/perf_experiments.py (r5 review:
# these were duplicated line-for-line; one copy now lives in
# stochquant_tpu/timing.py)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from stochquant_tpu.timing import ab_timeit, timeit  # noqa: E402,F401


#: headline keys compared against the previous round's BENCH json: a >15%
#: drop makes the bench FAIL LOUDLY (stderr banner + "regressions" in the
#: JSON; the record is still printed so the driver never loses the data)
_REGRESSION_KEYS = (
    "value", "threefry_mlups", "config2_anharmonic_mlups",
    "field_runtime_pallas_mlups", "u1_gauge_kernel_mlups",
    "su2_gauge_kernel_mlups", "su3_gauge_kernel_mlups", "nd4d_kernel_mlups",
    "halo_pallas_pair_mlups", "config2_multiframe_k8_mlups",
)


def check_regressions(result: dict, prev_path: str | None = None) -> dict:
    """Compare ``result`` against the newest BENCH_r*.json next to this file
    (or ``prev_path`` when given, for tests).

    Driver-written BENCH files nest the metrics under ``"parsed"`` (the
    top level holds run metadata: n / cmd / rc / tail) — VERDICT r4 weak #1:
    reading the top level made this gate dead code for two rounds.  Locally
    written files are the bare metric dict; both layouts are accepted.
    """
    import glob
    import re

    if prev_path is None:
        here = os.path.dirname(os.path.abspath(__file__))
        prev = sorted(
            glob.glob(os.path.join(here, "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        )
        if not prev:
            return {}
        prev_path = prev[-1]
    try:
        with open(prev_path) as f:
            old = json.load(f)
    except Exception as e:  # noqa: BLE001
        log(f"regression gate: cannot read {prev_path}: {e}")
        return {}
    if isinstance(old.get("parsed"), dict):
        old = old["parsed"]
    regressions = {}
    for k in _REGRESSION_KEYS:
        a, b = old.get(k), result.get(k)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a > 0:
            if b < 0.85 * a:
                regressions[k] = {"prev": a, "now": b,
                                  "ratio": round(b / a, 3)}
    if regressions:
        log("=" * 60)
        log(f"PERF REGRESSION vs {os.path.basename(prev_path)} (>15% drop):")
        for k, v in regressions.items():
            log(f"  {k}: {v['prev']} -> {v['now']} ({v['ratio']}x)")
        log("=" * 60)
    return regressions


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

    from dataclasses import replace as dataclasses_replace

    on_tpu = jax.devices()[0].platform != "cpu"
    log(f"devices: {jax.devices()}")

    def time_chain(cfg, act, n_frames, reps, block):
        state = langevin.init_chain_state(cfg, act)
        t0 = time.time()
        state, _ = chain_kernel.run_frames_pallas(
            state, act, cfg, n_frames, block_chains=block, interpret=not on_tpu
        )
        np.asarray(state.lrg_vl)  # force completion through the tunnel
        log(f"  warmup (compile + {n_frames} frames): {time.time() - t0:.1f}s")
        times = []
        for rep in range(reps):
            t0 = time.time()
            state, metrics = chain_kernel.run_frames_pallas(
                state, act, cfg, n_frames, block_chains=block, interpret=not on_tpu
            )
            np.asarray(state.lrg_vl)  # host readback = real completion barrier
            times.append(time.time() - t0)
            log(f"  rep {rep}: {times[-1]:.3f}s")
        times.sort()
        elapsed = times[len(times) // 2]
        updates = cfg.n_chains * cfg.n_sites * cfg.loops * n_frames
        stable = float(np.asarray(metrics["stable"]).mean())
        log(f"  {updates:.3g} updates in {elapsed:.3f}s (median of {reps}) -> "
            f"{updates / elapsed / 1e6:.0f} MLUPS (stable {stable:.3f})")
        return updates / elapsed / 1e6, stable

    # Reference-derived workload (SURVEY.md §6): double well, N=200 sites,
    # loops=1000; Δτ pinned at the stability-adapted value the reference's
    # controller converges to (its preset 0.002 is unstable at Δt=0.02).
    n_chains = 65536 if on_tpu else 512
    # r3 on-device sweep at this config: hardware-PRNG peaks at block 512
    # (24.3 vs 20.8 GLUPS at the r1-era 64; 1024 overflows VMEM), Threefry
    # at 128 (14.5 vs 13.6) — the optimum moved as the kernel evolved;
    # ChainConfig.block_chains=0 autotunes this per config at runtime
    block = 512 if on_tpu else 32
    block_tf = 128 if on_tpu else 32
    n_frames = 3
    base = dict(
        action="double_well", n_sites=200, dt=0.02, dtau=2e-4,
        n_chains=n_chains, loops=1000, seed=2026, grow_after=10**9,
    )
    act = actions.get("double_well")
    # rng_impl="hardware": pltpu.prng_random_bits in-kernel (deterministic
    # for this fixed seed + chain blocking) — measured 1.44x the Threefry
    # path on v5e.  The layout-invariant Threefry path is the framework
    # default; BOTH are reported (VERDICT r1 weak item 3).
    log("chain bench, hardware PRNG path:")
    mlups, stable = time_chain(
        ChainConfig(**base, rng_impl="hardware" if on_tpu else "threefry"),
        act, n_frames, 4 if on_tpu else 1, block,
    )
    log("chain bench, Threefry (layout-invariant default) path:")
    mlups_tf, _ = time_chain(
        ChainConfig(**base, rng_impl="threefry"), act, n_frames,
        2 if on_tpu else 1, block_tf,
    )
    # threefry13 (r3): Random123's reduced-round BigCrush-passing minimum —
    # same counter keying/layout invariance, ~35% fewer key-schedule ops
    log("chain bench, Threefry-13 (reduced-round, layout-invariant) path:")
    mlups_tf13, _ = time_chain(
        ChainConfig(**base, rng_impl="threefry13"), act, n_frames,
        2 if on_tpu else 1, block_tf,
    )

    # --- BASELINE config 2 at its stated scale (BASELINE.json:8): anharmonic
    # λφ⁴ chain, N=1024, 256 batched chains; physics gated in
    # tests/test_physics_regression.py against the transfer-matrix oracle.
    from stochquant_tpu.config import BoundaryCondition, Formulation

    log("config-2 bench (anharmonic λφ⁴, N=1024, 256 chains):")
    c2 = ChainConfig(
        action="anharmonic", n_sites=1024, dt=0.25, dtau=0.01, n_chains=256,
        loops=1000, seed=14, bc=BoundaryCondition.PERIODIC,
        formulation=Formulation.DIRECT, grow_after=10**9,
        rng_impl="hardware" if on_tpu else "threefry",
    )
    # r5: 16 frames/rep — at 3 frames the ~22ms dispatch overhead was ~25%
    # of each config-2 rep (BASELINE.md r5 diagnosis)
    mlups_c2, _ = time_chain(
        c2, actions.get("anharmonic"), 16 if on_tpu else n_frames,
        2 if on_tpu else 1,
        256 if on_tpu else 32,  # r3 sweep: 256 > 128 > 64 at this config
    )

    # --- on-TPU kernel ≡ XLA gate (VERDICT r1 item 3): the Mosaic-compiled
    # Threefry kernels must reproduce the XLA scan on the real chip, not just
    # in CPU interpret mode.
    gate_cfg = ChainConfig(
        action="double_well", n_sites=200, dt=0.02, dtau=2e-4,
        n_chains=256, loops=100, seed=11, grow_after=10**9,
    )
    s0 = langevin.init_chain_state(gate_cfg, act)
    a, _ = langevin.run_frames(s0, act, gate_cfg, 2)
    b, _ = chain_kernel.run_frames_pallas(s0, act, gate_cfg, 2, interpret=not on_tpu)
    chain_gate = max(
        float(np.max(np.abs(np.asarray(a.f) - np.asarray(b.f)))),
        float(np.max(np.abs(np.asarray(a.x_mean) - np.asarray(b.x_mean)))),
    )
    log(f"chain kernel-vs-XLA max|diff| on this device: {chain_gate:.2e}")

    from stochquant_tpu import metrics as metrics_mod
    from stochquant_tpu import runtime
    from stochquant_tpu.actions import phi4 as phi4_mod
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.kernels import field_kernel

    fgate_cfg = FieldConfig(action="phi4", shape=(128, 128), n_chains=4,
                            loops=20, seed=12)
    fact = phi4_mod.get_field(fgate_cfg.action)
    fs0 = field_mod.init_field_state(fgate_cfg)
    fa, _ = field_mod.run_field_frames(fs0, fact, fgate_cfg, 2)
    fb, _ = field_kernel.run_field_frames_pallas(
        fs0, fact, fgate_cfg, 2, interpret=not on_tpu
    )
    field_gate = max(
        float(np.max(np.abs(np.asarray(fa.phi) - np.asarray(fb.phi)))),
        float(np.max(np.abs(np.asarray(fa.phi2_mean) - np.asarray(fb.phi2_mean)))),
    )
    log(f"field kernel-vs-XLA max|diff| on this device: {field_gate:.2e}")
    kernel_equals_xla = chain_gate <= 2e-6 and field_gate <= 2e-6

    # --- field MLUPS through the PRODUCT path (runtime.run_field, the fused
    # whole-lattice kernel — VERDICT r1 item 1: BENCH reports the runtime
    # path, not an ad-hoc kernel call).
    # fps=frames: one jitted superframe scan + one metrics readback, the
    # configuration a production throughput run uses (fps=1 would pay a
    # ~100ms tunnel readback per frame and measure the link, not the chip).
    # frames=40 (r5, VERDICT r4 weak #5): a run_field call carries ~0.4s of
    # fixed overhead (state init + tunnel dispatch + readback) — at the old
    # 10-frame size that overhead DOMINATED the 0.45s measurement, which is
    # what the r3→r4 "-26%" was: overhead jitter, not kernel speed
    # (r5 on-device diagnosis: marginal rate ~10 GLUPS, so 30 extra frames
    # cost only ~0.2s).  40 frames puts ~70% of each rep in actual compute.
    fcfg = FieldConfig(
        action="phi4", shape=(256, 256), n_chains=16 if on_tpu else 2,
        loops=100 if on_tpu else 4, frames=40 if on_tpu else 2, seed=13,
        fps=40 if on_tpu else 2, grow_after=10**9,
    )
    fb = "pallas" if on_tpu else "xla"
    null_sink = lambda: metrics_mod.MetricsSink(stream=open(os.devnull, "w"))
    f_updates = fcfg.n_chains * 256 * 256 * fcfg.loops * fcfg.frames
    fmf = dataclasses_replace(fcfg, frames_per_launch=10)
    field_runs = {
        "single": lambda: runtime.run_field(fcfg, backend=fb, sink=null_sink()),
        "multiframe": lambda: runtime.run_field(fmf, backend=fb, sink=null_sink()),
    }
    if on_tpu:
        fhw = dataclasses_replace(fcfg, rng_impl="hardware")
        field_runs["hw"] = lambda: runtime.run_field(
            fhw, backend="pallas", sink=null_sink()
        )
    # paired A/B in one process, median of 5 (VERDICT r3 item 4) — the
    # multiframe-vs-single comparison is interleaved so drift cancels
    f_t = ab_timeit(field_runs, reps=5 if on_tpu else 1)
    field_mlups = f_updates / f_t["single"][0] / 1e6
    field_mf_mlups = f_updates / f_t["multiframe"][0] / 1e6
    field_hw_mlups = f_updates / f_t["hw"][0] / 1e6 if on_tpu else 0.0
    field_spreads = {
        k: [round(f_updates / hi / 1e6, 1), round(f_updates / lo / 1e6, 1)]
        for k, (med, lo, hi) in f_t.items()
    }
    log(f"field product path (256^2 x {fcfg.n_chains} chains): "
        f"single {field_mlups:.0f} / multiframe {field_mf_mlups:.0f} / "
        f"hw {field_hw_mlups:.0f} MLUPS (paired medians of 5; "
        f"spreads {field_spreads})")

    # --- U(1) gauge fast path: fused link-update kernel (VERDICT r1 item 7)
    from stochquant_tpu.integrators import gauge as gauge_mod
    from stochquant_tpu.integrators.gauge import GaugeConfig
    from stochquant_tpu.kernels import gauge_kernel

    ggate = GaugeConfig(group="u1", beta=1.0, shape=(16, 128), n_chains=4,
                        dtau=5e-3, loops=10, seed=17, grow_after=10**9)
    gact = gauge_mod.resolve_gauge_action(ggate)
    gs0 = gauge_mod.init_gauge_state(ggate, gact)
    ga, _ = gauge_mod.run_gauge_frames(gs0, gact, ggate, 2)
    gb, _ = gauge_kernel.run_gauge_frames_pallas(gs0, gact, ggate, 2,
                                                 interpret=not on_tpu)
    gauge_gate = float(np.max(np.abs(np.asarray(ga.links) - np.asarray(gb.links))))
    log(f"gauge kernel-vs-XLA max|diff| on this device: {gauge_gate:.2e}")

    gcfg = GaugeConfig(group="u1", beta=1.0, shape=(256, 256),
                       n_chains=32 if on_tpu else 2, dtau=5e-3,
                       loops=100 if on_tpu else 4, seed=15, grow_after=10**9)
    gact = gauge_mod.resolve_gauge_action(gcfg)
    gstate = gauge_mod.init_gauge_state(gcfg, gact)
    # r5: 10 kernel frames/rep so the ~22ms fixed dispatch overhead is
    # <10% of each measurement (see gauge_ab's docstring)
    g_frames = 10 if on_tpu else 1
    g_reps = 5 if on_tpu else 1

    def gauge_ab(cfg_, act_, state_, frames, frames_x=None):
        """Paired kernel-vs-XLA timing for one gauge config.

        frames_x lets the slow XLA arm run fewer frames than the kernel arm
        (r5): each rep pays ~22ms of fixed dispatch+readback overhead
        through the tunnel (measured by a chains/shape sweep: work scaled
        7x, time scaled 1.7x), so the kernel arm needs enough frames that
        the overhead stops dominating — while su3's XLA arm at 1.4 MLUPS
        cannot afford them.  Per-arm medians are still interleave-paired."""
        frames_x = frames_x or frames
        per_frame = cfg_.n_chains * 2 * int(np.prod(cfg_.shape)) * cfg_.loops

        def k_run():
            s, _ = gauge_kernel.run_gauge_frames_pallas(
                state_, act_, cfg_, frames, interpret=not on_tpu
            )
            np.asarray(s.drift_max)

        def x_run():
            s, _ = gauge_mod.run_gauge_frames(state_, act_, cfg_, frames_x)
            np.asarray(s.drift_max)

        t = ab_timeit({"kernel": k_run, "xla": x_run}, reps=g_reps)
        return (
            per_frame * frames / t["kernel"][0] / 1e6,
            per_frame * frames_x / t["xla"][0] / 1e6,
        )

    glups_k, glups_x = gauge_ab(gcfg, gact, gstate, g_frames)
    log(f"u1 gauge link-updates/s: kernel {glups_k:.0f} vs XLA {glups_x:.0f} MLUPS")

    # SU(2): quaternion links, same kernel shape (VERDICT r1 item 7 follow-on)
    g2gate = GaugeConfig(group="su2", beta=2.0, shape=(16, 128), n_chains=4,
                         dtau=2e-3, loops=10, seed=18, grow_after=10**9)
    g2act = gauge_mod.resolve_gauge_action(g2gate)
    g2s0 = gauge_mod.init_gauge_state(g2gate, g2act)
    g2a, _ = gauge_mod.run_gauge_frames(g2s0, g2act, g2gate, 2)
    g2b, _ = gauge_kernel.run_gauge_frames_pallas(g2s0, g2act, g2gate, 2,
                                                  interpret=not on_tpu)
    su2_gate = float(np.max(np.abs(np.asarray(g2a.links) - np.asarray(g2b.links))))
    log(f"su2 kernel-vs-XLA max|diff| on this device: {su2_gate:.2e}")

    g2cfg = GaugeConfig(group="su2", beta=2.0, shape=(128, 128),
                        n_chains=16 if on_tpu else 2, dtau=2e-3,
                        loops=100 if on_tpu else 4, seed=19, grow_after=10**9)
    g2act = gauge_mod.resolve_gauge_action(g2cfg)
    g2state = gauge_mod.init_gauge_state(g2cfg, g2act)
    glups2_k, glups2_x = gauge_ab(g2cfg, g2act, g2state, g_frames)
    log(f"su2 gauge link-updates/s: kernel {glups2_k:.0f} vs XLA {glups2_x:.0f} MLUPS")

    # --- SU(3) fused gauge kernel (VERDICT r2 item 2): matrix links as split
    # re/im planes, Cayley–Hamilton exponential in-kernel.
    g3gate = GaugeConfig(group="su3", beta=5.0, shape=(8, 128), n_chains=2,
                         dtau=1e-3, loops=10, seed=23, grow_after=10**9)
    g3act = gauge_mod.resolve_gauge_action(g3gate)
    g3s0 = gauge_mod.init_gauge_state(g3gate, g3act)
    g3a, _ = gauge_mod.run_gauge_frames(g3s0, g3act, g3gate, 2)
    g3b, _ = gauge_kernel.run_gauge_frames_pallas(g3s0, g3act, g3gate, 2,
                                                  interpret=not on_tpu)
    # links are complex64 and the tunnel backend lacks complex d2h — reduce
    # the diff to a real scalar on device (io/checkpoint._leaf_to_host's
    # constraint)
    import jax.numpy as jnp

    su3_gate = float(
        jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(g3a.links, g3b.links)
    )
    log(f"su3 kernel-vs-XLA max|dlinks| on this device: {su3_gate:.2e}")

    g3cfg = GaugeConfig(group="su3", beta=5.0, shape=(64, 64),
                        n_chains=8 if on_tpu else 2, dtau=1e-3,
                        loops=50 if on_tpu else 4, seed=19, grow_after=10**9)
    g3act = gauge_mod.resolve_gauge_action(g3cfg)
    g3state = gauge_mod.init_gauge_state(g3cfg, g3act)
    glups3_k, glups3_x = gauge_ab(
        g3cfg, g3act, g3state, 24 if on_tpu else 2,
        frames_x=2,  # XLA su3 runs at ~1.4 MLUPS; 2 frames is already ~5s/rep
    )
    log(f"su3 gauge link-updates/s: kernel {glups3_k:.0f} vs XLA {glups3_x:.0f} MLUPS")

    # --- gauge chunk runner vs the XLA gauge halo runner on the 1-way ring
    # (r5, VERDICT r4 item 3): the fused sharded-gauge composition — one
    # launch per W micro-steps on the halo-extended block; u1 links must
    # come back BITWISE equal to the XLA halo runner's on device.
    from stochquant_tpu.parallel import make_mesh as _mk_mesh, shard_gauge_state
    from stochquant_tpu.parallel.gauge_halo import (
        make_gauge_chunk_runner,
        make_gauge_halo_runner,
    )

    ghcfg = GaugeConfig(group="u1", beta=1.0, shape=(256, 256),
                        n_chains=32 if on_tpu else 2, dtau=5e-3,
                        loops=100 if on_tpu else 4, seed=15,
                        grow_after=10**9, mesh_axes=("x", None))
    ghact = gauge_mod.resolve_gauge_action(ghcfg)
    ghmesh = _mk_mesh([("x", 1)])
    gh0 = shard_gauge_state(
        gauge_mod.init_gauge_state(ghcfg, ghact), ghact, ghmesh, ghcfg
    )
    gh_runners = {
        "chunk": make_gauge_chunk_runner(ghact, ghcfg, ghmesh,
                                         interpret=not on_tpu),
        "xla": make_gauge_halo_runner(ghact, ghcfg, ghmesh,
                                      interpret=not on_tpu),
    }
    gh_frames = 5 if on_tpu else 1
    gh_ups = (
        ghcfg.n_chains * 2 * 256 * 256 * ghcfg.loops * gh_frames
    )
    gh_out = {}

    def gh_run(name):
        def run():
            s, _ = gh_runners[name](gh0, gh_frames)
            np.asarray(s.drift_max)
            gh_out[name] = s

        return run

    gh_t = ab_timeit({k: gh_run(k) for k in gh_runners},
                     reps=3 if on_tpu else 1)
    gauge_chunk_mlups = gh_ups / gh_t["chunk"][0] / 1e6
    gauge_chunk_xla_mlups = gh_ups / gh_t["xla"][0] / 1e6
    gauge_chunk_gate = float(
        np.max(np.abs(np.asarray(gh_out["chunk"].links)
                      - np.asarray(gh_out["xla"].links)))
    )
    log(f"gauge halo composition (u1): chunk {gauge_chunk_mlups:.0f} vs "
        f"xla {gauge_chunk_xla_mlups:.0f} MLUPS, links gate "
        f"{gauge_chunk_gate:.2e}")

    # --- gauge multi-frame launches at 256 chains (VERDICT r3 item 3): the
    # in-kernel accept/reject + Δτ epilogue now covers every fused group;
    # K=8 vs K=1 paired per group at the launch-bound scale (small lattice,
    # many chains).  Requires the r4 (1, C)-SMEM layout — the (C, 1)
    # scalar blocks exhausted SMEM at 256 chains.
    gauge_mf = {}
    for grp, beta_, dtau_, shape_ in (
        ("u1", 1.0, 5e-3, (16, 128)),
        ("su2", 2.0, 2e-3, (16, 128)),
        ("su3", 5.0, 1e-3, (8, 128)),
    ):
        mcfg = GaugeConfig(group=grp, beta=beta_, shape=shape_,
                           n_chains=256 if on_tpu else 8, dtau=dtau_,
                           loops=10, seed=29, grow_after=10**9)
        mact = gauge_mod.resolve_gauge_action(mcfg)
        mstate = gauge_mod.init_gauge_state(mcfg, mact)
        # r5: 24 frames/rep (K=8 → 3 launches) so the ~22ms dispatch
        # overhead stops eating ~50% of each rep at these small lattices
        m_frames = 24 if on_tpu else 8

        def mk(k):
            def run():
                s, _ = gauge_kernel.run_gauge_frames_pallas(
                    mstate, mact, mcfg, m_frames, interpret=not on_tpu,
                    frames_per_launch=k,
                )
                np.asarray(s.drift_max)

            return run

        m_ups = (
            mcfg.n_chains * 2 * int(np.prod(shape_)) * mcfg.loops * m_frames
        )
        t = ab_timeit({"k1": mk(1), "k8": mk(8 if on_tpu else 2)},
                      reps=g_reps)
        gauge_mf[f"{grp}_single_mlups"] = round(m_ups / t["k1"][0] / 1e6, 1)
        gauge_mf[f"{grp}_multiframe_mlups"] = round(m_ups / t["k8"][0] / 1e6, 1)
        log(f"{grp} multiframe @256 chains: K=8 "
            f"{gauge_mf[f'{grp}_multiframe_mlups']:.0f} vs K=1 "
            f"{gauge_mf[f'{grp}_single_mlups']:.0f} MLUPS")

    # --- D-dim tiled kernel (VERDICT r2 item 3): config 4's 32^4 fused path.
    from stochquant_tpu.kernels import field_kernel_nd

    nd_gate_cfg = FieldConfig(action="phi4", shape=(8, 8, 4, 128), n_chains=2,
                              loops=10, seed=12, grow_after=10**9)
    nds0 = field_mod.init_field_state(nd_gate_cfg)
    nda, _ = field_mod.run_field_frames(nds0, fact, nd_gate_cfg, 2)
    ndb, _ = field_kernel_nd.run_field_frames_nd(
        nds0, fact, nd_gate_cfg, 2, interpret=not on_tpu
    )
    nd_gate = float(np.max(np.abs(np.asarray(nda.phi) - np.asarray(ndb.phi))))
    log(f"nd kernel-vs-XLA max|dphi| on this device: {nd_gate:.2e}")

    nd_cfg = FieldConfig(
        action="phi4", shape=(32, 32, 32, 32) if on_tpu else (8, 8, 4, 4),
        n_chains=1, loops=20 if on_tpu else 4, seed=9, grow_after=10**9,
    )
    nd_state = field_mod.init_field_state(nd_cfg)
    nd_vol = int(np.prod(nd_cfg.shape))
    # r5: 8 frames/rep so the ~22ms fixed dispatch overhead (BASELINE.md r5
    # diagnosis) is a few % of each rep instead of ~45% of the r4 one
    nd_frames = 8 if on_tpu else 2
    nd_ups = nd_cfg.n_chains * nd_vol * nd_cfg.loops * nd_frames
    # r4: the unsharded W-step chunk variant (exchange_steps > 2) — one
    # launch per W micro-steps with trapezoidal dim-0 halo recompute
    nd_chunk_cfg = dataclasses_replace(
        nd_cfg, exchange_steps=4 if on_tpu else 4
    )

    def nd_run(cfg_, tile=None):
        def run():
            s, _ = field_kernel_nd.run_field_frames_nd(
                nd_state, fact, cfg_, nd_frames, tile_rows=tile,
                interpret=not on_tpu,
            )
            np.asarray(s.lrg_vl)

        return run

    def nd_x_run():
        s, _ = field_mod.run_field_frames(nd_state, fact, nd_cfg, nd_frames)
        np.asarray(s.lrg_vl)

    nd_t = ab_timeit(
        {
            "pair": nd_run(nd_cfg),
            "chunk": nd_run(nd_chunk_cfg, tile=4 if on_tpu else None),
            "xla": nd_x_run,
        },
        reps=g_reps,
    )
    nd_k = nd_ups / nd_t["pair"][0] / 1e6
    nd_chunk = nd_ups / nd_t["chunk"][0] / 1e6
    nd_x = nd_ups / nd_t["xla"][0] / 1e6
    log(f"32^4 site-updates/s: pair {nd_k:.0f} / chunk(W=4) {nd_chunk:.0f} "
        f"/ XLA {nd_x:.0f} MLUPS")

    # --- fused kernels × shard_map decomposition (VERDICT r2 item 1): on
    # the single chip, a 1-device mesh exercises both composition paths —
    # the whole-frame kernel per shard (chain-DP) and the per-micro-step
    # bulk kernel + halo fixup (forced).
    from stochquant_tpu.parallel import make_mesh, shard_field_state
    from stochquant_tpu.parallel.halo import make_halo_runner
    import dataclasses as _dc2

    hcfg = _dc2.replace(
        fcfg, mesh_axes=("x", None), frames=1,
        loops=50 if on_tpu else 4,
        n_chains=16 if on_tpu else 2,
        shape=(256, 256) if on_tpu else (16, 128),
    )
    hmesh = make_mesh([("x", 1)])
    hs0 = field_mod.init_field_state(hcfg)
    hs0_sh = shard_field_state(hs0, hmesh, hcfg)
    h_frames = 20 if on_tpu else 2  # r5: amortize the ~22ms dispatch overhead
    h_updates = hcfg.n_chains * int(np.prod(hcfg.shape)) * hcfg.loops * h_frames

    hb = "pallas" if on_tpu else "xla"
    halo_runners = {
        "frame": make_halo_runner(fact, hcfg, hmesh, backend=hb,
                                  interpret=not on_tpu),
        "step": make_halo_runner(fact, hcfg, hmesh, backend="pallas_step",
                                 interpret=not on_tpu),
        # r3: the chunk kernel (wide halo, W=8 per exchange) forced on the
        # 1-way ring — the communication-avoiding alternative; r4 adds the
        # in-kernel remote-DMA variant (no host-visible collective at all)
        "pair": make_halo_runner(fact, hcfg, hmesh, backend="pallas_pair",
                                 interpret=not on_tpu),
        "rdma": make_halo_runner(fact, hcfg, hmesh, backend="pallas_rdma",
                                 interpret=not on_tpu),
        "xla": make_halo_runner(fact, hcfg, hmesh, backend="xla"),
    }
    halo_out = {}

    def h_run(name):
        def run():
            out, _ = halo_runners[name](hs0_sh, h_frames)
            np.asarray(out.lrg_vl)
            halo_out[name] = out

        return run

    h_t = ab_timeit({k: h_run(k) for k in halo_runners}, reps=g_reps)
    halo_frame_mlups = h_updates / h_t["frame"][0] / 1e6
    halo_step_mlups = h_updates / h_t["step"][0] / 1e6
    halo_pair_mlups = h_updates / h_t["pair"][0] / 1e6
    halo_rdma_mlups = h_updates / h_t["rdma"][0] / 1e6
    halo_xla_mlups = h_updates / h_t["xla"][0] / 1e6
    halo_gate = float(
        np.max(np.abs(np.asarray(halo_out["step"].phi)
                      - np.asarray(halo_out["xla"].phi)))
    )
    halo_pair_gate = float(
        np.max(np.abs(np.asarray(halo_out["pair"].phi)
                      - np.asarray(halo_out["xla"].phi)))
    )
    halo_rdma_gate = float(
        np.max(np.abs(np.asarray(halo_out["rdma"].phi)
                      - np.asarray(halo_out["xla"].phi)))
    )
    log(f"halo composition: frame {halo_frame_mlups:.0f} / step "
        f"{halo_step_mlups:.0f} / pair {halo_pair_mlups:.0f} / rdma "
        f"{halo_rdma_mlups:.0f} / xla {halo_xla_mlups:.0f} MLUPS, "
        f"step-vs-xla gate {halo_gate:.2e}, pair {halo_pair_gate:.2e}, "
        f"rdma {halo_rdma_gate:.2e}")

    # --- multi-frame chain kernel (VERDICT r2 item 7): config-2 chain count,
    # epilogue in-kernel, K=8 frames per launch.  Paired K=1/K=8 medians
    # (r5, VERDICT r4 weak #5): the old unpaired min-of-2 is what made the
    # r3 26.2 vs r4 19.2 GLUPS "regression" — a paired on-device re-run got
    # 24.1 vs 24.2 with ±5% spreads (no code change between measurements).
    mf_s0 = langevin.init_chain_state(c2, actions.get("anharmonic"))
    mf_frames = 16 if on_tpu else 8  # r5: overhead amortization (2 launches at K=8)

    mf_block = 128 if on_tpu else 32  # r3 sweep: K=8 peaks at 128

    def mk_mf(k):
        def run():
            s, _ = chain_kernel.run_frames_pallas(
                mf_s0, actions.get("anharmonic"), c2, mf_frames,
                block_chains=mf_block, interpret=not on_tpu,
                frames_per_launch=k,
            )
            np.asarray(s.lrg_vl)

        return run

    mf_t = ab_timeit(
        {"k1": mk_mf(1), "k8": mk_mf(8 if on_tpu else 2)},
        reps=5 if on_tpu else 1,
    )
    mf_ups = c2.n_chains * c2.n_sites * c2.loops * mf_frames
    mf_k1_mlups = mf_ups / mf_t["k1"][0] / 1e6
    mf_mlups = mf_ups / mf_t["k8"][0] / 1e6
    log(f"config-2 multiframe (K=8): {mf_mlups:.0f} MLUPS "
        f"(paired K=1: {mf_k1_mlups:.0f})")

    ref = oracle.run_reference(200, 0.02, 2e-4, frames=5, loops=1000, seed=7)
    ref_mlups = ref.updates_per_sec / 1e6
    log(f"oracle baseline: {ref_mlups:.1f} MLUPS (serial CPU)")

    result = {
        "metric": "double_well_site_updates_per_sec_per_chip",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / ref_mlups, 2),
        "threefry_mlups": round(mlups_tf, 1),
        "threefry13_mlups": round(mlups_tf13, 1),
        "config2_anharmonic_mlups": round(mlups_c2, 1),
        "field_runtime_pallas_mlups": round(field_mlups, 1),
        "field_runtime_multiframe_mlups": round(field_mf_mlups, 1),
        "field_runtime_hw_prng_mlups": round(field_hw_mlups, 1),
        "field_mlups_spreads": field_spreads,
        "u1_gauge_kernel_mlups": round(glups_k, 1),
        "u1_gauge_xla_mlups": round(glups_x, 1),
        "su2_gauge_kernel_mlups": round(glups2_k, 1),
        "su2_gauge_xla_mlups": round(glups2_x, 1),
        "su3_gauge_kernel_mlups": round(glups3_k, 1),
        "su3_gauge_xla_mlups": round(glups3_x, 1),
        **gauge_mf,
        "nd4d_kernel_mlups": round(nd_k, 1),
        "nd4d_chunk_w4_mlups": round(nd_chunk, 1),
        "nd4d_xla_mlups": round(nd_x, 1),
        "halo_pallas_frame_mlups": round(halo_frame_mlups, 1),
        "halo_pallas_step_mlups": round(halo_step_mlups, 1),
        "halo_pallas_pair_mlups": round(halo_pair_mlups, 1),
        "halo_pallas_rdma_mlups": round(halo_rdma_mlups, 1),
        "halo_xla_mlups": round(halo_xla_mlups, 1),
        "config2_multiframe_k8_mlups": round(mf_mlups, 1),
        "config2_multiframe_k1_mlups": round(mf_k1_mlups, 1),
        "gauge_chunk_mlups": round(gauge_chunk_mlups, 1),
        "gauge_chunk_xla_mlups": round(gauge_chunk_xla_mlups, 1),
        "kernel_equals_xla_on_device": kernel_equals_xla
        and gauge_gate <= 2e-6
        and su2_gate <= 2e-6
        and su3_gate <= 1e-5
        and nd_gate <= 2e-6
        and halo_gate <= 2e-6
        and halo_pair_gate <= 2e-6
        and halo_rdma_gate <= 2e-6
        and gauge_chunk_gate <= 2e-6,
        "kernel_vs_xla_max_abs_diff": {
            "chain": chain_gate, "field": field_gate, "gauge": gauge_gate,
            "su2": su2_gate, "su3": su3_gate, "nd4d": nd_gate,
            "halo_step_vs_xla": halo_gate, "halo_pair_vs_xla": halo_pair_gate,
            "halo_rdma_vs_xla": halo_rdma_gate,
            "gauge_chunk_vs_halo": gauge_chunk_gate,
        },
        "stable_fraction": stable,
    }
    regressions = check_regressions(result)
    if regressions:
        result["regressions"] = regressions
    print(json.dumps(result))


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    from stochquant_tpu.watchdog import run_watchdogged

    def report(att):
        if att.stderr:
            sys.stderr.write(att.stderr)
        if att.timed_out:
            log(f"attempt {att.index}: worker timed out (TPU tunnel wedged?)")
        elif not att.ok:
            log(f"attempt {att.index}: worker exit {att.returncode}")

    res = run_watchdogged(
        [os.path.abspath(__file__), "--worker"],
        python=True,
        # r5: the dress rehearsal ran ~17 min warm; first-compile of the
        # new frame counts through the tunnel can add several minutes —
        # keep headroom so attempt 1 doesn't die at the finish line
        timeout_s=2400,
        attempts=3,
        backoff_s=90,
        on_attempt=report,
    )
    if res.ok:
        lines = [l for l in res.success.stdout.splitlines() if l.strip()]
        if lines:
            print(lines[-1])
        else:
            # a successful worker with empty stdout is its own failure mode
            # (ADVICE r3) — not "all attempts failed"
            log("worker succeeded but printed nothing")
            print(json.dumps({
                "metric": "double_well_site_updates_per_sec_per_chip",
                "value": 0.0,
                "unit": "MLUPS",
                "vs_baseline": 0.0,
                "error": "benchmark worker exited 0 with empty stdout",
            }))
        return
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
