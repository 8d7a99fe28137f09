#!/usr/bin/env python
"""On-device perf experiments (run on the real TPU through the tunnel):

  nd_tile   — 32⁴ pair-kernel tile_rows sweep (VERDICT r3 weak #6/#7)
  nd_chunk  — 32⁴ unsharded W-step chunk sweep (exchange_steps × tile_rows)
  rdma      — 2-D ring-of-one: rdma vs pallas_pair vs xla halo runners
  gauge_mf  — su2/su3 multi-frame (K=8) vs single-frame at 256 chains
  w4d       — 4-D sharded chunk exchange_steps sweep on the 1-way ring
  field_rt  — field runtime rows (single/multiframe/hw) paired, high reps
  c2mf      — config-2 chain multiframe K=1 vs K=8 paired, high reps

Each prints one JSON line per measurement (median of N with spread).

Every experiment runs in its OWN watchdogged child process
(``stochquant_tpu.watchdog.run_watchdogged``): the tunnel's remote-compile
service can wedge indefinitely (r4 lost a 50-minute run to it — VERDICT r4
weak #7), so a wedged experiment now costs one timeout, not the session.
``--worker NAME`` is the in-process entry the parent spawns.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from stochquant_tpu.timing import ab_timeit, timeit  # noqa: E402,F401


def emit(**kw):
    print(json.dumps(kw), flush=True)


def nd_tile():
    import jax
    from stochquant_tpu.actions import phi4
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field
    from stochquant_tpu.kernels import field_kernel_nd as fknd

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = FieldConfig(action="phi4", shape=(32, 32, 32, 32), n_chains=1,
                      loops=20, seed=9, grow_after=10**9)
    act = phi4.get_field("phi4")
    s = field.init_field_state(cfg)
    vol = int(np.prod(cfg.shape))
    for t0 in (4, 8, 16):
        try:
            def run():
                out, _ = fknd.run_field_frames_nd(
                    s, act, cfg, 8, tile_rows=t0, interpret=not on_tpu
                )
                np.asarray(out.lrg_vl)

            med, lo, hi = timeit(run)
            emit(exp="nd_tile", tile_rows=t0,
                 mlups=round(vol * cfg.loops * 8 / med / 1e6, 1),
                 med_s=round(med, 4), spread=[round(lo, 4), round(hi, 4)])
        except Exception as e:  # noqa: BLE001
            emit(exp="nd_tile", tile_rows=t0, error=str(e)[:200])


def nd_chunk():
    import dataclasses

    import jax
    from stochquant_tpu.actions import phi4
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field
    from stochquant_tpu.kernels import field_kernel_nd as fknd

    on_tpu = jax.devices()[0].platform != "cpu"
    base = FieldConfig(action="phi4", shape=(32, 32, 32, 32), n_chains=1,
                       loops=20, seed=9, grow_after=10**9)
    act = phi4.get_field("phi4")
    s = field.init_field_state(base)
    vol = int(np.prod(base.shape))
    for w, t0 in ((4, 4), (4, 8), (10, 4), (20, 4)):
        cfg = dataclasses.replace(base, exchange_steps=w)
        try:
            def run():
                out, _ = fknd.run_field_frames_nd(
                    s, act, cfg, 8, tile_rows=t0, interpret=not on_tpu
                )
                np.asarray(out.lrg_vl)

            med, lo, hi = timeit(run)
            emit(exp="nd_chunk", W=w, tile_rows=t0,
                 mlups=round(vol * cfg.loops * 8 / med / 1e6, 1),
                 med_s=round(med, 4), spread=[round(lo, 4), round(hi, 4)])
        except Exception as e:  # noqa: BLE001
            emit(exp="nd_chunk", W=w, tile_rows=t0, error=str(e)[:200])


def rdma():
    import jax
    from stochquant_tpu.actions import phi4
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.parallel import make_mesh, shard_field_state
    from stochquant_tpu.parallel.halo import make_halo_runner

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = FieldConfig(
        action="phi4", shape=(256, 256), n_chains=16, loops=50, frames=1,
        seed=13, grow_after=10**9, mesh_axes=("x", None),
    )
    act = phi4.get_field("phi4")
    mesh = make_mesh([("x", 1)])
    s = shard_field_state(field_mod.init_field_state(cfg), mesh, cfg)
    frames = 20  # r5: amortize the ~22ms/rep dispatch overhead
    ups = cfg.n_chains * 256 * 256 * cfg.loops * frames
    for backend in ("pallas_rdma", "pallas_pair", "xla"):
        try:
            runner = make_halo_runner(
                act, cfg, mesh, backend=backend, interpret=not on_tpu
            )

            def run():
                out, _ = runner(s, frames)
                np.asarray(out.lrg_vl)

            med, lo, hi = timeit(run)
            emit(exp="rdma", backend=backend,
                 mlups=round(ups / med / 1e6, 1),
                 med_s=round(med, 4), spread=[round(lo, 4), round(hi, 4)])
        except Exception as e:  # noqa: BLE001
            emit(exp="rdma", backend=backend, error=str(e)[:200])


def gauge_mf():
    import jax
    from stochquant_tpu.integrators import gauge as gauge_mod
    from stochquant_tpu.integrators.gauge import GaugeConfig
    from stochquant_tpu.kernels import gauge_kernel

    on_tpu = jax.devices()[0].platform != "cpu"
    frames = 24 if on_tpu else 8  # r5: amortize the ~22ms/rep overhead
    for group, beta, dtau, shape in (
        ("su2", 2.0, 2e-3, (16, 128)),
        ("su3", 5.0, 1e-3, (8, 128)),
        ("u1", 1.0, 5e-3, (16, 128)),
    ):
        cfg = GaugeConfig(group=group, beta=beta, shape=shape,
                          n_chains=256 if on_tpu else 8, dtau=dtau,
                          loops=10, seed=29, grow_after=10**9)
        gact = gauge_mod.resolve_gauge_action(cfg)
        gs = gauge_mod.init_gauge_state(cfg, gact)
        ups = cfg.n_chains * 2 * shape[0] * shape[1] * cfg.loops * frames
        for k in (1, 8):
            try:
                def run():
                    s, _ = gauge_kernel.run_gauge_frames_pallas(
                        gs, gact, cfg, frames, interpret=not on_tpu,
                        frames_per_launch=k,
                    )
                    np.asarray(s.drift_max)

                med, lo, hi = timeit(run)
                emit(exp="gauge_mf", group=group, K=k,
                     mlups=round(ups / med / 1e6, 1),
                     med_s=round(med, 4), spread=[round(lo, 4), round(hi, 4)])
            except Exception as e:  # noqa: BLE001
                emit(exp="gauge_mf", group=group, K=k, error=str(e)[:200])


def w4d():
    import dataclasses

    import jax
    from stochquant_tpu.actions import phi4
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.parallel import make_mesh, shard_field_state
    from stochquant_tpu.parallel.halo import make_halo_runner

    on_tpu = jax.devices()[0].platform != "cpu"
    base = FieldConfig(
        action="phi4", shape=(32, 32, 32, 32), n_chains=1, loops=20,
        frames=1, seed=9, grow_after=10**9,
        mesh_axes=("x", None, None, None),
    )
    act = phi4.get_field("phi4")
    mesh = make_mesh([("x", 1)])
    s = shard_field_state(field_mod.init_field_state(base), mesh, base)
    vol = int(np.prod(base.shape))
    frames = 8  # r5: amortize the ~22ms/rep dispatch overhead
    ups = vol * base.loops * frames
    for w in (2, 4, 10, 20):
        cfg = dataclasses.replace(base, exchange_steps=w)
        try:
            runner = make_halo_runner(
                act, cfg, mesh, backend="pallas_pair", interpret=not on_tpu
            )

            def run():
                out, _ = runner(s, frames)
                np.asarray(out.lrg_vl)

            med, lo, hi = timeit(run)
            emit(exp="w4d", W=w, mlups=round(ups / med / 1e6, 1),
                 med_s=round(med, 4), spread=[round(lo, 4), round(hi, 4)])
        except Exception as e:  # noqa: BLE001
            emit(exp="w4d", W=w, error=str(e)[:200])


def gauge_lane():
    """Gauge kernel MLUPS at the bench lattices (r5 lane-packed layout
    check: su3 at (64, 64) ran at 127 MLUPS under the plain layout vs
    ~580 lane-aligned — the packed (32, 128) view should close that)."""
    import jax
    from stochquant_tpu.integrators import gauge as gauge_mod
    from stochquant_tpu.integrators.gauge import GaugeConfig
    from stochquant_tpu.kernels import gauge_kernel

    on_tpu = jax.devices()[0].platform != "cpu"
    for group, beta, dtau, shape, chains, loops, frames in (
        ("su3", 5.0, 1e-3, (64, 64), 8, 50, 2),
        ("su2", 2.0, 2e-3, (128, 128), 16, 100, 3),
        ("u1", 1.0, 5e-3, (256, 256), 32, 100, 3),
    ):
        cfg = GaugeConfig(group=group, beta=beta, shape=shape,
                          n_chains=chains if on_tpu else 2, dtau=dtau,
                          loops=loops if on_tpu else 4, seed=19,
                          grow_after=10**9)
        act = gauge_mod.resolve_gauge_action(cfg)
        s0 = gauge_mod.init_gauge_state(cfg, act)
        ups = cfg.n_chains * 2 * shape[0] * shape[1] * cfg.loops * frames
        try:
            def run():
                s, _ = gauge_kernel.run_gauge_frames_pallas(
                    s0, act, cfg, frames, interpret=not on_tpu
                )
                np.asarray(s.drift_max)

            med, lo, hi = timeit(run)
            emit(exp="gauge_lane", group=group, shape=list(shape),
                 layout=list(gauge_kernel._lattice_layout(cfg)),
                 mlups=round(ups / med / 1e6, 1), med_s=round(med, 4),
                 mlups_spread=[round(ups / hi / 1e6, 1),
                               round(ups / lo / 1e6, 1)])
        except Exception as e:  # noqa: BLE001
            emit(exp="gauge_lane", group=group, error=str(e)[:300])


def gauge_chunk():
    """r5 gauge chunk runner vs the XLA gauge halo runner on the 1-chip
    ring (the composition bench: VERDICT r4 item 3 wants chunk >= xla)."""
    import jax
    from stochquant_tpu.integrators import gauge as gauge_mod
    from stochquant_tpu.integrators.gauge import GaugeConfig
    from stochquant_tpu.parallel import make_mesh, shard_gauge_state
    from stochquant_tpu.parallel.gauge_halo import (
        make_gauge_chunk_runner,
        make_gauge_halo_runner,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    frames = 10 if on_tpu else 1
    for group, beta, dtau, shape, chains, loops in (
        ("u1", 1.0, 5e-3, (256, 256), 32, 100),
        ("su2", 2.0, 2e-3, (128, 128), 16, 100),
        ("su3", 5.0, 1e-3, (64, 64), 8, 50),
    ):
        cfg = GaugeConfig(group=group, beta=beta, shape=shape,
                          n_chains=chains if on_tpu else 2, dtau=dtau,
                          loops=loops if on_tpu else 4, seed=19,
                          grow_after=10**9, mesh_axes=("x", None))
        act = gauge_mod.resolve_gauge_action(cfg)
        mesh = make_mesh([("x", 1)])
        s0 = shard_gauge_state(
            gauge_mod.init_gauge_state(cfg, act), act, mesh, cfg
        )
        ups = cfg.n_chains * 2 * shape[0] * shape[1] * cfg.loops * frames
        runners = {}
        try:
            runners["chunk"] = make_gauge_chunk_runner(
                act, cfg, mesh, interpret=not on_tpu
            )
            runners["xla"] = make_gauge_halo_runner(
                act, cfg, mesh, interpret=not on_tpu
            )
        except Exception as e:  # noqa: BLE001
            emit(exp="gauge_chunk", group=group, error=str(e)[:300])
            continue

        def mk(r):
            def run():
                s, _ = r(s0, frames)
                np.asarray(s.drift_max)

            return run

        try:
            t = ab_timeit({k: mk(r) for k, r in runners.items()},
                          reps=5 if on_tpu else 1)
            emit(exp="gauge_chunk", group=group,
                 chunk_mlups=round(ups / t["chunk"][0] / 1e6, 1),
                 xla_mlups=round(ups / t["xla"][0] / 1e6, 1),
                 ratio=round(t["xla"][0] / t["chunk"][0], 2))
        except Exception as e:  # noqa: BLE001
            emit(exp="gauge_chunk", group=group, error=str(e)[:300])


_ND_PROBE_CODE = r'''
import os, sys, time, json
sys.path.insert(0, os.environ["SQ_REPO"])
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.environ["SQ_REPO"], ".jax_cache"))
from stochquant_tpu.actions import phi4
from stochquant_tpu.config import FieldConfig
from stochquant_tpu.integrators import field
from stochquant_tpu.kernels import field_kernel_nd as fknd

on_tpu = jax.devices()[0].platform != "cpu"
frames = 8 if on_tpu else 1
cfg = FieldConfig(action="phi4",
                  shape=(32, 32, 32, 32) if on_tpu else (8, 8, 4, 4),
                  n_chains=1, loops=20 if on_tpu else 4, seed=9,
                  grow_after=10**9)
act = phi4.get_field("phi4")
s = field.init_field_state(cfg)
ups = int(np.prod(cfg.shape)) * cfg.loops * frames

def run():
    out, _ = fknd.run_field_frames_nd(s, act, cfg, frames,
                                      interpret=not on_tpu)
    np.asarray(out.lrg_vl)

run()
ts = []
for _ in range(5):
    t0 = time.time(); run(); ts.append(time.time() - t0)
ts.sort()
med = ts[len(ts) // 2]
print(json.dumps({"mlups": round(ups / med / 1e6, 1),
                  "spread": [round(ups / ts[-1] / 1e6, 1),
                             round(ups / ts[0] / 1e6, 1)]}))
'''


def nd_fixcost():
    """r5 (VERDICT r4 item 4): bound the inner-flat-dim wrap-fix roll
    overhead at 32⁴.  The fix rolls + selects are what BOTH named layout
    levers (merged ±1 fixes, two dims on (sublane, lane)) could at best
    remove — the 'nofix' variant (diagnostic flag, wrong at the dim-3
    seam) measures that ceiling directly.  8 frames/rep so the ~22 ms
    dispatch overhead is <3% of each measurement."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, flag in (("fix", ""), ("nofix", "1")):
        env = dict(os.environ, SQ_REPO=repo)
        if flag:
            env["SQ_ND_PERF_PROBE_NOFIX"] = flag
        out = subprocess.run(
            [sys.executable, "-c", _ND_PROBE_CODE], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=1500,
        )
        if out.returncode:
            emit(exp="nd_fixcost", variant=name,
                 error=out.stderr.decode(errors="replace")[-300:])
            continue
        rec = json.loads(out.stdout.decode().strip().splitlines()[-1])
        emit(exp="nd_fixcost", variant=name, **rec)


def field_rt(reps=10):
    """Field runtime rows with enough paired reps to bound the spread
    (VERDICT r4 weak #5: the r4 single-path spread was ±25%, too wide for
    the deltas being claimed)."""
    import dataclasses

    import jax
    from stochquant_tpu import metrics as metrics_mod
    from stochquant_tpu import runtime
    from stochquant_tpu.config import FieldConfig

    on_tpu = jax.devices()[0].platform != "cpu"
    # frames=40 (vs bench r4's 10): each rep ~1.8s of device work, so the
    # tunnel's few-hundred-ms dispatch/readback jitter stops dominating the
    # measurement (r4 single-path spread was ±25% at 0.45s/rep)
    frames = int(os.environ.get("SQ_FIELD_RT_FRAMES", 40))
    fcfg = FieldConfig(
        action="phi4", shape=(256, 256), n_chains=16 if on_tpu else 2,
        loops=100 if on_tpu else 4, frames=frames if on_tpu else 2, seed=13,
        fps=frames if on_tpu else 2, grow_after=10**9,
    )
    fb = "pallas" if on_tpu else "xla"
    null_sink = lambda: metrics_mod.MetricsSink(stream=open(os.devnull, "w"))
    ups = fcfg.n_chains * 256 * 256 * fcfg.loops * fcfg.frames
    reps = int(os.environ.get("SQ_FIELD_RT_REPS", reps))
    fmf = dataclasses.replace(fcfg, frames_per_launch=10)
    runs = {
        "single": lambda: runtime.run_field(fcfg, backend=fb, sink=null_sink()),
        "multiframe": lambda: runtime.run_field(fmf, backend=fb,
                                                sink=null_sink()),
    }
    if on_tpu:
        fhw = dataclasses.replace(fcfg, rng_impl="hardware")
        runs["hw"] = lambda: runtime.run_field(fhw, backend="pallas",
                                               sink=null_sink())
    t = ab_timeit(runs, reps=reps if on_tpu else 1)
    for k, (med, lo, hi) in t.items():
        emit(exp="field_rt", variant=k, mlups=round(ups / med / 1e6, 1),
             med_s=round(med, 4),
             mlups_spread=[round(ups / hi / 1e6, 1), round(ups / lo / 1e6, 1)])


def c2mf(reps=6):
    """Config-2 chain kernel: K=1 vs K=8 frames/launch, paired (the r4
    -27% multiframe drop vs r3 was measured un-paired, min-of-2)."""
    import jax
    from stochquant_tpu import actions
    from stochquant_tpu.config import BoundaryCondition, ChainConfig, Formulation
    from stochquant_tpu.integrators import langevin
    from stochquant_tpu.kernels import chain_kernel

    on_tpu = jax.devices()[0].platform != "cpu"
    c2 = ChainConfig(
        action="anharmonic", n_sites=1024, dt=0.25, dtau=0.01, n_chains=256,
        loops=1000 if on_tpu else 10, seed=14, bc=BoundaryCondition.PERIODIC,
        formulation=Formulation.DIRECT, grow_after=10**9,
        rng_impl="hardware" if on_tpu else "threefry",
    )
    act = actions.get("anharmonic")
    s0 = langevin.init_chain_state(c2, act)
    frames = 8
    block = 128 if on_tpu else 32
    ups = c2.n_chains * c2.n_sites * c2.loops * frames

    def mk(k):
        def run():
            s, _ = chain_kernel.run_frames_pallas(
                s0, act, c2, frames, block_chains=block,
                interpret=not on_tpu, frames_per_launch=k,
            )
            np.asarray(s.lrg_vl)

        return run

    t = ab_timeit({"k1": mk(1), "k8": mk(8 if on_tpu else 2)},
                  reps=reps if on_tpu else 1)
    for k, (med, lo, hi) in t.items():
        emit(exp="c2mf", variant=k, mlups=round(ups / med / 1e6, 1),
             med_s=round(med, 4),
             mlups_spread=[round(ups / hi / 1e6, 1), round(ups / lo / 1e6, 1)])


EXPS = {
    "nd_tile": nd_tile, "nd_chunk": nd_chunk, "rdma": rdma,
    "gauge_mf": gauge_mf, "w4d": w4d, "field_rt": field_rt, "c2mf": c2mf,
    "gauge_lane": gauge_lane, "gauge_chunk": gauge_chunk,
    "nd_fixcost": nd_fixcost,
}

# test-only experiments (underscore names skip JAX init in the worker):
# _sleep simulates a wedged tunnel; _ok a healthy measurement.  Enabled via
# env so tests/test_watchdog.py can drive the parent loop without a TPU.
if os.environ.get("SQ_PERF_TEST_EXPS"):
    EXPS["_sleep"] = lambda: time.sleep(600)
    EXPS["_ok"] = lambda: emit(exp="_ok", mlups=1.0)

#: per-experiment watchdog (s); first-compile through the tunnel can take
#: minutes, so these are generous — but finite, unlike a wedged tunnel
_TIMEOUT_S = float(os.environ.get("SQ_PERF_TIMEOUT_S", 1800.0))
_ATTEMPTS = int(os.environ.get("SQ_PERF_ATTEMPTS", 2))
_BACKOFF_S = float(os.environ.get("SQ_PERF_BACKOFF_S", 60.0))


def worker(name: str) -> None:
    if not name.startswith("_"):
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        log(f"devices: {jax.devices()}")
    log(f"=== {name} ===")
    EXPS[name]()


def main():
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return
    from stochquant_tpu.watchdog import run_watchdogged

    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(EXPS)
    bad = [n for n in names if n not in EXPS]
    if bad:
        log(f"unknown experiments: {bad}; available: {list(EXPS)}")
        sys.exit(2)
    failures = 0
    for name in names:
        def report(att, name=name):
            if att.stderr:
                sys.stderr.write(att.stderr)
            if att.timed_out:
                log(f"[{name}] attempt {att.index}: watchdog timeout "
                    f"({_TIMEOUT_S:.0f}s) — tunnel wedged?")
            elif not att.ok:
                log(f"[{name}] attempt {att.index}: exit {att.returncode}")

        res = run_watchdogged(
            [os.path.abspath(__file__), "--worker", name],
            python=True, timeout_s=_TIMEOUT_S, attempts=_ATTEMPTS,
            backoff_s=_BACKOFF_S, on_attempt=report,
        )
        if res.ok:
            sys.stdout.write(res.success.stdout)
            sys.stdout.flush()
        else:
            failures += 1
            emit(exp=name, error="all watchdogged attempts failed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
