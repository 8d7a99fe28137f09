#!/usr/bin/env python
"""On-device perf experiments for the r4 tuning questions (run on the real
TPU through the tunnel; one experiment per CLI arg so a wedged tunnel run
loses one data point, not the session):

  nd_tile   — 32⁴ pair-kernel tile_rows sweep (VERDICT r3 weak #6/#7)
  nd_chunk  — 32⁴ unsharded W-step chunk sweep (exchange_steps × tile_rows)
  rdma      — 2-D ring-of-one: rdma vs pallas_pair vs xla halo runners
  gauge_mf  — su2/su3 multi-frame (K=8) vs single-frame at 256 chains
  w4d       — 4-D sharded chunk exchange_steps sweep on the 1-way ring

Each prints one JSON line per measurement (median of N with spread).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(run, reps=5):
    run()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0], ts[-1]


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
                    s, act, cfg, 2, tile_rows=t0, interpret=not on_tpu
                )
                np.asarray(out.lrg_vl)

            med, lo, hi = timeit(run)
            emit(exp="nd_tile", tile_rows=t0,
                 mlups=round(vol * cfg.loops * 2 / med / 1e6, 1),
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
                    s, act, cfg, 2, tile_rows=t0, interpret=not on_tpu
                )
                np.asarray(out.lrg_vl)

            med, lo, hi = timeit(run)
            emit(exp="nd_chunk", W=w, tile_rows=t0,
                 mlups=round(vol * cfg.loops * 2 / med / 1e6, 1),
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
    frames = 5
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
    frames = 8
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
    frames = 2
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


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    log(f"devices: {jax.devices()}")
    exps = {
        "nd_tile": nd_tile, "nd_chunk": nd_chunk, "rdma": rdma,
        "gauge_mf": gauge_mf, "w4d": w4d,
    }
    for name in sys.argv[1:] or list(exps):
        log(f"=== {name} ===")
        exps[name]()


if __name__ == "__main__":
    main()
