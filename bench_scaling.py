#!/usr/bin/env python
"""Weak-scaling benchmark for the domain-decomposed φ⁴ lattice.

Holds the per-device lattice block constant while growing the device count
(the ≥90 % weak-scaling target of BASELINE.json), running the explicit
shard_map + ring-ppermute halo runner.  Each device count runs in its own
subprocess so the device topology is set before JAX initializes.

On real TPU pods run one process per host with ``--devices`` equal to the
global device count; on this single-chip dev box it exercises the harness on
virtual CPU devices (numbers then characterize the harness, not TPU ICI).

Output: one JSON line per device count + a final efficiency summary line.
"""

import argparse
import json
import os
import subprocess
import sys
import time


def worker(n_devices: int, per_device: int, chains: int, loops: int, reps: int):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import numpy as np

    from stochquant_tpu.actions import phi4
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field
    from stochquant_tpu.parallel import make_mesh, shard_field_state
    from stochquant_tpu.parallel.halo import make_halo_runner

    cfg = FieldConfig(
        action="phi4",
        shape=(per_device * n_devices, per_device),  # weak scaling along dim 0
        dtau=0.01,
        n_chains=chains,
        loops=loops,
        seed=5,
        grow_after=10**9,
        mesh_axes=("x", None),
    )
    act = phi4.get_field("phi4")
    mesh = make_mesh([("x", n_devices)])
    runner = make_halo_runner(act, cfg, mesh)
    state = shard_field_state(field.init_field_state(cfg), mesh, cfg)
    state, _ = runner(state, 1)
    np.asarray(state.lrg_vl)  # completion barrier (tunnel-safe timing)
    times = []
    for _ in range(reps):
        t0 = time.time()
        state, m = runner(state, 1)
        np.asarray(state.lrg_vl)
        times.append(time.time() - t0)
    times.sort()
    t = times[len(times) // 2]
    vol = cfg.n_chains * cfg.shape[0] * cfg.shape[1] * cfg.loops
    print(json.dumps({
        "devices": n_devices,
        "lattice": list(cfg.shape),
        "median_s": round(t, 4),
        "mlups_total": round(vol / t / 1e6, 1),
        "mlups_per_device": round(vol / t / 1e6 / n_devices, 1),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device", type=int, default=128)
    ap.add_argument("--chains", type=int, default=2)
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--worker", type=int, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.per_device, args.chains, args.loops, args.reps)
        return

    results = []
    for n in args.devices:
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""  # local CPU compiles
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n),
             "--per-device", str(args.per_device), "--chains", str(args.chains),
             "--loops", str(args.loops), "--reps", str(args.reps)],
            env=env, stdout=subprocess.PIPE, check=True,
        )
        line = out.stdout.decode().strip().splitlines()[-1]
        print(line, flush=True)
        results.append(json.loads(line))

    base = results[0]["mlups_per_device"]
    effs = {r["devices"]: round(r["mlups_per_device"] / base, 3) for r in results}
    print(json.dumps({"weak_scaling_efficiency": effs}))


if __name__ == "__main__":
    main()
