#!/usr/bin/env python
"""Halo-exchange overlap A/B: overlapped vs blocking stencil structure.

VERDICT r1 item 5 / SURVEY.md §2.5 "ring exchange with compute overlap".
The overlapped runner issues the ring ppermutes before the bulk stencil and
keeps the bulk free of any data dependency on them (parallel/halo.py:
laplacian_overlapped); the blocking reference concatenates halos into every
shifted operand, putting the wire on the critical path of all sites.

Hardware caveat, stated plainly: this environment has ONE real TPU chip, so
inter-chip ICI overlap cannot be measured here.  This script provides
 (a) an A/B wall-time row on the 8-device virtual CPU mesh (scheduler-level
     characterization only — CPU 'collectives' are memcpys), and
 (b) compiled-HLO evidence: the overlapped program's `collective-permute-
     start`/`-done` pairs bracket independent fused compute, i.e. XLA
     schedules the exchange asynchronously, which is the property that
     becomes wall-time overlap on real ICI.
Run on a pod slice unchanged for real numbers.

Usage: python bench_halo.py   (self-configures 8 virtual CPU devices)
"""

import json
import os
import sys
import time

if __name__ == "__main__" and "--child" not in sys.argv and "--hlo" not in sys.argv:
    # fresh process so XLA_FLAGS lands before jax initializes
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__), "--child"])


def hlo_mode():
    """AOT-compile both runner variants for an 8-chip v5e slice (no chips
    needed — jax.experimental.topologies) and report how much independent
    compute XLA schedules between each collective-permute-start and its
    -done: the schedule-level form of halo/compute overlap."""
    import re

    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    import jax.tree as jt
    from stochquant_tpu.actions import phi4 as phi4_mod
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.parallel.halo import make_halo_runner
    from stochquant_tpu.parallel.mesh import field_state_sharding

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4",
        chips_per_host_bounds=(2, 4, 1), num_slices=1,
    )
    mesh = Mesh(np.array(topo.devices).reshape(8), ("x",))
    cfg = FieldConfig(
        action="phi4", shape=(512, 512), dtau=0.005, n_chains=2, loops=10,
        frames=1, seed=41, mesh_axes=("x", None),
    )
    act = phi4_mod.get_field(cfg.action)
    specs = field_state_sharding(mesh, cfg)
    proto = jax.eval_shape(lambda: field_mod.init_field_state(cfg))
    abstract = jt.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        proto, specs,
    )

    report = {}
    for name, overlap in (("overlapped", True), ("blocking", False)):
        runner = make_halo_runner(act, cfg, mesh, overlap=overlap)
        txt = jax.jit(lambda s: runner(s, 1)).lower(abstract).compile().as_text()
        rows = []
        for comp in txt.split("\n\n"):
            if "collective-permute-start" not in comp:
                continue
            lines = comp.splitlines()
            starts = [i for i, l in enumerate(lines) if "collective-permute-start" in l]
            dones = [i for i, l in enumerate(lines) if "collective-permute-done" in l]
            fus = [i for i, l in enumerate(lines) if re.search(r"= .*fusion", l)]
            for s in starts:
                nd = min([d for d in dones if d > s], default=-1)
                rows.append({
                    "sched_distance": nd - s,
                    "independent_fusions": len([f for f in fus if s < f < nd]),
                })
            break  # the micro-step while-body is the first such computation
        report[name] = rows
        log(f"{name}: {rows}")
    print(json.dumps({
        "metric": "halo_overlap_scheduled_hlo_v5e_2x4",
        "scheduled": "is_scheduled=true" in txt,
        "pairs": report,
        "note": "instrs/fusions between collective-permute-start and -done "
                "in the scheduled TPU HLO = compute hidden behind the wire",
    }))

import jax  # noqa: E402

if "--hlo" not in sys.argv:
    # the container's sitecustomize re-pins jax_platforms to the TPU tunnel
    # after env processing; force it back before any backend initializes
    # (--hlo mode keeps the TPU plugin: it AOT-compiles for a v5e topology)
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from stochquant_tpu.actions import phi4 as phi4_mod  # noqa: E402
from stochquant_tpu.config import FieldConfig  # noqa: E402
from stochquant_tpu.integrators import field as field_mod  # noqa: E402
from stochquant_tpu.parallel import make_mesh, shard_field_state  # noqa: E402
from stochquant_tpu.parallel.halo import make_halo_runner  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    assert len(jax.devices()) == 8, jax.devices()
    cfg = FieldConfig(
        action="phi4", shape=(512, 512), dtau=0.005, n_chains=2, loops=10,
        frames=1, seed=41, mesh_axes=("x", None),
    )
    mesh = make_mesh([("x", 8)])
    act = phi4_mod.get_field(cfg.action)
    s0 = shard_field_state(field_mod.init_field_state(cfg), mesh, cfg)

    results = {}
    for name, overlap in (("overlapped", True), ("blocking", False)):
        runner = make_halo_runner(act, cfg, mesh, overlap=overlap)
        out, _ = runner(s0, 2)  # compile + warmup
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.time()
            out, _ = runner(s0, 2)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        results[name] = sorted(times)[len(times) // 2]
        log(f"{name}: median {results[name]*1e3:.1f} ms over 5 reps")

    # HLO evidence: async collective-permute pairs in the overlapped program
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def one_frame(s):
        runner_src = make_halo_runner(act, cfg, mesh, overlap=True)
        return runner_src(s, 1)

    # lower the jitted runner and inspect optimized HLO
    runner = make_halo_runner(act, cfg, mesh, overlap=True)
    # reach the cached jitted fn through one call, then recompile via lower()
    lowered_text = ""
    try:
        import functools

        from stochquant_tpu.parallel import halo as halo_mod

        # rebuild the exact jitted computation for lowering
        frame_jit = jax.jit(lambda s: runner(s, 1))
        lowered_text = frame_jit.lower(s0).compile().as_text()
    except Exception as e:  # pragma: no cover - inspection is best-effort
        log(f"HLO inspection unavailable: {e}")
    async_pairs = lowered_text.count("collective-permute-start")
    log(f"optimized HLO: {async_pairs} collective-permute-start ops "
        "(async exchange; paired -done ops gate only the edge fixup)")

    print(json.dumps({
        "metric": "halo_overlap_ab_cpu_mesh",
        "overlapped_ms": round(results["overlapped"] * 1e3, 1),
        "blocking_ms": round(results["blocking"] * 1e3, 1),
        "speedup": round(results["blocking"] / results["overlapped"], 3),
        "async_collective_permute_pairs": async_pairs,
        "note": "8 virtual CPU devices — scheduler characterization; run on a pod for ICI numbers",
    }))


if __name__ == "__main__":
    if "--hlo" in sys.argv:
        hlo_mode()
    else:
        main()
