#!/usr/bin/env python
"""AOT Mosaic-compile regression check for every fused kernel (no chip
needed: compiles against a ``jax.experimental.topologies`` v5e target).

Interpret-mode tests validate kernel *semantics* on CPU but skip Mosaic
lowering entirely — r3 found two latent device-compile blockers that way
(a (1, T0, 1) output tile violating the 8/128 block rule, and rank-4
vectors with leading singletons tripping "invalid relayout" on
reductions).  This script closes that gap: run it after touching any
kernel.  Usage: ``JAX_PLATFORMS= python tools/aot_check.py [case ...]``.
"""

import sys

import numpy as np


def main():
    import jax
    import jax.tree as jt
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from stochquant_tpu.actions import phi4 as phi4_mod
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field as field_mod

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x2",
        chips_per_host_bounds=(2, 2, 1), num_slices=1,
    )
    devs = np.array(topo.devices)
    act = phi4_mod.get_field("phi4")
    one = Mesh(devs.reshape(4)[:1], ("d",))
    repl = jax.sharding.NamedSharding(one, jax.sharding.PartitionSpec())

    def abstract_of(proto, sharding=repl):
        return jt.map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sharding),
            proto,
        )

    def sharded_abstract(cfg, mesh):
        from stochquant_tpu.parallel.mesh import field_state_sharding

        specs = field_state_sharding(mesh, cfg)
        proto = jax.eval_shape(lambda: field_mod.init_field_state(cfg))
        return jt.map(
            lambda l, sp: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sp),
            proto, specs,
        )

    def case_field_whole():
        cfg = FieldConfig(action="phi4", shape=(256, 256), n_chains=2,
                          loops=4, seed=1)
        from stochquant_tpu.kernels import field_kernel

        ab = abstract_of(jax.eval_shape(lambda: field_mod.init_field_state(cfg)))
        jax.jit(
            lambda st: field_kernel.run_field_frames_pallas(st, act, cfg, 1)
        ).lower(ab).compile()

    def case_field_multiframe():
        cfg = FieldConfig(action="phi4", shape=(64, 128), n_chains=2, loops=4,
                          seed=1, frames_per_launch=3)
        from stochquant_tpu.kernels import field_kernel

        ab = abstract_of(jax.eval_shape(lambda: field_mod.init_field_state(cfg)))
        jax.jit(
            lambda st: field_kernel.run_field_frames_pallas(
                st, act, cfg, 3, frames_per_launch=3
            )
        ).lower(ab).compile()

    def case_tiled_2d():
        cfg = FieldConfig(action="phi4", shape=(1024, 1024), n_chains=1,
                          loops=4, seed=1)
        from stochquant_tpu.kernels import field_kernel_tiled

        ab = abstract_of(jax.eval_shape(lambda: field_mod.init_field_state(cfg)))
        jax.jit(
            lambda st: field_kernel_tiled.run_field_frames_tiled(st, act, cfg, 1)
        ).lower(ab).compile()

    def case_nd_unsharded():
        cfg = FieldConfig(action="phi4", shape=(32, 32, 32, 32), n_chains=1,
                          loops=4, seed=1)
        from stochquant_tpu.kernels import field_kernel_nd

        ab = abstract_of(jax.eval_shape(lambda: field_mod.init_field_state(cfg)))
        jax.jit(
            lambda st: field_kernel_nd.run_field_frames_nd(st, act, cfg, 1)
        ).lower(ab).compile()

    def case_nd_chunk_unsharded():
        # r4: the W-step chunk path for UNSHARDED D >= 3 lattices
        # (cfg.exchange_steps > 2): 2 MiB extended strips (tile_rows=8 +
        # 2*4 halo rows of 128 KiB each at 32^4) — probes whether Mosaic
        # accepts strips beyond the conservative 1 MiB budget
        cfg = FieldConfig(action="phi4", shape=(32, 32, 32, 32), n_chains=1,
                          loops=8, seed=1, exchange_steps=4)
        from stochquant_tpu.kernels import field_kernel_nd

        ab = abstract_of(jax.eval_shape(lambda: field_mod.init_field_state(cfg)))
        jax.jit(
            lambda st: field_kernel_nd.run_field_frames_nd(
                st, act, cfg, 1, tile_rows=8
            )
        ).lower(ab).compile()

    def case_nd_sharded():
        from stochquant_tpu.parallel.halo import make_halo_runner

        cfg = FieldConfig(action="phi4", shape=(32, 32, 32, 32), n_chains=2,
                          loops=4, seed=1, mesh_axes=("x", None, None, None))
        mesh = Mesh(devs.reshape(4), ("x",))
        runner = make_halo_runner(act, cfg, mesh, backend="pallas",
                                  interpret=False)
        jax.jit(lambda st: runner(st, 1)).lower(
            sharded_abstract(cfg, mesh)
        ).compile()

    def case_halo_step_2d():
        from stochquant_tpu.parallel.halo import make_halo_runner

        cfg = FieldConfig(action="phi4", shape=(256, 256), n_chains=2,
                          loops=4, seed=1, mesh_axes=("x", "y"))
        mesh = Mesh(devs.reshape(2, 2), ("x", "y"))
        runner = make_halo_runner(act, cfg, mesh, backend="pallas_step",
                                  interpret=False)
        jax.jit(lambda st: runner(st, 1)).lower(
            sharded_abstract(cfg, mesh)
        ).compile()

    def case_halo_md_2d():
        # multi-dim 2-D split through the generalized chunk kernel (r4):
        # halos on both lattice dims, trapezoidal recompute in-kernel
        from stochquant_tpu.parallel.halo import make_halo_runner

        cfg = FieldConfig(action="phi4", shape=(256, 256), n_chains=2,
                          loops=8, seed=1, mesh_axes=("x", "y"))
        mesh = Mesh(devs.reshape(2, 2), ("x", "y"))
        runner = make_halo_runner(act, cfg, mesh, backend="pallas",
                                  interpret=False)
        jax.jit(lambda st: runner(st, 1)).lower(
            sharded_abstract(cfg, mesh)
        ).compile()

    def case_halo_md_4d():
        # config 4's multi-dim geometry: 32^4 split on dims 0+1
        from stochquant_tpu.parallel.halo import make_halo_runner

        cfg = FieldConfig(action="phi4", shape=(32, 32, 32, 32), n_chains=1,
                          loops=4, seed=1, mesh_axes=("x", "y", None, None))
        mesh = Mesh(devs.reshape(2, 2), ("x", "y"))
        runner = make_halo_runner(act, cfg, mesh, backend="pallas",
                                  interpret=False)
        jax.jit(lambda st: runner(st, 1)).lower(
            sharded_abstract(cfg, mesh)
        ).compile()

    def case_halo_thin_4d():
        # thin-slab regime: halo deeper than the local slab → multi-hop
        # ring gather (config 4's 32^4/16-chip shape, emulated with W=16
        # on the 4-chip topology: H=16 > loc0=8; the slab is shrunk to
        # 16^3 so the 32-row-extended strip stays inside the VMEM budget)
        from stochquant_tpu.parallel.halo import make_halo_runner

        cfg = FieldConfig(action="phi4", shape=(32, 16, 16, 16), n_chains=1,
                          loops=16, seed=1, exchange_steps=16,
                          mesh_axes=("x", None, None, None))
        mesh = Mesh(devs.reshape(4), ("x",))
        runner = make_halo_runner(act, cfg, mesh, backend="pallas",
                                  interpret=False)
        jax.jit(lambda st: runner(st, 1)).lower(
            sharded_abstract(cfg, mesh)
        ).compile()

    def case_halo_rdma():
        # r4 (VERDICT r3 item 2): the kernel fetches its neighbour halos
        # itself via pltpu.make_async_remote_copy — compile for the 4-chip
        # ring and assert the RDMA survives into the Mosaic module
        from stochquant_tpu.parallel.halo import make_halo_runner

        for shape, axes in (
            ((256, 256), ("x", None)),
            ((32, 32, 32, 32), ("x", None, None, None)),
        ):
            cfg = FieldConfig(action="phi4", shape=shape, n_chains=2,
                              loops=4, seed=1, mesh_axes=axes)
            mesh = Mesh(devs.reshape(4), ("x",))
            runner = make_halo_runner(act, cfg, mesh, backend="pallas_rdma",
                                      interpret=False)
            compiled = (
                jax.jit(lambda st: runner(st, 1))
                .lower(sharded_abstract(cfg, mesh))
                .compile()
            )
            txt = compiled.as_text()
            assert "tpu_custom_call" in txt or "mosaic" in txt
            # no host-visible collective between micro-steps: the module
            # must NOT contain collective-permutes for the halo
            assert "collective-permute" not in txt, (
                "RDMA path should not lower halo exchange to XLA "
                "collective-permute"
            )

    def case_halo_pair_2d():
        from stochquant_tpu.parallel.halo import make_halo_runner

        cfg = FieldConfig(action="phi4", shape=(256, 256), n_chains=2,
                          loops=4, seed=1, mesh_axes=("x", None))
        mesh = Mesh(devs.reshape(4), ("x",))
        runner = make_halo_runner(act, cfg, mesh, backend="pallas_pair",
                                  interpret=False)
        jax.jit(lambda st: runner(st, 1)).lower(
            sharded_abstract(cfg, mesh)
        ).compile()

    def case_chain():
        from stochquant_tpu import actions as actions_mod
        from stochquant_tpu.config import ChainConfig
        from stochquant_tpu.integrators import langevin
        from stochquant_tpu.kernels import chain_kernel

        cact = actions_mod.get("double_well")
        for fpl in (1, 2):
            ccfg = ChainConfig(action="double_well", n_sites=200, dt=0.02,
                               dtau=2e-4, n_chains=256, loops=10, seed=1)
            ab = abstract_of(
                jax.eval_shape(lambda: langevin.init_chain_state(ccfg, cact))
            )
            jax.jit(
                lambda st: chain_kernel.run_frames_pallas(
                    st, cact, ccfg, 4, frames_per_launch=fpl
                )
            ).lower(ab).compile()

    def case_gauge():
        from stochquant_tpu.integrators import gauge as gauge_mod
        from stochquant_tpu.integrators.gauge import GaugeConfig
        from stochquant_tpu.kernels import gauge_kernel

        # (16, 128) = identity layout; (64, 64) = the r5 lane-packed
        # (32, 128) view (VERDICT r4 item 2) — both must Mosaic-compile
        for group, beta, dtau, shape in (
            ("u1", 1.0, 5e-3, (16, 128)), ("su2", 2.0, 2e-3, (16, 128)),
            ("su3", 5.0, 1e-3, (16, 128)), ("u1", 1.0, 5e-3, (64, 64)),
            ("su2", 2.0, 2e-3, (64, 64)), ("su3", 5.0, 1e-3, (64, 64)),
        ):
            gcfg = GaugeConfig(group=group, beta=beta, shape=shape,
                               n_chains=2, dtau=dtau, loops=4, seed=1,
                               grow_after=10**9)
            gact = gauge_mod.resolve_gauge_action(gcfg)
            proto = jax.eval_shape(
                lambda: gauge_mod.init_gauge_state(gcfg, gact)
            )
            ab = abstract_of(proto)
            # multi-frame epilogue covers every fused group since r4
            jax.jit(
                lambda st: gauge_kernel.run_gauge_frames_pallas(
                    st, gact, gcfg, 2, frames_per_launch=2
                )
            ).lower(ab).compile()

    def case_gauge_chunk():
        # r5 (VERDICT r4 item 3): the fused gauge chunk runner — one launch
        # per W micro-steps on the halo-extended block, dim-0 ring; compile
        # for a 4-chip ring (u1, identity layout) and a 2-chip ring (su3,
        # lane-packed extended block)
        from stochquant_tpu.integrators import gauge as gauge_mod
        from stochquant_tpu.integrators.gauge import GaugeConfig
        from stochquant_tpu.parallel.gauge_halo import (
            gauge_state_sharding,
            make_gauge_chunk_runner,
        )
        import jax.tree as jt2

        for group, beta, dtau, shape, ring in (
            ("u1", 1.0, 5e-3, (256, 256), 4),
            ("su3", 5.0, 1e-3, (64, 64), 2),
        ):
            gcfg = GaugeConfig(group=group, beta=beta, shape=shape,
                               n_chains=2, dtau=dtau, loops=8, seed=1,
                               grow_after=10**9, mesh_axes=("x", None))
            gact = gauge_mod.resolve_gauge_action(gcfg)
            mesh = Mesh(devs.reshape(4)[:ring], ("x",))
            runner = make_gauge_chunk_runner(gact, gcfg, mesh,
                                             interpret=False)
            specs = gauge_state_sharding(gact, mesh, gcfg)
            proto = jax.eval_shape(
                lambda: gauge_mod.init_gauge_state(gcfg, gact)
            )
            ab = jt2.map(
                lambda l, sp: jax.ShapeDtypeStruct(l.shape, l.dtype,
                                                   sharding=sp),
                proto, specs,
            )
            jax.jit(lambda st: runner(st, 1)).lower(ab).compile()

    cases = {
        "field_whole": case_field_whole,
        "gauge_chunk": case_gauge_chunk,
        "field_multiframe": case_field_multiframe,
        "tiled_2d": case_tiled_2d,
        "nd_unsharded": case_nd_unsharded,
        "nd_chunk_unsharded": case_nd_chunk_unsharded,
        "nd_sharded": case_nd_sharded,
        "halo_step_2d": case_halo_step_2d,
        "halo_md_2d": case_halo_md_2d,
        "halo_md_4d": case_halo_md_4d,
        "halo_thin_4d": case_halo_thin_4d,
        "halo_rdma": case_halo_rdma,
        "halo_pair_2d": case_halo_pair_2d,
        "chain": case_chain,
        "gauge": case_gauge,
    }
    wanted = sys.argv[1:] or list(cases)
    failed = []
    for name in wanted:
        try:
            cases[name]()
            print(f"{name}: OK", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
