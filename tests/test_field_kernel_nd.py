"""D-dim (D >= 3) tiled Pallas kernel vs the XLA integrator (interpret
mode): trajectory + trip decisions bitwise, observables to tolerance,
tile-size invariance.  Config 4's 32^4 fused path (VERDICT r2 item 3)."""

import dataclasses

import numpy as np
import pytest

from stochquant_tpu.actions import phi4
from stochquant_tpu.config import FieldConfig, Sweep
from stochquant_tpu.integrators import field
from stochquant_tpu.kernels import field_kernel_nd


def _cfg(**kw):
    base = dict(
        action="phi4", shape=(8, 8, 4, 4), dtau=0.01, n_chains=2, loops=4,
        seed=9,
    )
    base.update(kw)
    return FieldConfig(**base)


@pytest.mark.parametrize(
    "shape,tile,sweep",
    [
        ((8, 8, 4, 4), 8, Sweep.SYNC),   # whole-lattice (periodic) regime
        ((8, 8, 4, 4), 2, Sweep.SYNC),   # halo-slab strips
        ((8, 8, 4, 4), 4, Sweep.CHECKERBOARD),
        ((8, 8, 16), 4, Sweep.SYNC),     # 3-D, unflattened lane dim
    ],
)
def test_nd_kernel_matches_xla(shape, tile, sweep):
    cfg = _cfg(shape=shape, sweep=sweep)
    act = phi4.get_field("phi4")
    s0 = field.init_field_state(cfg)
    ref, mref = field.run_field_frames(s0, act, cfg, 2)
    out, mout = field_kernel_nd.run_field_frames_nd(
        s0, act, cfg, 2, tile_rows=tile, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref.phi), np.asarray(out.phi))
    np.testing.assert_array_equal(
        np.asarray(mref["stable"]), np.asarray(mout["stable"])
    )
    for name in ("phi2_mean", "mag_mean", "mag2_mean", "act_mean"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(out, name)),
            rtol=1e-5, atol=1e-7, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(ref.corr_mean), np.asarray(out.corr_mean), rtol=1e-4, atol=1e-6
    )


def test_nd_kernel_tile_invariance():
    """The trajectory must not depend on the tile size (halo slabs are
    recomputed redundantly with the same global counters)."""
    cfg = _cfg()
    act = phi4.get_field("phi4")
    s0 = field.init_field_state(cfg)
    a, _ = field_kernel_nd.run_field_frames_nd(s0, act, cfg, 2, tile_rows=8, interpret=True)
    b, _ = field_kernel_nd.run_field_frames_nd(s0, act, cfg, 2, tile_rows=2, interpret=True)
    exact = ("phi", "runs", "dtau", "stab_cnt", "lrg_vl", "step")
    for name, x, y in zip(a._fields, a, b):
        if name in exact:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
        else:
            # per-strip partial sums regroup with the tile count — the
            # trajectory and trip decisions are exact, sums are ulp-level
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7, err_msg=name
            )


def test_nd_kernel_validation_and_default_tile():
    act = phi4.get_field("phi4")
    s0 = field.init_field_state(_cfg())
    with pytest.raises(ValueError, match="even"):
        field_kernel_nd.run_field_frames_nd(
            s0, act, _cfg(loops=3), 1, interpret=True
        )
    with pytest.raises(ValueError, match="threefry"):
        field_kernel_nd.run_field_frames_nd(
            s0, act, _cfg(rng_impl="hardware"), 1, interpret=True
        )
    # 32^4 exceeds the strip budget: the default tile splits dim 0
    t = field_kernel_nd.default_tile_rows(
        _cfg(shape=(32, 32, 32, 32))
    )
    assert 1 <= t < 32 and 32 % t == 0
    # a small lattice stays whole (periodic fast regime)
    assert field_kernel_nd.default_tile_rows(_cfg(shape=(8, 8, 4, 4))) == 8


def test_runtime_routes_4d_to_nd_kernel():
    from stochquant_tpu import runtime

    sel = runtime.select_field_backend
    cfg4 = _cfg(shape=(16, 8, 4, 4), loops=4)
    assert sel(cfg4, "auto", on_tpu=True, use_halo=False) == "pallas_nd"
    assert sel(cfg4, "auto", on_tpu=False, use_halo=False) == "xla"
    assert sel(cfg4, "pallas", on_tpu=True, use_halo=False) == "pallas_nd"
    # odd loops / hardware rng fall back on auto
    assert sel(_cfg(loops=3), "auto", on_tpu=True, use_halo=False) == "xla"
    assert (
        sel(_cfg(rng_impl="hardware"), "auto", on_tpu=True, use_halo=False)
        == "xla"
    )
    with pytest.raises(ValueError, match="pallas_nd"):
        sel(FieldConfig(shape=(16, 128)), "pallas_nd", on_tpu=True, use_halo=False)


def test_runtime_routes_sharded_4d_to_composed_kernel():
    """auto + halo runner on a D>=3 lattice: every admissible split geometry
    — dim-0-only, multi-dim, AND thin slabs (multi-hop halo gather) — routes
    to the composed chunk kernel ('pallas'); config 4's real pod geometry no
    longer forfeits the kernel path (VERDICT r3 item 1)."""
    import dataclasses

    from stochquant_tpu import runtime
    from stochquant_tpu.parallel import make_mesh

    sel = runtime.select_field_backend
    mesh = make_mesh([("x", 2)])
    # on_tpu routing builds real (non-interpret) kernels: shapes must meet
    # the Mosaic DMA tiling rules (lane extent 4*32=128, sublane 8)
    cfg = _cfg(shape=(16, 8, 4, 32), loops=4)
    c_dim0 = dataclasses.replace(cfg, mesh_axes=("x", None, None, None))
    assert sel(c_dim0, "auto", on_tpu=True, use_halo=True, mesh=mesh) == "pallas"
    assert sel(c_dim0, "auto", on_tpu=False, use_halo=True, mesh=mesh) == "xla"
    mesh2 = make_mesh([("x", 2), ("y", 2)])
    c_multi = dataclasses.replace(cfg, mesh_axes=("x", "y", None, None))
    assert sel(c_multi, "auto", on_tpu=True, use_halo=True, mesh=mesh2) == "pallas"
    # slab thinner than the halo depth: multi-hop gather keeps the kernel
    mesh8 = make_mesh([("x", 8)])
    c_thin = dataclasses.replace(
        cfg, shape=(8, 8, 4, 32), mesh_axes=("x", None, None, None)
    )
    assert sel(c_thin, "auto", on_tpu=True, use_halo=True, mesh=mesh8) == "pallas"
    # an UNALIGNED lane extent (4*4=16 lanes) is not device-admissible:
    # routed to xla with a notice instead of a Mosaic compile failure
    notes0 = []
    c_unaligned = dataclasses.replace(
        cfg, shape=(16, 8, 4, 4), mesh_axes=("x", None, None, None)
    )
    assert (
        sel(c_unaligned, "auto", on_tpu=True, use_halo=True, mesh=mesh,
            notices=notes0)
        == "xla"
    )
    assert notes0
    # pure chain-DP mesh: whole-frame nd kernel per shard
    c_dp = dataclasses.replace(cfg, mesh_axes=(None,) * 4, mesh_chain_axis="chain")
    meshc = make_mesh([("chain", 2)])
    assert sel(c_dp, "auto", on_tpu=True, use_halo=True, mesh=meshc) == "pallas"
    # inadmissible split (odd loops): downgrade is NOT silent (r3 weak #2)
    notes = []
    c_odd = dataclasses.replace(c_multi, loops=5)
    assert (
        sel(c_odd, "auto", on_tpu=True, use_halo=True, mesh=mesh2, notices=notes)
        == "xla"
    )
    assert notes and "chunk" in notes[0]


def test_tile_rows_autotune(tmp_path):
    """tile_rows=0 autotunes the dim-0 tile through runtime.run_field
    (interpret): result matches an explicit-tile run bitwise and the
    winner is a valid divisor."""
    import dataclasses

    from stochquant_tpu import metrics, runtime
    from stochquant_tpu.kernels import autotune

    cfg = _cfg(shape=(8, 8, 4, 4), loops=4, tile_rows=0)
    cfg = dataclasses.replace(cfg, frames=2)
    act = phi4.get_field(cfg.action)
    autotune.clear_cache()
    t = autotune.best_tile_rows(
        act, dataclasses.replace(cfg, tile_rows=None), candidates=(4, 8),
        interpret=True,
    )
    assert t in (4, 8)
    a = runtime.run_field(cfg, backend="pallas", sink=metrics.MetricsSink())
    b = runtime.run_field(
        dataclasses.replace(cfg, tile_rows=None), backend="pallas",
        sink=metrics.MetricsSink(),
    )
    # tile size changes blocking, not semantics: bitwise regardless
    np.testing.assert_array_equal(np.asarray(a.state.phi), np.asarray(b.state.phi))
