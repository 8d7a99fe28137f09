"""Fused 2-D field kernel vs the XLA field integrator (interpret mode)."""

import dataclasses

import numpy as np
import pytest

from stochquant_tpu.actions import phi4
from stochquant_tpu.config import FieldConfig, Sweep
from stochquant_tpu.integrators import field
from stochquant_tpu.kernels import field_kernel


@pytest.mark.parametrize("sweep", [Sweep.SYNC, Sweep.CHECKERBOARD])
def test_field_kernel_matches_xla(sweep):
    cfg = FieldConfig(
        action="phi4",
        shape=(16, 128),
        dtau=0.005,
        n_chains=3,
        loops=9,  # odd: exercises the tail substep
        seed=23,
        sweep=sweep,
    )
    act = phi4.get_field("phi4")
    s0 = field.init_field_state(cfg)
    ref, ref_m = field.run_field_frames(s0, act, cfg, 2)
    out, out_m = field_kernel.run_field_frames_pallas(s0, act, cfg, 2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ref_m["stable"]), np.asarray(out_m["stable"])
    )
    for name in FieldState_fields():
        a, b = getattr(ref, name), getattr(out, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6, err_msg=name
        )


def FieldState_fields():
    return [
        "phi", "mag_mean", "mag2_mean", "absmag_mean", "phi2_mean",
        "act_mean", "corr_mean", "runs", "dtau", "lrg_vl",
    ]


def test_field_kernel_rejects_non_2d():
    cfg = FieldConfig(action="phi4", shape=(4, 4, 4), n_chains=1)
    act = phi4.get_field("phi4")
    with pytest.raises(ValueError):
        field_kernel._build_kernel(act, cfg)


def test_field_hardware_rng_statistics():
    """Hardware-PRNG fast path (TPU-only): trajectories differ from the
    Threefry contract by design, but the free-field stationary ⟨φ²⟩ must
    match the exact propagator sum, and runs must be reproducible for a
    fixed seed + chain assignment."""
    import jax
    import pytest

    if jax.devices()[0].platform == "cpu":
        pytest.skip("hardware PRNG path requires a TPU")

    import numpy as np

    from stochquant_tpu.actions import phi4 as phi4_mod
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.kernels import field_kernel
    from stochquant_tpu.observables import exact

    cfg = FieldConfig(action="free_field", shape=(128, 128), dtau=0.05,
                      n_chains=8, loops=100, seed=3, grow_after=10**9,
                      rng_impl="hardware")
    act = phi4_mod.get_field("free_field", m2=1.0)
    s = field_mod.init_field_state(cfg)
    s, _ = field_kernel.run_field_frames_pallas(s, act, cfg, 10)
    s = field_mod.reset_field_means(s)
    s, m = field_kernel.run_field_frames_pallas(s, act, cfg, 30)
    assert np.asarray(m["stable"])[-1].all()
    theory = exact.free_field_x2(cfg.shape, cfg.spacing, 1.0, dtau=cfg.dtau)
    est = np.asarray(s.phi2_mean, np.float64)
    err = est.std() / np.sqrt(cfg.n_chains)
    assert abs(est.mean() - theory) < 6 * err + 1e-3, (est.mean(), theory)
    a, _ = field_kernel.run_field_frames_pallas(
        field_mod.init_field_state(cfg), act, cfg, 2
    )
    b, _ = field_kernel.run_field_frames_pallas(
        field_mod.init_field_state(cfg), act, cfg, 2
    )
    np.testing.assert_array_equal(np.asarray(a.phi), np.asarray(b.phi))


def test_tiled_rejects_hardware_rng():
    import dataclasses

    import pytest

    from stochquant_tpu.actions import phi4 as phi4_mod
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field as field_mod
    from stochquant_tpu.kernels import field_kernel_tiled as fkt

    cfg = FieldConfig(action="phi4", shape=(16, 128), loops=4, n_chains=1,
                      tile_rows=8, rng_impl="hardware")
    act = phi4_mod.get_field(cfg.action)
    s0 = field_mod.init_field_state(cfg)
    with pytest.raises(ValueError, match="counter-based"):
        fkt.field_frame_tiled(s0, act, cfg, tile_rows=8, interpret=True)


def test_field_multiframe_matches_single_frame_launches():
    """K frames per launch with the IN-KERNEL epilogue vs K single-frame
    launches: same Threefry counters and epilogue expressions — decisions
    (accept/reject, runs, stab_cnt) exact, float state to ~1 ulp (XLA fuses
    the two program shapes with different FMA contractions)."""
    cfg = FieldConfig(action="phi4", shape=(8, 128), dtau=0.003, n_chains=3,
                      loops=5, seed=7)
    act = phi4.get_field("phi4")
    s0 = field.init_field_state(cfg)
    a, ma = field_kernel.run_field_frames_pallas(s0, act, cfg, 7, interpret=True)
    b, mb = field_kernel.run_field_frames_pallas(
        s0, act, cfg, 7, interpret=True, frames_per_launch=3
    )  # 2 multi-launches + 1 single-frame tail
    exact = ("runs", "stab_cnt", "step")
    for name, x, y in zip(a._fields, a, b):
        if name in exact:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
        else:
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=3e-6, atol=3e-6, err_msg=name
            )
    np.testing.assert_array_equal(
        np.asarray(ma["stable"]), np.asarray(mb["stable"])
    )
    np.testing.assert_allclose(
        np.asarray(ma["dtau"]), np.asarray(mb["dtau"]), rtol=1e-6
    )


def test_field_multiframe_rejection_schedule():
    """Rejected frames revert in-kernel exactly like the XLA epilogue: Δτ
    shrink schedule, frozen means, runs not counted."""
    cfg = FieldConfig(action="phi4", shape=(8, 128), dtau=0.5, n_chains=3,
                      loops=4, seed=2)
    act = phi4.get_field("phi4")
    s0 = field.init_field_state(cfg)
    a, ma = field_kernel.run_field_frames_pallas(s0, act, cfg, 4, interpret=True)
    b, mb = field_kernel.run_field_frames_pallas(
        s0, act, cfg, 4, interpret=True, frames_per_launch=2
    )
    assert (~np.asarray(ma["stable"])).any(), "test needs rejections"
    np.testing.assert_array_equal(
        np.asarray(ma["stable"]), np.asarray(mb["stable"])
    )
    np.testing.assert_array_equal(np.asarray(a.runs), np.asarray(b.runs))
    np.testing.assert_array_equal(np.asarray(a.stab_cnt), np.asarray(b.stab_cnt))
    np.testing.assert_allclose(np.asarray(a.dtau), np.asarray(b.dtau), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.phi), np.asarray(b.phi), rtol=3e-6, atol=3e-6
    )


def test_runtime_field_multiframe_matches_single(tmp_path):
    """runtime.run_field honours FieldConfig.frames_per_launch (the in-kernel
    epilogue path) and matches the single-frame-launch run."""
    from stochquant_tpu import metrics, runtime

    base = FieldConfig(action="phi4", shape=(8, 128), dtau=0.003, n_chains=2,
                       loops=4, frames=5, seed=9)
    a = runtime.run_field(base, backend="pallas", sink=metrics.MetricsSink())
    multi = dataclasses.replace(base, frames_per_launch=2)
    b = runtime.run_field(multi, backend="pallas", sink=metrics.MetricsSink())
    for name, x, y in zip(a.state._fields, a.state, b.state):
        if name in ("runs", "stab_cnt", "step"):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
        else:
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=3e-6, atol=3e-6, err_msg=name
            )
