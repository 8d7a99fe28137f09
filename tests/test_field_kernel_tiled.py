"""Tiled (HBM-resident) field kernel vs the XLA integrator path.

The trajectory must be bit-identical (same global-(site,step) Threefry
noise, same elementwise update order) and invariant under the choice of
tile_rows; observable running means agree to fp32 reduction-order
tolerance; accept/reject decisions and the final state after a rejected
frame match exactly (the tiled path does not freeze mid-frame — the
rollback makes that unobservable)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stochquant_tpu.actions import phi4
from stochquant_tpu.config import FieldConfig, Sweep
from stochquant_tpu.integrators import field as fi
from stochquant_tpu.kernels import field_kernel_tiled as fkt


def _mk(sweep, **kw):
    kw.setdefault("shape", (16, 16))
    kw.setdefault("n_chains", 3)
    kw.setdefault("dtau", 5e-3)
    kw.setdefault("loops", 6)
    kw.setdefault("seed", 9)
    return FieldConfig(action="phi4", sweep=sweep, **kw)


@pytest.mark.parametrize("sweep", [Sweep.SYNC, Sweep.CHECKERBOARD])
def test_tiled_matches_xla_path(sweep):
    cfg = _mk(sweep)
    act = phi4.get_field(cfg.action)
    s0 = fi.init_field_state(cfg)
    want, wm = fi.run_field_frames(s0, act, cfg, 2)
    got, gm = fkt.run_field_frames_tiled(s0, act, cfg, 2, tile_rows=8, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.phi), np.asarray(want.phi))
    np.testing.assert_array_equal(np.asarray(gm["stable"]), np.asarray(wm["stable"]))
    np.testing.assert_array_equal(np.asarray(got.lrg_vl), np.asarray(want.lrg_vl))
    np.testing.assert_array_equal(np.asarray(got.dtau), np.asarray(want.dtau))
    np.testing.assert_array_equal(np.asarray(got.runs), np.asarray(want.runs))
    for name in ("mag_mean", "mag2_mean", "absmag_mean", "phi2_mean",
                 "act_mean", "corr_mean"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=2e-5, atol=1e-6, err_msg=name,
        )


def test_tiled_invariant_under_tile_rows():
    cfg = _mk(Sweep.SYNC)
    act = phi4.get_field(cfg.action)
    s0 = fi.init_field_state(cfg)
    a, _ = fkt.run_field_frames_tiled(s0, act, cfg, 2, tile_rows=8, interpret=True)
    b, _ = fkt.run_field_frames_tiled(s0, act, cfg, 2, tile_rows=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.phi), np.asarray(b.phi))
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-5, atol=1e-6
        )


def test_tiled_rejected_frame_matches_xla_rollback():
    """A frame that trips the divergence detector must end bitwise-identical
    to the XLA path even though the tiled path keeps evolving after the trip
    (rollback discards everything)."""
    cfg = _mk(Sweep.SYNC, dtau=50.0, loops=4)  # wildly unstable
    act = phi4.get_field(cfg.action)
    s0 = fi.init_field_state(cfg)
    want, wm = fi.run_field_frames(s0, act, cfg, 1)
    got, gm = fkt.run_field_frames_tiled(s0, act, cfg, 1, tile_rows=8, interpret=True)
    assert not np.asarray(wm["stable"]).all()  # the frame really tripped
    np.testing.assert_array_equal(np.asarray(gm["stable"]), np.asarray(wm["stable"]))
    for x, y in zip(got, want):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tiled_validation_errors():
    act = phi4.get_field("phi4")
    cfg = _mk(Sweep.SYNC, loops=5)
    s0 = fi.init_field_state(cfg)
    with pytest.raises(ValueError, match="even loops"):
        fkt.field_frame_tiled(s0, act, cfg, tile_rows=8, interpret=True)
    cfg = _mk(Sweep.SYNC)
    s0 = fi.init_field_state(cfg)
    with pytest.raises(ValueError, match="divide"):
        fkt.field_frame_tiled(s0, act, cfg, tile_rows=24, interpret=True)
