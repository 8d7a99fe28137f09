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
