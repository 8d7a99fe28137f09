"""Pallas chain kernel (interpret mode on CPU) vs the XLA integrator:
identical Threefry counters and op order → trajectories must agree."""

import numpy as np
import pytest

from stochquant_tpu import actions
from stochquant_tpu.config import BoundaryCondition, ChainConfig, Formulation
from stochquant_tpu.integrators import langevin
from stochquant_tpu.kernels import chain_kernel


CASES = {
    "double_well_bg": ChainConfig(
        action="double_well",
        n_sites=128,  # no padding: strict comparison
        dt=0.05,
        dtau=0.001,
        n_chains=8,
        loops=20,
        seed=11,
    ),
    "harmonic_periodic": ChainConfig(
        action="harmonic",
        n_sites=128,
        dt=0.2,
        dtau=0.01,
        n_chains=8,
        loops=20,
        bc=BoundaryCondition.PERIODIC,
        formulation=Formulation.DIRECT,
        seed=12,
    ),
    "anharmonic_padded": ChainConfig(
        action="anharmonic",
        n_sites=100,  # padded to 128 in-kernel
        dt=0.3,
        dtau=0.005,
        n_chains=8,
        loops=15,
        bc=BoundaryCondition.PERIODIC,
        formulation=Formulation.DIRECT,
        seed=13,
    ),
    "harmonic_dirichlet": ChainConfig(
        action="harmonic",
        n_sites=96,
        dt=0.2,
        dtau=0.01,
        n_chains=8,
        loops=10,
        bc=BoundaryCondition.DIRICHLET,
        formulation=Formulation.DIRECT,
        seed=14,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_kernel_matches_xla_path(name):
    cfg = CASES[name]
    act = actions.get(cfg.action)
    s0 = langevin.init_chain_state(cfg, act)
    if cfg.bc == BoundaryCondition.DIRICHLET:
        s0 = s0._replace(f=s0.f.at[:, 0].set(0.0).at[:, -1].set(0.0))
    ref, ref_m = langevin.run_frames(s0, act, cfg, 3)
    out, out_m = chain_kernel.run_frames_pallas(
        s0, act, cfg, 3, block_chains=4, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ref_m["stable"]), np.asarray(out_m["stable"])
    )
    for field in ChainState_fields():
        a, b = getattr(ref, field), getattr(out, field)
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            rtol=2e-6,
            atol=2e-6,
            err_msg=f"{name}:{field}",
        )


def ChainState_fields():
    return ["f", "omega", "x_mean", "xx0_mean", "x2_mean", "runs", "dtau", "lrg_vl"]


def test_kernel_chain_block_invariance():
    """Tiling the chain batch into different grid blocks must not change
    results (noise is keyed by global chain id)."""
    cfg = CASES["double_well_bg"]
    act = actions.get(cfg.action)
    s0 = langevin.init_chain_state(cfg, act)
    a, _ = chain_kernel.run_frames_pallas(s0, act, cfg, 2, block_chains=8, interpret=True)
    b, _ = chain_kernel.run_frames_pallas(s0, act, cfg, 2, block_chains=2, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hardware_rng_statistics():
    """Hardware-PRNG fast path: trajectories differ from the Threefry
    contract by design, but the stationary ⟨x²⟩ must still match the exact
    EM covariance (validates the generated distribution end to end).

    TPU-only: pltpu.prng_seed has no CPU interpret lowering in this JAX."""
    import dataclasses

    import jax

    if jax.devices()[0].platform == "cpu":
        pytest.skip("hardware PRNG path requires a TPU")

    from stochquant_tpu.config import BoundaryCondition, Formulation
    from stochquant_tpu.observables import exact

    cfg = ChainConfig(
        action="harmonic",
        n_sites=128,
        dt=0.25,
        dtau=0.02,
        n_chains=64,
        loops=100,
        bc=BoundaryCondition.PERIODIC,
        formulation=Formulation.DIRECT,
        seed=3,
        grow_after=10**9,
        rng_impl="hardware",
    )
    act = actions.get(cfg.action)
    s = langevin.init_chain_state(cfg, act)
    s, _ = chain_kernel.run_frames_pallas(s, act, cfg, 15, block_chains=32)
    s = langevin.reset_means(s)
    s, m = chain_kernel.run_frames_pallas(s, act, cfg, 40, block_chains=32)
    assert np.asarray(m["stable"])[-1].all()
    B = exact.harmonic_drift_matrix(cfg.n_sites, cfg.dt, k=2.0, bc=cfg.bc)
    sigma = exact.em_stationary_cov(B, cfg.dt, cfg.dtau)
    x2 = np.asarray(s.x2_mean, np.float64)
    mean = x2.mean()
    err = x2.mean(axis=1).std() / np.sqrt(cfg.n_chains)
    assert abs(mean - np.diag(sigma).mean()) < 6 * err + 2e-3, (mean, np.diag(sigma).mean())
    # reproducible for the same config+blocking
    s2 = langevin.init_chain_state(cfg, act)
    a, _ = chain_kernel.run_frames_pallas(s2, act, cfg, 2, block_chains=32)
    b, _ = chain_kernel.run_frames_pallas(s2, act, cfg, 2, block_chains=32)
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))


def test_multiframe_kernel_matches_single_frame_launches():
    """K frames per launch with the IN-KERNEL epilogue (VERDICT r2 item 7)
    vs K single-frame launches: same Threefry counters and epilogue
    expressions — decisions (accept/reject, runs, stab_cnt) exact, float
    state to 1-ulp (XLA fuses the two program shapes with different FMA
    contractions)."""
    cfg = ChainConfig(action="double_well", n_sites=32, dt=0.05, dtau=1e-4,
                      n_chains=4, loops=6, seed=5)
    act = actions.get(cfg.action)
    s0 = langevin.init_chain_state(cfg, act)

    a, ma = chain_kernel.run_frames_pallas(s0, act, cfg, 7, interpret=True)
    b, mb = chain_kernel.run_frames_pallas(
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


def test_multiframe_kernel_rejection_schedule():
    """Rejected frames must revert in-kernel exactly like the XLA epilogue:
    Δτ shrink schedule, frozen means, runs not counted."""
    cfg = ChainConfig(action="double_well", n_sites=32, dt=0.05, dtau=0.05,
                      n_chains=4, loops=6, seed=5)
    act = actions.get(cfg.action)
    s0 = langevin.init_chain_state(cfg, act)
    a, ma = chain_kernel.run_frames_pallas(s0, act, cfg, 6, interpret=True)
    b, mb = chain_kernel.run_frames_pallas(
        s0, act, cfg, 6, interpret=True, frames_per_launch=2
    )
    assert (~np.asarray(ma["stable"])).any(), "test needs rejections"
    np.testing.assert_array_equal(
        np.asarray(ma["stable"]), np.asarray(mb["stable"])
    )
    np.testing.assert_array_equal(np.asarray(a.runs), np.asarray(b.runs))
    np.testing.assert_array_equal(np.asarray(a.stab_cnt), np.asarray(b.stab_cnt))
    np.testing.assert_allclose(
        np.asarray(a.dtau), np.asarray(b.dtau), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.f), np.asarray(b.f), rtol=3e-6, atol=3e-6
    )


def test_autotune_block_chains_picks_divisor_and_caches():
    """Autotune measures the candidates in interpret mode and caches per
    (config, device) — product wiring via ChainConfig.block_chains = 0."""
    from stochquant_tpu.kernels import autotune

    cfg = ChainConfig(action="harmonic", n_sites=16, dt=0.2, dtau=0.01,
                      n_chains=8, loops=2, seed=1,
                      bc=BoundaryCondition.PERIODIC,
                      formulation=Formulation.DIRECT)
    act = actions.get("harmonic")
    autotune.clear_cache()
    best = autotune.best_block_chains(act, cfg, candidates=(2, 4), interpret=True)
    assert best in (2, 4)
    assert cfg.n_chains % best == 0
    # cached: second call returns instantly with the same answer
    assert autotune.best_block_chains(
        act, cfg, candidates=(2, 4), interpret=True
    ) == best
    # runtime path: block_chains=0 triggers autotune, result still matches XLA
    import dataclasses as _dc

    import numpy as np

    from stochquant_tpu import metrics, runtime
    from stochquant_tpu.integrators import langevin

    cfg_rt = _dc.replace(cfg, frames=2, block_chains=0)
    out = runtime.run_chain(cfg_rt, backend="pallas", sink=metrics.MetricsSink())
    s0 = langevin.init_chain_state(cfg_rt, act)
    ref, _ = langevin.run_frames(s0, act, cfg_rt, 2)
    np.testing.assert_allclose(
        np.asarray(out.state.f), np.asarray(ref.f), rtol=3e-6, atol=3e-6
    )
