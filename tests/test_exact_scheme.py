"""Scheme.EXACT — the exact Ornstein–Uhlenbeck propagator for linearized
(BACKGROUND, frozen-ω) chains: zero integration bias at ANY Δτ, gated
against the Δτ→0 target covariance (where EM/Heun would be unstable or
biased), plus Δτ-independence and validation surfaces."""

import numpy as np
import pytest

from stochquant_tpu import actions
from stochquant_tpu.config import (
    BoundaryCondition,
    ChainConfig,
    Formulation,
    Scheme,
)
from stochquant_tpu.integrators import langevin
from stochquant_tpu.observables import exact


def _z(sim, theory, n_chains):
    est = sim.mean(0)
    se = sim.std(0) / np.sqrt(n_chains)
    return np.abs(est - theory) / (se + 1e-12)


def _run(cfg, act, burn, frames):
    s = langevin.init_chain_state(cfg, act)
    s, _ = langevin.run_frames(s, act, cfg, burn)
    s = langevin.reset_means(s)
    s, m = langevin.run_frames(s, act, cfg, frames)
    assert np.all(np.asarray(m["stable"]))
    # EXACT never adapts Δτ
    np.testing.assert_array_equal(
        np.asarray(s.dtau), np.full(cfg.n_chains, np.float32(cfg.dtau))
    )
    return s


def test_exact_scheme_hits_target_cov_at_huge_dtau():
    """Δτ·b_max ≈ 400 — EM/Heun/LM all explode (stability needs Δτ·b < 2);
    the exact propagator samples the continuum-τ Gaussian regardless.  Gate
    ⟨x²⟩ against diag(B⁻¹)/Δt and ⟨x⁴⟩ against 3σ⁴ per site."""
    cfg = ChainConfig(
        action="harmonic", n_sites=32, dt=0.1, dtau=2.0, n_chains=128,
        loops=20, seed=41, scheme=Scheme.EXACT,
        formulation=Formulation.BACKGROUND, bc=BoundaryCondition.PERIODIC,
    )
    act = actions.get("harmonic")
    B = exact.harmonic_drift_matrix(cfg.n_sites, cfg.dt, bc=cfg.bc)
    assert cfg.dtau * np.linalg.eigvalsh(B).max() > 100.0  # EM-impossible
    s = _run(cfg, act, burn=3, frames=40)
    sig2 = np.diag(exact.target_cov(B, cfg.dt))
    z2 = _z(np.asarray(s.x2_mean, np.float64), sig2, cfg.n_chains)
    z4 = _z(np.asarray(s.x4_mean, np.float64), 3.0 * sig2**2, cfg.n_chains)
    assert z2.max() < 6.0, z2.max()
    assert z4.max() < 6.0, z4.max()


def test_exact_scheme_is_dtau_independent():
    """The transition law is exact at every Δτ: two runs that differ only in
    Δτ (400× apart) must agree on the stationary ⟨x²⟩ within error bars."""
    base = dict(
        action="harmonic", n_sites=24, dt=0.2, n_chains=96, loops=20,
        seed=17, scheme=Scheme.EXACT, formulation=Formulation.BACKGROUND,
        bc=BoundaryCondition.PERIODIC,
    )
    act = actions.get("harmonic")
    res = {}
    for dtau in (0.01, 4.0):
        cfg = ChainConfig(**base, dtau=dtau)
        s = _run(cfg, act, burn=10, frames=40)
        res[dtau] = np.asarray(s.x2_mean, np.float64)
    B = exact.harmonic_drift_matrix(base["n_sites"], base["dt"], bc=BoundaryCondition.PERIODIC)
    sig2 = np.diag(exact.target_cov(B, base["dt"]))
    for dtau, x2 in res.items():
        z = _z(x2, sig2, base["n_chains"])
        assert z.max() < 6.0, (dtau, z.max())


def test_exact_scheme_double_well_frozen_omega_mean_and_cov():
    """Full BACKGROUND machinery at a Δτ far beyond EM stability: kink
    background, FIXED_BG ghost sources, per-chain frozen ω — mean must hit
    μ + x_cl and the covariance the unbiased B⁻¹/Δt (not the EM-biased
    one)."""
    import jax.numpy as jnp

    cfg = ChainConfig(
        action="double_well", n_sites=24, dt=0.05, dtau=1.0, n_chains=128,
        loops=20, seed=7, scheme=Scheme.EXACT,
        formulation=Formulation.BACKGROUND, bc=BoundaryCondition.FIXED_BG,
        parisi=False,
    )
    act = actions.get("double_well")
    om0 = 0.5 * (cfg.n_sites - 1) * cfg.dt

    t = np.arange(cfg.n_sites) * cfg.dt
    x_cl = np.asarray(act.x_cl(t, om0), np.float64)
    ddv = np.asarray(act.ddV(x_cl), np.float64)
    inv = act.mass / cfg.dt**2
    B = np.diag(2.0 * inv + ddv)
    i_ = np.arange(cfg.n_sites - 1)
    B[i_, i_ + 1] = -inv
    B[i_ + 1, i_] = -inv
    assert cfg.dtau * np.linalg.eigvalsh(B).max() > 100.0  # EM-impossible
    gl = act.boundary_asymptote(-1) - float(np.asarray(act.x_cl(-cfg.dt, om0)))
    gr = act.boundary_asymptote(+1) - float(
        np.asarray(act.x_cl(cfg.n_sites * cfg.dt, om0))
    )
    src = np.zeros(cfg.n_sites)
    src[0] = inv * gl
    src[-1] = inv * gr
    mu = np.linalg.solve(B, src)
    sig2 = np.diag(exact.target_cov(B, cfg.dt))

    s = langevin.init_chain_state(cfg, act)
    s = s._replace(omega=jnp.full((cfg.n_chains,), om0, jnp.float32))
    s, _ = langevin.run_frames(s, act, cfg, 3)
    s = langevin.reset_means(s)
    s, m = langevin.run_frames(s, act, cfg, 40)
    assert np.all(np.asarray(m["stable"]))
    mx = mu + x_cl
    x2t = sig2 + mx**2
    zx = _z(np.asarray(s.x_mean, np.float64), mx, cfg.n_chains)
    z2 = _z(np.asarray(s.x2_mean, np.float64), x2t, cfg.n_chains)
    assert zx.max() < 6.0, zx.max()
    assert z2.max() < 6.0, z2.max()


def test_exact_scheme_validation_surfaces():
    act = actions.get("double_well")
    bad_direct = ChainConfig(
        action="anharmonic", scheme=Scheme.EXACT,
        formulation=Formulation.DIRECT, bc=BoundaryCondition.PERIODIC,
    )
    with pytest.raises(ValueError, match="BACKGROUND"):
        langevin.make_frame_fn(actions.get("anharmonic"), bad_direct)
    bad_parisi = ChainConfig(
        action="double_well", scheme=Scheme.EXACT,
        formulation=Formulation.BACKGROUND, parisi=True,
    )
    with pytest.raises(ValueError, match="parisi"):
        langevin.make_frame_fn(act, bad_parisi)
    # kernel path refuses loudly
    from stochquant_tpu.kernels import chain_kernel

    good = ChainConfig(
        action="harmonic", n_sites=16, n_chains=2, loops=2,
        scheme=Scheme.EXACT, formulation=Formulation.BACKGROUND,
        bc=BoundaryCondition.PERIODIC,
    )
    s0 = langevin.init_chain_state(good, actions.get("harmonic"))
    with pytest.raises(ValueError, match="XLA-path"):
        chain_kernel.chain_frame_pallas(s0, actions.get("harmonic"), good, interpret=True)


def test_exact_scheme_dirichlet_hits_target_cov():
    """r4 (ROADMAP item): Scheme.EXACT with DIRICHLET edges — the interior
    (N−2)-site propagator embedded with zero edge rows/cols.  Gate the
    interior ⟨x²⟩ against diag(B_int⁻¹)/Δt at an EM-impossible Δτ and
    assert the edges stay pinned at exactly 0."""
    cfg = ChainConfig(
        action="harmonic", n_sites=32, dt=0.1, dtau=2.0, n_chains=128,
        loops=20, seed=43, scheme=Scheme.EXACT,
        formulation=Formulation.BACKGROUND, bc=BoundaryCondition.DIRICHLET,
    )
    act = actions.get("harmonic")
    B = exact.harmonic_drift_matrix(cfg.n_sites, cfg.dt, bc=cfg.bc)
    assert cfg.dtau * np.linalg.eigvalsh(B).max() > 100.0  # EM-impossible
    s = _run(cfg, act, burn=3, frames=40)
    f = np.asarray(s.f)
    np.testing.assert_array_equal(f[:, 0], np.zeros(cfg.n_chains))
    np.testing.assert_array_equal(f[:, -1], np.zeros(cfg.n_chains))
    sig2 = np.diag(exact.target_cov(B, cfg.dt))
    x2 = np.asarray(s.x2_mean, np.float64)[:, 1:-1]
    z2 = _z(x2, sig2, cfg.n_chains)
    assert z2.max() < 6.0, z2.max()


def test_exact_scheme_free_field_2d_hits_target_phi2():
    """r4 (ROADMAP item): Scheme.EXACT for the 2-D FREE field — the exact
    OU propagator per Fourier mode.  At Δτ·B̂_max ≫ 1 (EM-impossible) the
    site-averaged ⟨φ²⟩ must hit (c²/aᴰ)·mean_k 1/B̂(k)."""
    from stochquant_tpu.actions import phi4
    from stochquant_tpu.config import FieldConfig
    from stochquant_tpu.integrators import field

    cfg = FieldConfig(
        action="free_field", shape=(16, 16), dtau=2.0, n_chains=64,
        loops=20, seed=11, scheme=Scheme.EXACT,
    )
    act = phi4.get_field("free_field")
    # B̂_max = 8/a² + m² = 9 → Δτ·B̂_max = 18 (EM stability needs < 2)
    s = field.init_field_state(cfg)
    s, _ = field.run_field_frames(s, act, cfg, 3)
    s = field.reset_field_means(s)
    s, m = field.run_field_frames(s, act, cfg, 30)
    assert np.all(np.asarray(m["stable"]))
    np.testing.assert_array_equal(
        np.asarray(s.dtau), np.full(cfg.n_chains, np.float32(cfg.dtau))
    )
    kx = 2.0 * np.pi * np.fft.fftfreq(16)
    bhat = (
        2.0 * (1.0 - np.cos(kx))[:, None]
        + 2.0 * (1.0 - np.cos(kx))[None, :]
        + 1.0
    )
    target = np.mean(1.0 / bhat)
    phi2 = np.asarray(s.phi2_mean, np.float64)
    z = _z(phi2, target, cfg.n_chains)
    assert z.max() < 6.0, (phi2.mean(), target, z.max())


def test_exact_scheme_free_field_validation():
    from stochquant_tpu.actions import phi4
    from stochquant_tpu.config import FieldConfig, Sweep
    from stochquant_tpu.integrators import field

    bad_action = FieldConfig(action="phi4", scheme=Scheme.EXACT)
    with pytest.raises(ValueError, match="free_field"):
        field.make_field_frame_fn(phi4.get_field("phi4"), bad_action)
    bad_sweep = FieldConfig(
        action="free_field", scheme=Scheme.EXACT, sweep=Sweep.CHECKERBOARD
    )
    with pytest.raises(ValueError, match="SYNC"):
        field.make_field_frame_fn(phi4.get_field("free_field"), bad_sweep)
    # runtime routes EXACT to xla; explicit pallas refuses
    from stochquant_tpu import runtime

    good = FieldConfig(action="free_field", shape=(8, 8), scheme=Scheme.EXACT)
    assert (
        runtime.select_field_backend(good, "auto", on_tpu=True, use_halo=False)
        == "xla"
    )
    with pytest.raises(ValueError, match="XLA"):
        runtime.select_field_backend(good, "pallas", on_tpu=True, use_halo=False)
