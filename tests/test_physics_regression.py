"""Physics regressions: quantitative end-to-end gates replacing the
reference's plot-eyeballing validation (SURVEY.md §4)."""

import numpy as np
import pytest

from stochquant_tpu import actions
from stochquant_tpu.config import BoundaryCondition, ChainConfig, Formulation
from stochquant_tpu.integrators import langevin
from stochquant_tpu.observables import analysis


@pytest.mark.slow
def test_harmonic_energy_gap_matches_lattice_dispersion():
    """E₁−E₀ from the correlator decay vs the exact lattice dispersion
    sinh(Δt·E/2)·2/Δt = ω₀ (… leading finite-Δt form)."""
    cfg = ChainConfig(
        action="harmonic",
        n_sites=64,
        dt=0.25,
        dtau=0.01,
        n_chains=512,
        loops=200,
        bc=BoundaryCondition.PERIODIC,
        formulation=Formulation.DIRECT,
        seed=1,
        grow_after=10**9,
    )
    act = actions.get(cfg.action)
    state = langevin.init_chain_state(cfg, act)
    state, _ = langevin.run_frames(state, act, cfg, 30)
    state = langevin.reset_means(state)
    state, metrics = langevin.run_frames(state, act, cfg, 120)
    assert np.asarray(metrics["stable"])[-1].all()

    corr = np.asarray(langevin.connected_correlator(state), np.float64)
    mean = corr.mean(axis=0)
    err = corr.std(axis=0) / np.sqrt(cfg.n_chains)
    fit = analysis.energy_gap_from_correlator(mean, cfg.dt, corr_err=err)
    e_lat = 2.0 / cfg.dt * np.arcsinh(0.5 * cfg.dt * act.omega0)
    assert abs(fit.gap - e_lat) < 5 * fit.gap_err + 0.01, (fit.gap, e_lat, fit.gap_err)


@pytest.mark.slow
def test_double_well_kink_profile():
    """Background-formulation double well: ⟨x(t)⟩ averaged over chains
    reproduces the kink shape — asymptotes ±η at the edges, with the central
    transition washed out by the wandering collective coordinate ω."""
    cfg = ChainConfig(
        action="double_well",
        n_sites=64,
        dt=0.25,
        dtau=2e-3,
        n_chains=128,
        loops=500,
        seed=42,
        grow_after=10**9,
    )
    act = actions.get(cfg.action)
    state = langevin.init_chain_state(cfg, act)
    state, _ = langevin.run_frames(state, act, cfg, 10)
    state = langevin.reset_means(state)
    state, metrics = langevin.run_frames(state, act, cfg, 30)
    assert np.asarray(metrics["stable"])[-1].all()

    xmean = np.asarray(state.x_mean, np.float64).mean(axis=0)
    eta = act.eta
    # asymptotic plateaus at ±η (within fluctuation width)
    assert abs(xmean[:4].mean() + eta) < 0.25, xmean[:4]
    assert abs(xmean[-4:].mean() - eta) < 0.25, xmean[-4:]
    # antisymmetric about the center up to statistics
    assert abs(xmean[0] + xmean[-1]) < 0.3
    # omega stayed inside the lattice
    om = np.asarray(state.omega)
    assert np.all((om >= 0) & (om <= (cfg.n_sites - 1) * cfg.dt))
