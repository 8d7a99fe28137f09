"""Locate the 2-D φ⁴ critical coupling with the Binder cumulant.

U(L) = 1 − ⟨M⁴⟩/(3⟨M²⟩²) flows to 0 in the symmetric phase and to 2/3 in the
broken phase; curves for different lattice sizes L cross at the critical
m²(λ) almost independently of L — the standard finite-size-scaling locator
(the ⟨M⁴⟩ channel landed in r2: integrators/field.py:binder_cumulant).

Run (CPU):  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/binder_crossing.py
On TPU the same scan runs through the fused field kernel via
``runtime.run_field(cfg, backend="auto")``.
"""

import numpy as np

from stochquant_tpu.actions import phi4
from stochquant_tpu.config import FieldConfig, Sweep
from stochquant_tpu.integrators import field


def binder_of(L, m2, lam=6.0, seed=13):
    cfg = FieldConfig(
        action="phi4",
        shape=(L, L),
        dtau=0.02,
        n_chains=16,
        loops=200,
        seed=seed,
        grow_after=10**9,
        sweep=Sweep.CHECKERBOARD,
    )
    act = phi4.get_field("phi4", m2=m2, lam=lam)
    state = field.init_field_state(cfg)
    state, _ = field.run_field_frames(state, act, cfg, 25)
    state = field.reset_field_means(state)
    state, _ = field.run_field_frames(state, act, cfg, 50)
    u = np.asarray(field.binder_cumulant(state), np.float64)
    return u.mean(), u.std() / np.sqrt(cfg.n_chains)


def main():
    sizes = (12, 24)
    m2s = [0.5, 0.0, -0.5, -1.0, -1.5, -2.0]
    print(f"{'m^2':>7} | " + " | ".join(f"U(L={L}) ± err" for L in sizes))
    for m2 in m2s:
        row = []
        for L in sizes:
            u, e = binder_of(L, m2)
            row.append(f"{u:>7.3f} ± {e:.3f}")
        print(f"{m2:>7.2f} | " + " | ".join(row))
    print("\nU → 0 (symmetric), → 2/3 (broken); the L-curves cross near the "
          "critical m²(λ=6)")


if __name__ == "__main__":
    main()
