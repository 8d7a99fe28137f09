"""Action abstraction: the single source of physics truth.

The reference triplicates potential/background/constant definitions across
device kernel and host (``tau_kernel.cl:184-256``, ``tauhost.c:643-671`` —
flaw F6, with the two ``harmOscSol`` copies actually disagreeing).  Here every
model is one class: potential ``V``, its derivatives (hand-derived where hot,
``jax.grad``-derived by default), the classical background ``x_cl(t, ω)`` for
the fluctuation formulation, the zero-mode normalization for the collective
coordinate, and the full lattice action used by autodiff cross-checks.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

_REGISTRY: Dict[str, Callable[..., "QMAction"]] = {}


def register(name: str):
    def wrap(cls):
        _REGISTRY[name] = cls
        cls.name = name
        return cls

    return wrap


def get(name: str, **params) -> "QMAction":
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown action {name!r}; known: {sorted(_REGISTRY)}")
    return cls(**params)


def names():
    return sorted(_REGISTRY)


def _elementwise_grad(f):
    g = jax.grad(f)
    return jnp.vectorize(g)


@dataclasses.dataclass(frozen=True)
class QMAction:
    """1-D Euclidean-time quantum mechanics:

        S[x] = Σ_i Δt [ (m/2)((x_{i+1}-x_i)/Δt)² + V(x_i) ].

    Subclasses define ``V`` (scalar→scalar, jnp ops) and may override ``dV`` /
    ``ddV`` with hand-derived forms; the defaults differentiate ``V`` with
    ``jax.grad`` (verified against the overrides in tests/test_actions.py).
    """

    mass: float = 1.0

    # --- potential -------------------------------------------------------
    def V(self, x):
        raise NotImplementedError

    def dV(self, x):
        return _elementwise_grad(self.V)(x)

    def ddV(self, x):
        return _elementwise_grad(lambda y: self.dV(y))(x)

    # --- background (fluctuation formulation) ---------------------------
    # The reference's `clas` / `ddPot∘clas` / `intConst` trio
    # (tau_kernel.cl:215-246).  Default: trivial background.
    has_zero_mode: bool = dataclasses.field(default=False, init=False)

    def x_cl(self, t, omega):
        """Classical background at Euclidean time t, collective coord ω."""
        return jnp.zeros_like(jnp.asarray(t, jnp.result_type(t, jnp.float32)))

    def boundary_asymptote(self, side: int):
        """Background value pinned at the lattice edges for FIXED_BG BCs
        (side = -1 left, +1 right)."""
        return 0.0

    def zero_mode_const(self) -> float:
        """Normalization of the translational zero mode (the Parisi trick's
        collective-coordinate noise amplitude, tau_kernel.cl:237-246)."""
        return 0.0

    # --- lattice action (for autodiff cross-checks & measurements) ------
    def kinetic(self, x, dt, x_left=None, x_right=None, periodic=False):
        """Σ (m/2)((x_{i+1}-x_i)/Δt)²·Δt including boundary links.

        With ``periodic`` the wraparound link is included; otherwise ghost
        values ``x_left``/``x_right`` terminate the chain (omit to drop the
        edge links, i.e. free boundaries).
        """
        c = 0.5 * self.mass / dt
        s = jnp.sum(c * (x[..., 1:] - x[..., :-1]) ** 2, axis=-1)
        if periodic:
            s = s + c * (x[..., 0] - x[..., -1]) ** 2
        else:
            if x_left is not None:
                s = s + c * (x[..., 0] - x_left) ** 2
            if x_right is not None:
                s = s + c * (x_right - x[..., -1]) ** 2
        return s

    def action(self, x, dt, x_left=None, x_right=None, periodic=False):
        """Full lattice action (per chain)."""
        return self.kinetic(x, dt, x_left, x_right, periodic) + dt * jnp.sum(
            self.V(x), axis=-1
        )

    def fluctuation_action(self, f, t, omega, dt, f_left=None, f_right=None,
                           periodic=False):
        """Quadratic action of fluctuations around the background:

            S_fl[f] = Σ_i Δt [ (m/2)((f_{i+1}-f_i)/Δt)² + ½V''(x_cl(t_i,ω))f_i² ]

        — the action whose drift is the reference's linearized update
        (tau_kernel.cl:111-117)."""
        curv = self.ddV(self.x_cl(t, omega))
        return self.kinetic(f, dt, f_left, f_right, periodic) + dt * jnp.sum(
            0.5 * curv * f**2, axis=-1
        )
