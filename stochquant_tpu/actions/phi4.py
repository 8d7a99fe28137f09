"""D-dimensional scalar field theory actions (periodic lattice).

The reference stops at 1-D quantum mechanics; these are the scale-out
models from BASELINE.json configs 3-4 (2-D 256², 4-D 32⁴ φ⁴).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Callable

import jax
import jax.numpy as jnp

_FIELD_REGISTRY: Dict[str, Callable[..., "FieldAction"]] = {}


def register_field(name: str):
    def wrap(cls):
        _FIELD_REGISTRY[name] = cls
        cls.name = name
        return cls

    return wrap


def get_field(name: str, **params) -> "FieldAction":
    try:
        cls = _FIELD_REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown field action {name!r}; known: {sorted(_FIELD_REGISTRY)}")
    return cls(**params)


def field_names():
    return sorted(_FIELD_REGISTRY)


def periodic_laplacian(phi, spacing: float, ndim: int):
    """Nearest-neighbour lattice Laplacian over the trailing ``ndim`` axes
    (leading axes = chain batch), periodic BCs."""
    inv_a2 = 1.0 / (spacing * spacing)
    lap = jnp.zeros_like(phi)
    for d in range(phi.ndim - ndim, phi.ndim):
        lap = lap + (jnp.roll(phi, 1, axis=d) + jnp.roll(phi, -1, axis=d) - 2.0 * phi)
    return lap * inv_a2


@dataclasses.dataclass(frozen=True)
class FieldAction:
    """S[φ] = Σ_x a^D [ ½ Σ_μ ((φ(x+μ̂)−φ(x))/a)² + V(φ(x)) ], periodic.

    ``drift`` returns the drift *density* −(1/a^D)·δS/δφ_x = ∇²φ − V'(φ);
    the Langevin update is φ += Δτ·drift + √(2Δτ/a^D)·η (same measure
    convention as the 1-D case, site measure w = a^D).
    """

    def V(self, phi):
        raise NotImplementedError

    def dV(self, phi):
        g = jax.grad(self.V)
        return jnp.vectorize(g)(phi)

    def action_density(self, phi, spacing: float, ndim: int):
        """Per-site action density (leading axes = chains)."""
        kin = jnp.zeros_like(phi)
        inv_a2 = 1.0 / (spacing * spacing)
        for d in range(phi.ndim - ndim, phi.ndim):
            diff = jnp.roll(phi, -1, axis=d) - phi
            kin = kin + 0.5 * diff * diff * inv_a2
        return kin + self.V(phi)

    def action(self, phi, spacing: float, ndim: int):
        dens = self.action_density(phi, spacing, ndim)
        measure = spacing**ndim
        return measure * jnp.sum(dens, axis=tuple(range(phi.ndim - ndim, phi.ndim)))

    def drift(self, phi, spacing: float, ndim: int):
        return periodic_laplacian(phi, spacing, ndim) - self.dV(phi)

    def dV_int(self, phi):
        """Non-Gaussian part of V′: dV(φ) − m²·φ — the remainder the
        exponential integrator (Scheme.EXACT for interacting fields, r5)
        treats explicitly while the Gaussian part (−∇² + m²) propagates
        exactly per Fourier mode.  Requires the action to declare its
        Gaussian curvature ``m2``; subclasses should override with the
        closed form to avoid the cancellation."""
        return self.dV(phi) - self.m2 * phi


@register_field("phi4")
@dataclasses.dataclass(frozen=True)
class ScalarPhi4(FieldAction):
    """V(φ) = ½·m²·φ² + (λ/4!)·φ⁴.  Negative m² with λ>0 gives the broken
    phase probed by the magnetization/susceptibility observables."""

    m2: float = 1.0
    lam: float = 1.0

    def V(self, phi):
        p2 = phi * phi
        return 0.5 * self.m2 * p2 + (self.lam / 24.0) * p2 * p2

    def dV(self, phi):
        return self.m2 * phi + (self.lam / 6.0) * phi * phi * phi

    def dV_int(self, phi):
        return (self.lam / 6.0) * phi * phi * phi


@register_field("free_field")
@dataclasses.dataclass(frozen=True)
class FreeField(FieldAction):
    """Gaussian fixed point V = ½·m²·φ² — exact propagator known, used as a
    correctness anchor for the D-dim integrator."""

    m2: float = 1.0

    def V(self, phi):
        return 0.5 * self.m2 * phi * phi

    def dV(self, phi):
        return self.m2 * phi

    def dV_int(self, phi):
        return jnp.zeros_like(phi)
