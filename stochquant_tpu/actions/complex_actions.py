"""Complex actions for complex Langevin (BASELINE.json config 5).

For a holomorphic action S(z) the complex-Langevin update evolves z = x + iy
with drift −∂S/∂z and *real* noise on the real part; expectation values of
holomorphic observables converge to the complex-weight averages ∫O·e^{−S}.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Callable

import jax.numpy as jnp

_COMPLEX_REGISTRY: Dict[str, Callable[..., "ComplexAction"]] = {}


def register_complex(name: str):
    def wrap(cls):
        _COMPLEX_REGISTRY[name] = cls
        cls.name = name
        return cls

    return wrap


def get_complex(name: str, **params) -> "ComplexAction":
    try:
        cls = _COMPLEX_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown complex action {name!r}; known: {sorted(_COMPLEX_REGISTRY)}"
        )
    return cls(**params)


def complex_names():
    return sorted(_COMPLEX_REGISTRY)


@dataclasses.dataclass(frozen=True)
class ComplexAction:
    """Holomorphic single-site (0-D) or chain action on complex variables."""

    def S(self, z):
        raise NotImplementedError

    def dS(self, z):
        """Holomorphic derivative ∂S/∂z (hand-derived; complex autodiff of
        holomorphic functions would also work but is kept explicit)."""
        raise NotImplementedError


@register_complex("complex_gaussian")
@dataclasses.dataclass(frozen=True)
class ComplexGaussian(ComplexAction):
    """S(z) = ½·σ·z² with complex σ = σ_re + i·σ_im.

    Exact: ⟨z²⟩ = 1/σ — the known-answer test for the complex-Langevin
    integrator.  Requires Re(σ) > 0.
    """

    sigma_re: float = 1.0
    sigma_im: float = 0.5

    @property
    def sigma(self):
        return complex(self.sigma_re, self.sigma_im)

    def S(self, z):
        return 0.5 * jnp.asarray(self.sigma, jnp.complex64) * z * z

    def dS(self, z):
        return jnp.asarray(self.sigma, jnp.complex64) * z


@register_complex("complex_quartic")
@dataclasses.dataclass(frozen=True)
class ComplexQuartic(ComplexAction):
    """S(z) = ½·σ·z² + (λ/4)·z⁴ with complex σ — the standard complex-Langevin
    benchmark model (exact ⟨z²⟩ computable by quadrature)."""

    sigma_re: float = 1.0
    sigma_im: float = 1.0
    lam: float = 1.0

    @property
    def sigma(self):
        return complex(self.sigma_re, self.sigma_im)

    def S(self, z):
        s = jnp.asarray(self.sigma, jnp.complex64)
        return 0.5 * s * z * z + 0.25 * self.lam * z**4

    def dS(self, z):
        s = jnp.asarray(self.sigma, jnp.complex64)
        return s * z + self.lam * z**3
