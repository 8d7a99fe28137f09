"""Lattice gauge theory building blocks: link variables + Wilson plaquette
actions for U(1) and SU(2), with hand-derived Langevin drifts.

Stochastic quantization of gauge fields is the original Parisi–Wu program
(the reference implements only its 1-D QM corner); this module is the
model-family extension.  Everything is TPU-first:

* U(1) links are stored as compact angles θ_μ(x) — shape ``(C, D, *L)``
  (chains, direction, lattice) — so the update is pure elementwise math on
  one big array and the drift is a sum of `jnp.roll` stencils.
* SU(2) links are stored as real quaternions q = (w, x, y, z) representing
  U = w·1 + i(x σ₁ + y σ₂ + z σ₃), shape ``(C, 4, D, *L)`` — no complex
  2×2 matrices: multiplication/conjugation/exponentials are a handful of
  fused multiply-adds on the VPU, and re-unitarization is one rsqrt.

Wilson action (both groups, each unordered plaquette counted once):

    S[U] = β Σ_x Σ_{μ<ν} ( 1 − (1/N) Re Tr U_{μν}(x) ),
    U_{μν}(x) = U_μ(x) U_ν(x+μ̂) U_μ†(x+ν̂) U_ν†(x).

Exact known answers used by the tests (2-D, character expansion):
⟨(1/N)ReTr U_p⟩ = I₁(β)/I₀(β) for U(1) and I₂(β)/I₁(β) for SU(2).

Langevin drifts (generators T_a = σ_a/2, noise ⟨η_aη_b⟩ = 2δ_ab):

* U(1): F_μ(x) = −∂S/∂θ_μ(x) = −β Σ_{ν≠μ} [sin P_{μν}(x) − sin P_{μν}(x−ν̂)]
  with P antisymmetric in (μ,ν); verified against ``jax.grad`` of the action
  (tests/test_gauge.py).
* SU(2): f_a = −D_a S = −(β/2)·vec_a(U·V) where V is the staple sum and
  vec the quaternion imaginary part; the update is the exact group
  exponential U ← exp(i ω⃗·σ/2) U via Rodrigues' formula.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Callable

import jax.numpy as jnp

_GAUGE_REGISTRY: Dict[str, Callable[..., "GaugeAction"]] = {}


def register_gauge(name: str):
    def wrap(cls):
        _GAUGE_REGISTRY[name] = cls
        cls.name = name
        return cls

    return wrap


def get_gauge(name: str, **params) -> "GaugeAction":
    try:
        cls = _GAUGE_REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown gauge action {name!r}; known: {sorted(_GAUGE_REGISTRY)}")
    return cls(**params)


def gauge_names():
    return sorted(_GAUGE_REGISTRY)


def shift(arr, d: int, sign: int, lat_start: int):
    """arr(x + sign·d̂): roll by −sign along lattice axis d (axes start at
    ``lat_start``)."""
    return jnp.roll(arr, -sign, axis=lat_start + d)


# ---------------------------------------------------------------------------
# quaternion algebra for SU(2):  U = w + i(x σ₁ + y σ₂ + z σ₃)
# (iσ_a)(iσ_b) = −δ_ab − i ε_abc σ_c  →  vector part a0·b⃗ + b0·a⃗ − a⃗×b⃗
# ---------------------------------------------------------------------------


def qmul(a, b):
    """Quaternion product of U = w + i x⃗·σ representations.

    a, b: tuples (w, x, y, z) of same-shape arrays."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + bw * ax - (ay * bz - az * by),
        aw * by + bw * ay - (az * bx - ax * bz),
        aw * bz + bw * az - (ax * by - ay * bx),
    )


def qconj(a):
    """U† (unitary inverse for |U| = 1)."""
    aw, ax, ay, az = a
    return (aw, -ax, -ay, -az)


def qnormalize(a, eps=1e-30):
    aw, ax, ay, az = a
    inv = 1.0 / jnp.sqrt(aw * aw + ax * ax + ay * ay + az * az + eps)
    return (aw * inv, ax * inv, ay * inv, az * inv)


def qexp_su2(vx, vy, vz):
    """exp(i v⃗·σ/2) as a quaternion (Rodrigues): (cos|v|/2, sin(|v|/2)·v̂).

    Grad-safe at v⃗ = 0: both `where` branches stay finite under autodiff
    (the naive sqrt(v·v) has an infinite gradient at zero), so the drift
    consistency test can differentiate through the group exponential."""
    n2 = vx * vx + vy * vy + vz * vz
    ns = jnp.sqrt(jnp.maximum(n2, 1e-24))
    half = 0.5 * ns
    small = n2 < 1e-12
    s = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / ns)
    w = jnp.where(small, 1.0 - n2 / 8.0, jnp.cos(half))
    return (w, s * vx, s * vy, s * vz)


@dataclasses.dataclass(frozen=True)
class GaugeAction:
    """Wilson plaquette action; β multiplies Σ_p (1 − (1/N)ReTr U_p)."""

    beta: float = 1.0

    #: number of real degrees of freedom per link in the state layout
    components: int = 1

    def init_links(self, shape):
        raise NotImplementedError

    def action(self, links, ndim: int):
        raise NotImplementedError

    def drift(self, links, ndim: int):
        raise NotImplementedError

    def mean_plaquette(self, links, ndim: int):
        raise NotImplementedError


@register_gauge("u1")
@dataclasses.dataclass(frozen=True)
class U1Wilson(GaugeAction):
    """Compact U(1): links e^{iθ}, state = θ of shape (C, D, *L)."""

    components: int = 1

    def plaquette_angle(self, theta, mu: int, nu: int, ndim: int):
        """P_{μν}(x) = θ_μ(x) + θ_ν(x+μ̂) − θ_μ(x+ν̂) − θ_ν(x); lattice axes
        start at 2 for the (C, D, *L) layout."""
        t_mu = theta[:, mu]
        t_nu = theta[:, nu]
        ls = 1  # after selecting direction, lattice axes start at 1
        return (
            t_mu
            + shift(t_nu, mu, +1, ls)
            - shift(t_mu, nu, +1, ls)
            - t_nu
        )

    def action(self, theta, ndim: int):
        """Total action per chain: β Σ_x Σ_{μ<ν} (1 − cos P)."""
        C = theta.shape[0]
        s = jnp.zeros((C,), theta.dtype)
        for mu in range(ndim):
            for nu in range(mu + 1, ndim):
                p = self.plaquette_angle(theta, mu, nu, ndim)
                s = s + jnp.sum(1.0 - jnp.cos(p), axis=tuple(range(1, p.ndim)))
        return self.beta * s

    def drift(self, theta, ndim: int):
        """−∂S/∂θ_μ(x) = −β Σ_{ν≠μ}[ sin P_{μν}(x) − sin P_{μν}(x−ν̂) ]."""
        out = []
        ls = 1
        for mu in range(ndim):
            acc = jnp.zeros_like(theta[:, mu])
            for nu in range(ndim):
                if nu == mu:
                    continue
                # antisymmetric P_{μν} — compute with μ first regardless of order
                p = self.plaquette_angle(theta, mu, nu, ndim)
                sp = jnp.sin(p)
                acc = acc + sp - shift(sp, nu, -1, ls)
            out.append(-self.beta * acc)
        return jnp.stack(out, axis=1)

    def mean_plaquette(self, theta, ndim: int):
        """⟨cos P⟩ averaged over sites and unordered plaquette orientations,
        per chain."""
        C = theta.shape[0]
        tot = jnp.zeros((C,), theta.dtype)
        n = 0
        for mu in range(ndim):
            for nu in range(mu + 1, ndim):
                p = self.plaquette_angle(theta, mu, nu, ndim)
                tot = tot + jnp.mean(jnp.cos(p), axis=tuple(range(1, p.ndim)))
                n += 1
        return tot / n

    def init_links(self, shape):
        """Cold start: all links at the identity (θ = 0)."""
        return jnp.zeros(shape, jnp.float32)


@register_gauge("su2")
@dataclasses.dataclass(frozen=True)
class SU2Wilson(GaugeAction):
    """SU(2) Wilson: quaternion links, state shape (C, 4, D, *L)."""

    components: int = 4

    @staticmethod
    def _link(q, mu: int):
        """Quaternion tuple for direction μ; each component (C, *L)."""
        return tuple(q[:, c, mu] for c in range(4))

    def _staple_sum(self, q, mu: int, ndim: int):
        """Σ_{ν≠μ} (forward + backward) staples V such that Tr(U_μ(x)·V)
        sums every plaquette containing the link (x, μ)."""
        ls = 1  # lattice axes start at 1 for (C, *L) components
        sh = lambda t, d, s: tuple(shift(c, d, s, ls) for c in t)
        u_mu = self._link(q, mu)
        acc = None
        for nu in range(ndim):
            if nu == mu:
                continue
            u_nu = self._link(q, nu)
            # forward: U_ν(x+μ̂) U_μ†(x+ν̂) U_ν†(x)
            f = qmul(
                qmul(sh(u_nu, mu, +1), qconj(sh(u_mu, nu, +1))), qconj(u_nu)
            )
            # backward: U_ν†(x+μ̂−ν̂) U_μ†(x−ν̂) U_ν(x−ν̂)
            b = qmul(
                qmul(qconj(sh(sh(u_nu, mu, +1), nu, -1)), qconj(sh(u_mu, nu, -1))),
                sh(u_nu, nu, -1),
            )
            term = tuple(ff + bb for ff, bb in zip(f, b))
            acc = term if acc is None else tuple(a + t for a, t in zip(acc, term))
        return acc

    def drift(self, q, ndim: int):
        """Lie-algebra drift f_a = −D_a S = −(β/2)·vec_a(U·V_staple),
        returned with shape (C, 3, D, *L)."""
        per_mu = []
        for mu in range(ndim):
            u = self._link(q, mu)
            v = self._staple_sum(q, mu, ndim)
            w = qmul(u, v)
            per_mu.append(jnp.stack([-0.5 * self.beta * w[1],
                                     -0.5 * self.beta * w[2],
                                     -0.5 * self.beta * w[3]], axis=1))
        # each entry (C, 3, *L) → (C, 3, D, *L)
        return jnp.stack(per_mu, axis=2)

    def plaquette(self, q, mu: int, nu: int):
        """½Tr U_{μν}(x) = scalar part of the plaquette quaternion, (C, *L)."""
        ls = 1
        sh = lambda t, d, s: tuple(shift(c, d, s, ls) for c in t)
        u_mu = self._link(q, mu)
        u_nu = self._link(q, nu)
        p = qmul(
            qmul(u_mu, sh(u_nu, mu, +1)),
            qmul(qconj(sh(u_mu, nu, +1)), qconj(u_nu)),
        )
        return p[0]

    def action(self, q, ndim: int):
        C = q.shape[0]
        s = jnp.zeros((C,), q.dtype)
        for mu in range(ndim):
            for nu in range(mu + 1, ndim):
                w = self.plaquette(q, mu, nu)
                s = s + jnp.sum(1.0 - w, axis=tuple(range(1, w.ndim)))
        return self.beta * s

    def mean_plaquette(self, q, ndim: int):
        C = q.shape[0]
        tot = jnp.zeros((C,), q.dtype)
        n = 0
        for mu in range(ndim):
            for nu in range(mu + 1, ndim):
                w = self.plaquette(q, mu, nu)
                tot = tot + jnp.mean(w, axis=tuple(range(1, w.ndim)))
                n += 1
        return tot / n

    def apply_update(self, q, omega):
        """U ← exp(i ω⃗·σ/2) U for ω of shape (C, 3, D, *L); exact group
        step + re-unitarization (one rsqrt) against float drift."""
        r = qexp_su2(omega[:, 0], omega[:, 1], omega[:, 2])
        u = tuple(q[:, c] for c in range(4))
        new = qmul(r, u)
        new = qnormalize(new)
        return jnp.stack(new, axis=1)

    def init_links(self, shape):
        """Cold start at the identity: q = (1, 0, 0, 0).  ``shape`` is the
        full (C, 4, D, *L) state shape."""
        q = jnp.zeros(shape, jnp.float32)
        return q.at[:, 0].set(1.0)
