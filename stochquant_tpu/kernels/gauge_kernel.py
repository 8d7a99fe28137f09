"""Fused Pallas TPU kernel for 2-D compact U(1) lattice gauge frames.

The gauge integrator (integrators/gauge.py) is group-agnostic XLA; this is
its fused fast path for the abelian case (VERDICT r1 item 7): one kernel
launch = one macro-frame of a 2-D U(1) chain — per micro-step it draws the
counter-based noise, evaluates the Wilson drift −β Σ_ν [sin P − sin P(x−ν̂)]
(actions/gauge.py:223-237), applies the drift-capped Langevin step with the
exact group update θ ← wrap(θ + ω) (actions/gauge.py:265-268), accumulates
the frame's plaquette sum and tracks the drift-norm / finiteness detector —
all in VMEM, one chain per grid program.

Math mirrors integrators/gauge.py op-for-op (same Threefry counters keyed by
the global (μ, x) link id, same expression order for both plaquette
orientations), so kernel trajectories are bit-compatible with the XLA path
(tests/test_gauge_kernel.py); the accept/reject + adaptive-Δτ epilogue is
the XLA code shared with the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stochquant_tpu import rng
from stochquant_tpu.integrators import accum
from stochquant_tpu.integrators.gauge import GaugeConfig, GaugeState

__all__ = [
    "run_gauge_frames_pallas",
    "gauge_frame_pallas",
    "gauge_frames_multi",
    "make_gauge_chunk_step",
    "links_to_planes_shaped",
    "planes_to_links_shaped",
    "supports",
]


def supports(action, cfg: GaugeConfig) -> bool:
    """The fused kernels cover compact U(1), quaternion SU(2) and matrix
    SU(3) on 2-D lattices without gauge cooling; complexified groups use the
    XLA scan path."""
    from stochquant_tpu.actions.gauge import SU2Wilson, SU3Wilson, U1Wilson

    return (
        type(action) in (U1Wilson, SU2Wilson, SU3Wilson)
        and cfg.ndim == 2
        and not (cfg.cooling_rate > 0.0)
    )


# ---------------------------------------------------------------------------
# Split-complex 3×3 matrix algebra for the SU(3) kernel.
#
# Mosaic has no complex dtype: a matrix is a 3×3 nested tuple of (re, im)
# pairs, each component one (1, 1, L0, L1) lane-batched plane.  The real-op
# decomposition below matches XLA's complex lowering — (a+bi)(c+di) =
# (ac−bd) + (ad+bc)i, contractions summed k = 0,1,2 — so kernel trajectories
# track the complex64 XLA path to float tolerance (gate in bench.py;
# exactness is impossible to *guarantee* across Mosaic scheduling, the
# contract is the ≤2e-6 on-device gate like the other kernels).
# ---------------------------------------------------------------------------


def _normal_pair_fn(seed, k1, site):
    """Box–Muller pair from the global-counter Threefry draw — ONE copy
    shared by the frame, multi-frame and chunk kernels (r5 review: the
    bitwise-parity contract depends on this exact expression sequence;
    three drifting copies would desynchronize the chunk kernel's halo
    recompute from the unsharded kernels)."""
    f32 = np.float32

    def normal_pair(step):
        b0, b1 = rng.threefry2x32(seed, k1, site, step)
        u1 = rng.uniform_from_bits(b0)
        u2 = rng.uniform_from_bits(b1)
        r = jnp.sqrt(f32(-2.0) * jnp.log(u1))
        theta = f32(rng._TWO_PI) * u2
        return r * jnp.cos(theta), r * jnp.sin(theta)

    return normal_pair


def _cmul(a, b):
    (ar, ai), (br, bi) = a, b
    return (ar * br - ai * bi, ar * bi + ai * br)


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _cmat_mul(A, B):
    """C = A·B on 3×3 split-complex matrices (k summed 0→2)."""
    out = []
    for i in range(3):
        row = []
        for j in range(3):
            s = _cmul(A[i][0], B[0][j])
            s = _cadd(s, _cmul(A[i][1], B[1][j]))
            s = _cadd(s, _cmul(A[i][2], B[2][j]))
            row.append(s)
        out.append(row)
    return out


def _cmat_dag(A):
    return [[(A[j][i][0], -A[j][i][1]) for j in range(3)] for i in range(3)]


def _cmat_add(A, B):
    return [[_cadd(A[i][j], B[i][j]) for j in range(3)] for i in range(3)]


def _cmat_scale_r(s, A):
    """real scalar (array) × matrix."""
    return [[(s * A[i][j][0], s * A[i][j][1]) for j in range(3)] for i in range(3)]


def _cmat_map(A, d, sign, roll):
    """matrix field at pos + sign·d̂ (all 18 planes shifted)."""
    return [
        [(roll(A[i][j][0], -sign, 2 + d), roll(A[i][j][1], -sign, 2 + d))
         for j in range(3)]
        for i in range(3)
    ]


# Mosaic TC lowers sin/cos/tan/sqrt/exp/log but has NO acos/atan2 primitives
# (NotImplementedError at lowering); the SU(3) exponential needs arccos and
# the re-unitarization needs the det phase.  Cephes-style float32 atan with
# two-stage range reduction (~1-ulp on ℝ), plus the standard quadrant logic
# and acos(x) = atan2(√((1−x)(1+x)), x) — accuracy far inside the kernel's
# ≤1e-5 on-device gate.


def _atanf(x):
    f32 = np.float32
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > f32(2.414213562373095)  # tan(3π/8)
    mid = (ax > f32(0.4142135623730950)) & ~big  # tan(π/8)
    xr = jnp.where(
        big, -1.0 / jnp.where(big, ax, f32(1.0)),
        jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax),
    )
    off = jnp.where(
        big, f32(np.pi / 2), jnp.where(mid, f32(np.pi / 4), f32(0.0))
    )
    z = xr * xr
    y = (
        ((f32(8.05374449538e-2) * z - f32(1.38776856032e-1)) * z
         + f32(1.99777106478e-1)) * z
        - f32(3.33329491539e-1)
    ) * z * xr + xr
    return sign * (off + y)


def _atan2f(y, x):
    f32 = np.float32
    safe_x = jnp.where(x == 0.0, f32(1.0), x)
    base = _atanf(y / safe_x)
    base = base + jnp.where(
        x < 0.0, jnp.where(y >= 0.0, f32(np.pi), f32(-np.pi)), f32(0.0)
    )
    vert = jnp.where(y >= 0.0, f32(np.pi / 2), f32(-np.pi / 2))
    return jnp.where(x == 0.0, vert, base)


def _acosf(x):
    return _atan2f(jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0)), x)


# ---------------------------------------------------------------------------
# Lane-packed lattice layout (r5, VERDICT r4 item 2).
#
# The kernels view the (L0, L1) lattice as (S, F) = (L0/g, g·L1) with F a
# multiple of 128 — a C-order reshape (free in XLA) that packs g lattice
# rows into each vreg lane row, so L1 < 128 lattices stop wasting lanes
# (su3 at (64, 64) ran at HALF rate under the plain (L0, L1) mapping:
# 127 vs ~580 MLUPS lane-aligned, BASELINE.md r4 analysis).  g = 1 (the
# identity layout, single-roll fast path) whenever L1 % 128 == 0 or no
# admissible packing exists.
#
# Rolls per lattice dim decompose exactly on the packed layout (the
# field_kernel_nd.py flat-roll playbook):
#
# - dim 1 (±1): lane roll ±1, plus a boundary fix (second roll + hoisted
#   edge mask) where the lane crosses a lattice-row seam;
# - dim 0 (±1): flat roll by ±L1 = lane roll ±L1 combined with a ±1
#   sublane roll selected on the carried lane band; the global L0 wrap is
#   exact because the flat order covers the whole lattice.
# ---------------------------------------------------------------------------


def _pack_shape(shape):
    """(S, F, g): packed view (L0/g, g·L1) of ``shape`` with F % 128 == 0."""
    L0, L1 = shape
    if L1 % 128 == 0:
        return L0, L1, 1
    for g in range(2, L0 + 1):
        if L0 % g == 0 and (g * L1) % 128 == 0:
            return L0 // g, g * L1, g
    return L0, L1, 1


def _lattice_layout(cfg: GaugeConfig):
    """(S, F, g): kernel lattice view (L0/g, g·L1) with F % 128 == 0."""
    return _pack_shape(cfg.shape)


def _make_roll_shape(shape):
    """Returns ``make_roll()`` for the kernel body: builds the packed
    layout's edge masks ONCE (hoisted out of the micro-step loop — they
    depend only on static geometry) and returns ``roll(x, shift, axis)``
    with the historic axis convention (2 = lattice dim 0, 3 = dim 1).

    ``shape`` is the (rows, L1) extent the rolls wrap over — the global
    lattice for the whole-lattice kernels, the halo-EXTENDED local block
    for the chunk kernel (there the dim-0 wrap is trapezoid garbage
    confined to the halo rows, exactly like field_kernel_nd's roll0)."""
    L0, L1 = shape
    S, F, g = _pack_shape(shape)
    if g == 1:
        def make_roll():
            def roll(x, shift, axis):
                return pltpu.roll(x, shift % (L0 if axis == 2 else L1), axis)

            return roll

        return make_roll

    def make_roll():
        col = lax.broadcasted_iota(jnp.int32, (1, 1, S, F), 3)
        edge_lo = col % L1 == 0        # first site of each lattice row
        edge_hi = col % L1 == L1 - 1   # last site of each lattice row
        lo_band = col < L1             # first packed row in each lane row
        hi_band = col >= F - L1        # last packed row in each lane row

        def roll(x, shift, axis):
            if shift not in (1, -1):
                raise ValueError(
                    "lane-packed gauge layout supports ±1 rolls only"
                )
            if axis == 3:  # lattice dim 1: lane roll + row-seam fix
                main = pltpu.roll(x, shift % F, 3)
                fix = pltpu.roll(x, (shift - shift * L1) % F, 3)
                edge = edge_lo if shift == 1 else edge_hi
                return jnp.where(edge, fix, main)
            # lattice dim 0: flat roll by shift·L1 with sublane carry
            y = pltpu.roll(x, (shift * L1) % F, 3)
            z = pltpu.roll(y, shift % S, 2)
            band = lo_band if shift == 1 else hi_band
            return jnp.where(band, z, y)

        return roll

    return make_roll


def _make_roll(cfg: GaugeConfig):
    return _make_roll_shape(tuple(cfg.shape))


# ---------------------------------------------------------------------------
# Per-group step math, extracted so the single-frame AND multi-frame kernels
# share ONE implementation per group (r4: the multi-frame epilogue is
# group-agnostic; r3 had it u1-only).  Each factory returns
# ``(link_planes, noise_planes, make_step)``; ``make_step()`` runs in the
# kernel body (hoisting the packed layout's masks out of the loop) and
# returns
#
#     step_math(block, eta, dtau) -> (new_block, plaq_contrib, dnorm, bad)
#
# on (1, planes, S, F) f32 blocks; expression order matches the XLA
# integrator op-for-op (the on-device gate contract).
# ---------------------------------------------------------------------------


def _u1_ops(action, cfg: GaugeConfig):
    f32 = np.float32
    beta = f32(action.beta)
    cap = f32(cfg.drift_cap)
    two_pi = f32(2.0 * np.pi)
    inv_vol = f32(1.0 / (cfg.shape[0] * cfg.shape[1]))
    make_roll = _make_roll(cfg)

    def make_step(own_mask=None, roll_factory=None):
        roll = (roll_factory or make_roll)()

        def shift_lat(x, d, sign):
            """x(pos + sign·d̂) — mirrors actions.gauge.shift (roll by −sign)."""
            return roll(x, -sign, 2 + d)

        def plaq(t_mu, t_nu, mu, nu):
            """P_{μν} with the same expression order as
            U1Wilson.plaquette_angle (actions/gauge.py:200-211)."""
            return (
                t_mu + shift_lat(t_nu, mu, +1) - shift_lat(t_mu, nu, +1) - t_nu
            )

        def drift_and_p01(th):
            t0 = th[:, 0:1, :, :]
            t1 = th[:, 1:2, :, :]
            # drift, both directions, mirroring U1Wilson.drift's loop order
            p01 = plaq(t0, t1, 0, 1)
            sp01 = jnp.sin(p01)
            acc0 = sp01 - shift_lat(sp01, 1, -1)
            p10 = plaq(t1, t0, 1, 0)
            sp10 = jnp.sin(p10)
            acc1 = sp10 - shift_lat(sp10, 0, -1)
            return jnp.concatenate([-beta * acc0, -beta * acc1], axis=1), p01

        def update(th, f, eta, dtau_eff):
            omega = dtau_eff * f + jnp.sqrt(2.0 * dtau_eff) * eta
            t = th + omega
            return t - two_pi * jnp.round(t / two_pi)

        if own_mask is None:
            def step_math(th, eta, dtau):
                f, p01 = drift_and_p01(th)
                dnorm = jnp.max(jnp.abs(f))
                scale = jnp.minimum(1.0, cap / jnp.maximum(dnorm, f32(1e-30)))
                new_th = update(th, f, eta, dtau * scale)
                bad = (
                    jnp.sum(jnp.where(jnp.isfinite(new_th), f32(0.0), f32(1.0)))
                    > 0.0
                )
                # observable samples the pre-update links; frame SUM of the
                # mean plaquette (two-level accumulation, integrators/accum.py)
                plaq_mean = jnp.sum(jnp.cos(p01)) * inv_vol
                return new_th, plaq_mean, dnorm, bad

            return step_math

        # chunk mode (r5): no per-step rescale (it needs a per-micro-step
        # GLOBAL drift max — a collective the communication-avoiding chunk
        # cannot afford); a cap event instead flags the frame for rejection.
        # Stats are masked to the OWNED sites (halo stats are the
        # neighbours' business); plaq comes back as a SUM (the runner
        # psums across shards before normalising).
        def step_chunk(th, eta, dtau):
            f, p01 = drift_and_p01(th)
            dnorm = jnp.max(jnp.where(own_mask, jnp.abs(f), f32(0.0)))
            new_th = update(th, f, eta, dtau)
            fin = jnp.isfinite(new_th) | ~own_mask
            bad = jnp.sum(jnp.where(fin, f32(0.0), f32(1.0))) > 0.0
            plaq_sum = jnp.sum(jnp.where(own_mask, jnp.cos(p01), f32(0.0)))
            return new_th, plaq_sum, dnorm, bad, dnorm > cap

        return step_chunk

    return 2, 2, make_step


def _build_frame_kernel(action, cfg: GaugeConfig, ops_factory):
    planes, noise_planes, make_step = ops_factory(action, cfg)
    L0, L1 = cfg.shape
    S, F, _g = _lattice_layout(cfg)
    f32 = np.float32
    plane = L0 * L1

    def kernel(
        scalars_ref,  # SMEM (3,): seed, step_base, chain_offset
        th_ref, dmax_ref, dtau_ref,
        tho_ref, ps_ref, dmaxo_ref, unst_ref,
    ):
        i = pl.program_id(0)
        seed = scalars_ref[0]
        step0 = scalars_ref[1]
        chain = scalars_ref[2] + jnp.uint32(i)
        step_math = make_step()

        # global noise ids: C-order linearization of (noise_planes, L0, L1)
        # — exactly rng.normal_pair_for_shape's counters for the group's
        # noise shape.  The packed (S, F) view preserves the C-order flat
        # index: site = p·L0·L1 + (sub·F + col).
        p_idx = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 1)
        row = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 2)
        col = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 3)
        site = p_idx * jnp.uint32(plane) + row * jnp.uint32(F) + col
        k1 = jnp.uint32(rng.Stream.FIELD) ^ lax.shift_left(chain, jnp.uint32(8))

        dtau = dtau_ref[0, i]

        def substep(eta):
            th = tho_ref[:]          # (1, planes, S, F)
            ps = ps_ref[0, i]
            dmax = dmaxo_ref[0, i]
            unst = unst_ref[0, i] > 0

            new_th, plaq_mean, dnorm, bad = step_math(th, eta, dtau)
            ps2 = ps + plaq_mean
            dmax2 = jnp.maximum(dmax, dnorm)

            tho_ref[:] = jnp.where(unst, th, new_th)
            ps_ref[0, i] = jnp.where(unst, ps, ps2)
            dmaxo_ref[0, i] = jnp.where(unst, dmax, dmax2)
            unst_ref[0, i] = jnp.where(unst | bad, 1, 0)

        normal_pair = _normal_pair_fn(seed, k1, site)

        def pair_body(k, _):
            step = step0 + jnp.uint32(2) * k.astype(jnp.uint32)
            z0, z1 = normal_pair(step)
            substep(z0)
            substep(z1)
            return 0

        tho_ref[:] = th_ref[:]
        ps_ref[0, i] = 0.0
        dmaxo_ref[0, i] = dmax_ref[0, i]
        unst_ref[0, i] = 0
        lax.fori_loop(0, cfg.loops // 2, pair_body, 0, unroll=False)
        if cfg.loops % 2:
            step = step0 + jnp.uint32(cfg.loops - 1)
            z0, _ = normal_pair(step)
            substep(z0)

    return kernel


def _build_kernel(action, cfg: GaugeConfig):
    return _build_frame_kernel(action, cfg, _u1_ops)


@functools.lru_cache(maxsize=64)
def _frame_call_g(action, cfg: GaugeConfig, interpret: bool):
    ops_factory = _ops_factory_of(action)
    planes = ops_factory(action, cfg)[0]
    kernel = _build_frame_kernel(action, cfg, ops_factory)
    C = cfg.n_chains
    S, F, _g = _lattice_layout(cfg)
    lat = pl.BlockSpec(
        (1, planes, S, F), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    # per-chain scalars as (1, C) SMEM rows: a (C, 1) layout lane-pads each
    # chain to 128 entries and exhausts the 1 MiB SMEM at 256 chains (r4
    # on-device finding: "Used 1.88M of 1.00M smem")
    sca = lambda: pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((C, planes, S, F), jnp.float32),  # links
        jax.ShapeDtypeStruct((1, C), jnp.float32),          # frame plaq sum
        jax.ShapeDtypeStruct((1, C), jnp.float32),          # drift max
        jax.ShapeDtypeStruct((1, C), jnp.int32),            # unstable
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[lat, sca(), sca()],
        out_specs=(lat, sca(), sca(), sca()),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def _su2_ops(action, cfg: GaugeConfig):
    """2-D SU(2) step math: quaternion links as 8 (component, direction)
    planes of a (1, 8, S, F) block.  Reuses the exact quaternion helpers
    of actions/gauge.py (qmul/qconj/qexp_su2/qnormalize are pure jnp and
    lower unchanged in Pallas), so op order matches the XLA integrator."""
    from stochquant_tpu.actions.gauge import qconj, qexp_su2, qmul, qnormalize

    f32 = np.float32
    beta = f32(action.beta)
    cap = f32(cfg.drift_cap)
    inv_vol = f32(1.0 / (cfg.shape[0] * cfg.shape[1]))
    make_roll = _make_roll(cfg)

    def make_step(own_mask=None, roll_factory=None):
        roll = (roll_factory or make_roll)()

        def shq(t, d, sign):
            """quaternion tuple at pos + sign·d̂ (actions.gauge.shift)."""
            return tuple(roll(c, -sign, 2 + d) for c in t)

        return _su2_step_math_fn(shq, f32, beta, cap, inv_vol,
                                 qconj, qexp_su2, qmul, qnormalize,
                                 own_mask=own_mask)

    return 8, 6, make_step


def _su2_step_math_fn(shq, f32, beta, cap, inv_vol,
                      qconj, qexp_su2, qmul, qnormalize, own_mask=None):
    chunk = own_mask is not None

    def step_math(q, eta, dtau):
        # (1, 8, S, F): plane 2c+μ = component c of dir μ
        link = lambda mu: tuple(
            q[:, 2 * c + mu : 2 * c + mu + 1] for c in range(4)
        )
        u = [link(0), link(1)]

        # drift, both directions, on the OLD links (synchronous update);
        # op order mirrors SU2Wilson._staple_sum/drift
        fs = []
        for mu, nu in ((0, 1), (1, 0)):
            u_mu, u_nu = u[mu], u[nu]
            fwd = qmul(
                qmul(shq(u_nu, mu, +1), qconj(shq(u_mu, nu, +1))),
                qconj(u_nu),
            )
            bwd = qmul(
                qmul(
                    qconj(shq(shq(u_nu, mu, +1), nu, -1)),
                    qconj(shq(u_mu, nu, -1)),
                ),
                shq(u_nu, nu, -1),
            )
            v = tuple(ff + bb for ff, bb in zip(fwd, bwd))
            w = qmul(u_mu, v)
            fs.append(tuple(-0.5 * beta * w[c] for c in (1, 2, 3)))

        # drift norm: max over (direction, sites) of √(Σ_a f_a²) — chunk
        # mode masks to OWNED sites (halo stats belong to the neighbours)
        mag0 = jnp.sqrt(sum(c * c for c in fs[0]))
        mag1 = jnp.sqrt(sum(c * c for c in fs[1]))
        if chunk:
            mag0 = jnp.where(own_mask, mag0, f32(0.0))
            mag1 = jnp.where(own_mask, mag1, f32(0.0))
        dnorm = jnp.maximum(jnp.max(mag0), jnp.max(mag1))
        if chunk:
            # no per-step rescale (needs a global max); cap → frame reject
            dtau_eff = dtau
        else:
            scale = jnp.minimum(1.0, cap / jnp.maximum(dnorm, f32(1e-30)))
            dtau_eff = dtau * scale
        namp = jnp.sqrt(2.0 * dtau_eff)

        new_planes = []
        bad = jnp.zeros((), f32)
        for mu in (0, 1):
            om = tuple(
                dtau_eff * fs[mu][a]
                + namp * eta[:, 2 * a + mu : 2 * a + mu + 1]
                for a in range(3)
            )
            r = qexp_su2(om[0], om[1], om[2])
            nq = qnormalize(qmul(r, u[mu]))
            for c in range(4):
                fin = jnp.isfinite(nq[c])
                if chunk:
                    fin = fin | ~own_mask
                bad = bad + jnp.sum(jnp.where(fin, f32(0.0), f32(1.0)))
            new_planes.append(nq)
        tripped = bad > 0.0
        # interleave back to plane layout 2c+μ
        new_q = jnp.concatenate(
            [new_planes[mu][c] for c in range(4) for mu in (0, 1)], axis=1
        )

        # ½Tr plaquette = scalar part, sampled on the pre-update links
        p = qmul(
            qmul(u[0], shq(u[1], 0, +1)),
            qmul(qconj(shq(u[0], 1, +1)), qconj(u[1])),
        )
        if chunk:
            plaq_sum = jnp.sum(jnp.where(own_mask, p[0], f32(0.0)))
            return new_q, plaq_sum, dnorm, tripped, dnorm > cap
        plaq_mean = jnp.sum(p[0]) * inv_vol
        return new_q, plaq_mean, dnorm, tripped

    return step_math


def _build_su2_kernel(action, cfg: GaugeConfig):
    return _build_frame_kernel(action, cfg, _su2_ops)


def _su3_ops(action, cfg: GaugeConfig):
    """2-D SU(3) step math (VERDICT r2 item 2): matrix links as 36
    (direction, row, col, re/im) planes of a (1, 36, L0, L1) block,
    plane index μ·18 + (3i+j)·2 + reim.  Per micro-step, per direction:
    staple sum (4 split-complex 3×3 matmuls), Wilson drift H =
    (β/4N)·[i(M−M†) − tr/N], Gell-Mann noise combination, exact
    Cayley–Hamilton exponential (actions/gauge.py:expi_su3 re-derived on
    split re/im), group update + one-Newton-step re-unitarization
    (project_su3).  All lane-batched over the lattice — ~10 matmuls/link of
    pure VPU elementwise work fused in VMEM."""
    f32 = np.float32
    beta = f32(action.beta)
    cap = f32(cfg.drift_cap)
    inv_vol = f32(1.0 / (cfg.shape[0] * cfg.shape[1]))
    s3 = f32(1.0 / np.sqrt(3.0))
    make_roll = _make_roll(cfg)

    def link(q, mu):
        """split-complex 3×3 matrix field for direction mu."""
        return [
            [
                (
                    q[:, mu * 18 + (3 * r + c) * 2 : mu * 18 + (3 * r + c) * 2 + 1],
                    q[:, mu * 18 + (3 * r + c) * 2 + 1 : mu * 18 + (3 * r + c) * 2 + 2],
                )
                for c in range(3)
            ]
            for r in range(3)
        ]

    # ``sh`` (the roll-dependent matrix shift) is built per-kernel in
    # make_step and threaded through the staple/drift helpers
    def staple(sh, u, mu, nu):
        """forward + backward staple V_μ (SU3Wilson._staple_sum order)."""
        u_mu, u_nu = u[mu], u[nu]
        f = _cmat_mul(
            _cmat_mul(sh(u_nu, mu, +1), _cmat_dag(sh(u_mu, nu, +1))),
            _cmat_dag(u_nu),
        )
        b = _cmat_mul(
            _cmat_mul(
                _cmat_dag(sh(sh(u_nu, mu, +1), nu, -1)),
                _cmat_dag(sh(u_mu, nu, -1)),
            ),
            sh(u_nu, nu, -1),
        )
        return _cmat_add(f, b)

    def drift_h(sh, u, mu, nu):
        """H = (β/4N)·[G − (tr G/N)·1], G = i(M − M†), M = U_μ·V_μ."""
        m = _cmat_mul(u[mu], staple(sh, u, mu, nu))
        g = [
            [
                (
                    -(m[r][c][1] + m[c][r][1]),
                    m[r][c][0] - m[c][r][0],
                )
                for c in range(3)
            ]
            for r in range(3)
        ]
        tr_r = g[0][0][0] + g[1][1][0] + g[2][2][0]
        tr_i = g[0][0][1] + g[1][1][1] + g[2][2][1]
        coef = f32(beta / 12.0)  # β/(4N), N = 3
        third = f32(1.0 / 3.0)
        h = [
            [
                (
                    coef * (g[r][c][0] - (tr_r * third if r == c else f32(0.0))),
                    coef * (g[r][c][1] - (tr_i * third if r == c else f32(0.0))),
                )
                for c in range(3)
            ]
            for r in range(3)
        ]
        return h

    def frob2(h):
        """Σ_{ij} |h_ij|² per site."""
        t = None
        for r in range(3):
            for c in range(3):
                v = h[r][c][0] * h[r][c][0] + h[r][c][1] * h[r][c][1]
                t = v if t is None else t + v
        return t

    def noise_h(eta, mu):
        """Σ_a η_a T_a (Gell-Mann halves, SU3Wilson.noise_to_tangent)."""
        e = lambda a: eta[:, 2 * a + mu : 2 * a + mu + 1]
        e1, e2, e3, e4, e5, e6, e7, e8 = (e(a) for a in range(8))
        z = jnp.zeros_like(e1)
        half = f32(0.5)
        return [
            [
                (half * e3 + half * s3 * e8, z),
                (half * e1, -half * e2),
                (half * e4, -half * e5),
            ],
            [
                (half * e1, half * e2),
                (-half * e3 + half * s3 * e8, z),
                (half * e6, -half * e7),
            ],
            [
                (half * e4, half * e5),
                (half * e6, half * e7),
                (-s3 * e8, z),
            ],
        ]

    def expi(qm):
        """exp(iQ) via Cayley–Hamilton on split re/im — the exact port
        of actions.gauge.expi_su3 (same guards and branches)."""
        q2 = _cmat_mul(qm, qm)
        q3 = _cmat_mul(q2, qm)
        c1 = half_tr_re(q2)
        c0 = (q3[0][0][0] + q3[1][1][0] + q3[2][2][0]) * f32(1.0 / 3.0)

        small = c1 < f32(1e-8)
        c1s = jnp.where(small, f32(1.0), c1)
        c0a = jnp.abs(c0)
        c1_3 = c1s / 3.0
        # x**1.5 would lower through Mosaic's fast exp/log pow —
        # ~1e-2-grade error that broke the on-device gate; x·√x is
        # exactly rounded
        c0max = 2.0 * c1_3 * jnp.sqrt(c1_3)
        theta = _acosf(jnp.clip(c0a / c0max, 0.0, 1.0 - 1e-6))
        uu = jnp.sqrt(c1s / 3.0) * jnp.cos(theta / 3.0)
        w = jnp.sqrt(c1s) * jnp.sin(theta / 3.0)
        w2 = w * w
        xi0 = jnp.where(
            w2 < 1e-4,
            1.0 - w2 / 6.0 * (1.0 - w2 / 20.0 * (1.0 - w2 / 42.0)),
            jnp.sin(w) / jnp.where(w2 < 1e-4, f32(1.0), w),
        )
        cosw = jnp.cos(w)
        e2iu = (jnp.cos(2.0 * uu), jnp.sin(2.0 * uu))
        emiu = (jnp.cos(uu), -jnp.sin(uu))
        u2 = uu * uu

        h0 = _cadd(
            ((u2 - w2) * e2iu[0], (u2 - w2) * e2iu[1]),
            _cmul(emiu, (8.0 * u2 * cosw, 2.0 * uu * (3.0 * u2 + w2) * xi0)),
        )
        h1 = _cadd(
            (2.0 * uu * e2iu[0], 2.0 * uu * e2iu[1]),
            _cmul((-emiu[0], -emiu[1]),
                  (2.0 * uu * cosw, -(3.0 * u2 - w2) * xi0)),
        )
        h2 = _cadd(
            e2iu,
            _cmul((-emiu[0], -emiu[1]), (cosw, 3.0 * uu * xi0)),
        )
        denom = 9.0 * u2 - w2
        inv_d = 1.0 / denom
        f0 = (h0[0] * inv_d, h0[1] * inv_d)
        f1 = (h1[0] * inv_d, h1[1] * inv_d)
        f2 = (h2[0] * inv_d, h2[1] * inv_d)
        neg = c0 < 0.0
        f0 = (f0[0], jnp.where(neg, -f0[1], f0[1]))
        f1 = (jnp.where(neg, -f1[0], f1[0]), f1[1])
        f2 = (f2[0], jnp.where(neg, -f2[1], f2[1]))

        out = []
        for r in range(3):
            orow = []
            for c in range(3):
                closed = _cadd(
                    _cmul(f1, qm[r][c]), _cmul(f2, q2[r][c])
                )
                if r == c:
                    closed = _cadd(closed, f0)
                # Taylor fallback at Q → 0: 1 + iQ − Q²/2 − (i/6)Q³
                tay = (
                    (f32(1.0) if r == c else f32(0.0))
                    - qm[r][c][1]
                    - 0.5 * q2[r][c][0]
                    + q3[r][c][1] * f32(1.0 / 6.0),
                    qm[r][c][0]
                    - 0.5 * q2[r][c][1]
                    - q3[r][c][0] * f32(1.0 / 6.0),
                )
                orow.append(
                    (
                        jnp.where(small, tay[0], closed[0]),
                        jnp.where(small, tay[1], closed[1]),
                    )
                )
            out.append(orow)
        return out

    def half_tr_re(q2):
        return 0.5 * (q2[0][0][0] + q2[1][1][0] + q2[2][2][0])

    def project(u):
        """project_su3 on split re/im: one Newton step toward unitary,
        then divide out the det phase."""
        w = _cmat_mul(_cmat_dag(u), u)
        x = [
            [
                (
                    (f32(1.5) if r == c else f32(0.0)) - 0.5 * w[r][c][0],
                    -0.5 * w[r][c][1],
                )
                for c in range(3)
            ]
            for r in range(3)
        ]
        v = _cmat_mul(u, x)
        csub = lambda a, b: (a[0] - b[0], a[1] - b[1])
        m0 = csub(_cmul(v[1][1], v[2][2]), _cmul(v[1][2], v[2][1]))
        m1 = csub(_cmul(v[1][0], v[2][2]), _cmul(v[1][2], v[2][0]))
        m2 = csub(_cmul(v[1][0], v[2][1]), _cmul(v[1][1], v[2][0]))
        det = _cadd(
            csub(_cmul(v[0][0], m0), _cmul(v[0][1], m1)),
            _cmul(v[0][2], m2),
        )
        ang = _atan2f(det[1], det[0])  # no atan2 in Mosaic (see _atanf)
        ph = (jnp.cos(ang * f32(-1.0 / 3.0)), jnp.sin(ang * f32(-1.0 / 3.0)))
        return [[_cmul(v[r][c], ph) for c in range(3)] for r in range(3)]

    def step_math(sh, q, eta, dtau, own_mask=None):
        # q: (1, 36, S, F)
        chunk = own_mask is not None
        u = [link(q, 0), link(q, 1)]
        hs = [drift_h(sh, u, 0, 1), drift_h(sh, u, 1, 0)]

        # drift norm √(2·ΣTr H²) per link, max over sites & directions —
        # chunk mode masks to OWNED sites
        mag0 = jnp.sqrt(2.0 * frob2(hs[0]))
        mag1 = jnp.sqrt(2.0 * frob2(hs[1]))
        if chunk:
            mag0 = jnp.where(own_mask, mag0, f32(0.0))
            mag1 = jnp.where(own_mask, mag1, f32(0.0))
        dnorm = jnp.maximum(jnp.max(mag0), jnp.max(mag1))
        if chunk:
            # no per-step rescale (global max unavailable); cap → reject
            dtau_eff = dtau
        else:
            scale = jnp.minimum(1.0, cap / jnp.maximum(dnorm, f32(1e-30)))
            dtau_eff = dtau * scale
        namp = jnp.sqrt(2.0 * dtau_eff)

        new_planes = []
        bad = jnp.zeros((), f32)
        for mu in (0, 1):
            nh = noise_h(eta, mu)
            om = [
                [
                    (
                        dtau_eff * hs[mu][r][c][0] + namp * nh[r][c][0],
                        dtau_eff * hs[mu][r][c][1] + namp * nh[r][c][1],
                    )
                    for c in range(3)
                ]
                for r in range(3)
            ]
            rot = expi(om)
            nq = project(_cmat_mul(rot, u[mu]))
            for r in range(3):
                for c in range(3):
                    fin_re = jnp.isfinite(nq[r][c][0])
                    fin_im = jnp.isfinite(nq[r][c][1])
                    if chunk:
                        fin_re = fin_re | ~own_mask
                        fin_im = fin_im | ~own_mask
                    bad = bad + jnp.sum(
                        jnp.where(fin_re, f32(0.0), f32(1.0))
                    ) + jnp.sum(
                        jnp.where(fin_im, f32(0.0), f32(1.0))
                    )
            new_planes.append(nq)
        tripped = bad > 0.0

        # plane layout μ·18 + (3r+c)·2 + reim
        new_q = jnp.concatenate(
            [
                new_planes[mu][r][c][p]
                for mu in (0, 1)
                for r in range(3)
                for c in range(3)
                for p in (0, 1)
            ],
            axis=1,
        )

        # ⟨Re Tr P / N⟩ on the pre-update links (SU3Wilson.mean_plaquette)
        pmat = _cmat_mul(
            _cmat_mul(u[0], sh(u[1], 0, +1)),
            _cmat_mul(_cmat_dag(sh(u[0], 1, +1)), _cmat_dag(u[1])),
        )
        retr = pmat[0][0][0] + pmat[1][1][0] + pmat[2][2][0]
        if chunk:
            plaq_sum = jnp.sum(
                jnp.where(own_mask, retr * f32(1.0 / 3.0), f32(0.0))
            )
            return new_q, plaq_sum, dnorm, tripped, dnorm > cap
        plaq_mean = jnp.sum(retr * f32(1.0 / 3.0)) * inv_vol
        return new_q, plaq_mean, dnorm, tripped

    def make_step(own_mask=None, roll_factory=None):
        roll = (roll_factory or make_roll)()
        sh = lambda A, d, sign: _cmat_map(A, d, sign, roll)
        return lambda q, eta, dtau: step_math(sh, q, eta, dtau,
                                              own_mask=own_mask)

    return 36, 16, make_step


def _build_su3_kernel(action, cfg: GaugeConfig):
    return _build_frame_kernel(action, cfg, _su3_ops)


def gauge_frame_pallas(state: GaugeState, action, cfg: GaugeConfig, *, interpret=False):
    """One frame through the fused U(1) kernel + the exact XLA epilogue of
    integrators/gauge.py's frame (accept/reject, adaptive Δτ, merge)."""
    if not supports(action, cfg):
        raise ValueError(
            "gauge kernel supports 2-D compact u1/su2 without cooling; use "
            "the XLA path (integrators.gauge.run_gauge_frames) otherwise"
        )
    C = cfg.n_chains
    call = _frame_call_g(action, cfg, interpret)
    links_in = _links_to_planes(state.links, action, cfg)
    scalars = jnp.array([cfg.seed, 0, 0], jnp.uint32).at[1].set(state.step)
    links, ps, dmax, unst = call(
        scalars,
        links_in,
        state.drift_max[None, :],
        state.dtau[None, :],
    )
    links = _planes_to_links(links, action, cfg)
    ps, dmax = ps[0], dmax[0]
    accept = unst[0] == 0

    n_new = accum.runs_after(state.runs, cfg.loops)
    pm = accum.merge_frame_sum(state.plaq_mean, ps, cfg.loops, n_new)

    au = accept.reshape((C,) + (1,) * (links.ndim - 1))
    sel = lambda new, old: jnp.where(accept, new, old)
    grow = accept & (state.stab_cnt >= cfg.grow_after)
    dtau = jnp.where(
        grow,
        state.dtau / cfg.shrink,
        jnp.where(accept, state.dtau, state.dtau * cfg.shrink),
    )
    if cfg.dtau_max is not None:
        dtau = jnp.minimum(dtau, jnp.float32(cfg.dtau_max))
    new_state = GaugeState(
        links=jnp.where(au, links, state.links),
        plaq_mean=sel(pm, state.plaq_mean),
        drift_max=sel(dmax, state.drift_max),
        runs=accum.bump_runs(state.runs, cfg.loops, accept),
        dtau=dtau,
        stab_cnt=jnp.where(
            accept,
            jnp.where(state.stab_cnt >= cfg.grow_after, 0, state.stab_cnt + 1),
            0,
        ),
        step=state.step + jnp.uint32(cfg.loops),
    )
    metrics = {
        "stable": accept,
        "dtau": dtau,
        "drift_max": dmax,
        "unitarity_norm": action.unitarity_norm(new_state.links, cfg.ndim),
    }
    return new_state, metrics


def _build_multiframe_kernel(action, cfg: GaugeConfig, K: int, ops_factory):
    """K frames per launch for ANY fused gauge group (u1/su2/su3 via the
    shared per-group ``step_math``) with the accept/reject + plaquette-mean
    merge + adaptive-Δτ epilogue IN-KERNEL (the gauge analog of the
    chain/field multi-frame kernels; per-frame semantics identical to K
    single-frame launches — same Threefry counters, same epilogue
    expressions incl. the uint32-pair runs carry)."""
    planes, noise_planes, make_step = ops_factory(action, cfg)
    L0, L1 = cfg.shape
    S, F, _g = _lattice_layout(cfg)
    f32 = np.float32
    plane = L0 * L1
    loops = cfg.loops
    shrink = f32(cfg.shrink)
    inv_loops = f32(1.0 / loops)

    def kernel(
        scalars_ref,  # SMEM (3,): seed, step_base, chain_offset
        th_ref, dmax_ref, dtau_ref, pm_ref, rlo_ref, rhi_ref, stab_ref,
        tho_ref, dmaxo_ref, dtauo_ref, pmo_ref, rloo_ref, rhio_ref, stabo_ref,
        st_hist_ref, dt_hist_ref, dm_hist_ref,
        ths_ref,  # scratch: frame link snapshot (VMEM)
        fs_ref,   # scratch SMEM (4,): frame Σ plaq, dmax snapshot, unstable
    ):
        i = pl.program_id(0)
        seed = scalars_ref[0]
        step00 = scalars_ref[1]
        chain = scalars_ref[2] + jnp.uint32(i)
        step_math = make_step()

        # packed (S, F) view preserves the C-order flat site index
        p_idx = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 1)
        row = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 2)
        col = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 3)
        site = p_idx * jnp.uint32(plane) + row * jnp.uint32(F) + col
        k1 = jnp.uint32(rng.Stream.FIELD) ^ lax.shift_left(chain, jnp.uint32(8))

        def substep(eta):
            th = tho_ref[:]
            ps = fs_ref[0]
            dmax = dmaxo_ref[0, i]
            unst = fs_ref[2] > 0.0

            dtau = dtauo_ref[0, i]
            new_th, plaq_mean, dnorm, bad = step_math(th, eta, dtau)
            ps2 = ps + plaq_mean
            dmax2 = jnp.maximum(dmax, dnorm)

            tho_ref[:] = jnp.where(unst, th, new_th)
            fs_ref[0] = jnp.where(unst, ps, ps2)
            dmaxo_ref[0, i] = jnp.where(unst, dmax, dmax2)
            fs_ref[2] = jnp.where(unst | bad, f32(1.0), f32(0.0))

        normal_pair = _normal_pair_fn(seed, k1, site)

        def u32_to_f32(v):
            hi = lax.shift_right_logical(v, jnp.uint32(16)).astype(jnp.int32)
            lo = (v & jnp.uint32(0xFFFF)).astype(jnp.int32)
            return hi.astype(f32) * f32(65536.0) + lo.astype(f32)

        def frame_body(j, _):
            ths_ref[:] = tho_ref[:]
            fs_ref[0] = 0.0                    # frame Σ plaquette
            fs_ref[1] = dmaxo_ref[0, i]        # drift-max snapshot
            fs_ref[2] = 0.0                    # unstable flag

            step0 = step00 + j.astype(jnp.uint32) * jnp.uint32(loops)

            def pair_body(k, _):
                step = step0 + jnp.uint32(2) * k.astype(jnp.uint32)
                z0, z1 = normal_pair(step)
                substep(z0)
                substep(z1)
                return 0

            lax.fori_loop(0, loops // 2, pair_body, 0, unroll=False)
            if loops % 2:
                z0, _ = normal_pair(step0 + jnp.uint32(loops - 1))
                substep(z0)

            # --- in-kernel epilogue (gauge_frame_pallas's, verbatim) -------
            accept = fs_ref[2] == 0.0
            dtau_old = dtauo_ref[0, i]
            rlo = rloo_ref[0, i]
            lo_n = rlo + jnp.uint32(loops)
            carry = jnp.where(lo_n < rlo, jnp.uint32(1), jnp.uint32(0))
            hi_n = rhio_ref[0, i] + carry
            n_new = u32_to_f32(hi_n) * f32(4294967296.0) + u32_to_f32(lo_n)
            w = f32(loops) / n_new
            pm = pmo_ref[0, i]
            merged = pm + (fs_ref[0] * inv_loops - pm) * w
            pmo_ref[0, i] = jnp.where(accept, merged, pm)

            tho_ref[:] = jnp.where(accept, tho_ref[:], ths_ref[:])
            dmaxo_ref[0, i] = jnp.where(accept, dmaxo_ref[0, i], fs_ref[1])
            rloo_ref[0, i] = jnp.where(accept, lo_n, rlo)
            rhio_ref[0, i] = jnp.where(accept, hi_n, rhio_ref[0, i])

            grow = accept & (stabo_ref[0, i] >= cfg.grow_after)
            dtau_new = jnp.where(
                grow,
                dtau_old / shrink,
                jnp.where(accept, dtau_old, dtau_old * shrink),
            )
            if cfg.dtau_max is not None:
                dtau_new = jnp.minimum(dtau_new, f32(cfg.dtau_max))
            dtauo_ref[0, i] = dtau_new
            stabo_ref[0, i] = jnp.where(
                accept, jnp.where(grow, 0, stabo_ref[0, i] + 1), 0
            )

            st_hist_ref[j, i] = jnp.where(accept, 1, 0)
            dt_hist_ref[j, i] = dtau_new
            dm_hist_ref[j, i] = dmaxo_ref[0, i]
            return 0

        tho_ref[:] = th_ref[:]
        dmaxo_ref[0, i] = dmax_ref[0, i]
        dtauo_ref[0, i] = dtau_ref[0, i]
        pmo_ref[0, i] = pm_ref[0, i]
        rloo_ref[0, i] = rlo_ref[0, i]
        rhio_ref[0, i] = rhi_ref[0, i]
        stabo_ref[0, i] = stab_ref[0, i]
        for j0 in range(K):
            st_hist_ref[j0, i] = 0
            dt_hist_ref[j0, i] = 0.0
            dm_hist_ref[j0, i] = 0.0
        lax.fori_loop(0, K, frame_body, 0, unroll=False)

    return kernel


def _ops_factory_of(action):
    from stochquant_tpu.actions.gauge import SU2Wilson, SU3Wilson

    if isinstance(action, SU2Wilson):
        return _su2_ops
    if isinstance(action, SU3Wilson):
        return _su3_ops
    return _u1_ops


def links_to_planes_shaped(links, action, C, shape):
    """Native links → UNPACKED (C, planes, L0, L1) f32 planes for an
    arbitrary lattice extent (``shape`` may be a halo-extended LOCAL block —
    the chunk runner's case — or the global lattice)."""
    from stochquant_tpu.actions.gauge import SU2Wilson, SU3Wilson

    L0, L1 = shape
    if isinstance(action, SU2Wilson):
        return links.reshape((C, 8, L0, L1))
    if isinstance(action, SU3Wilson):
        # (C, 2, L0, L1, 3, 3) complex → 36 real planes μ·18+(3r+c)·2+reim
        planes = jnp.stack([jnp.real(links), jnp.imag(links)], axis=-1)
        return jnp.transpose(planes, (0, 1, 4, 5, 6, 2, 3)).reshape(
            (C, 36, L0, L1)
        )
    return links.reshape((C, 2, L0, L1))


def planes_to_links_shaped(planes, action, C, shape):
    """Inverse of :func:`links_to_planes_shaped`."""
    from stochquant_tpu.actions.gauge import SU2Wilson, SU3Wilson

    L0, L1 = shape
    if isinstance(action, SU2Wilson):
        return planes.reshape((C, 4, 2, L0, L1))
    if isinstance(action, SU3Wilson):
        p = jnp.transpose(
            planes.reshape((C, 2, 3, 3, 2, L0, L1)), (0, 1, 5, 6, 2, 3, 4)
        )
        return lax.complex(p[..., 0], p[..., 1])
    return planes.reshape((C, 2, L0, L1))


def _links_to_planes(links, action, cfg: GaugeConfig):
    """State links → the kernel's (C, planes, S, F) f32 plane layout (the
    lane-packed (S, F) lattice view is a C-order reshape — free in XLA)."""
    C = cfg.n_chains
    S, F, _g = _lattice_layout(cfg)
    planes = links_to_planes_shaped(links, action, C, cfg.shape)
    return planes.reshape(planes.shape[:2] + (S, F))


def _planes_to_links(planes, action, cfg: GaugeConfig):
    C = cfg.n_chains
    L0, L1 = cfg.shape
    return planes_to_links_shaped(
        planes.reshape(planes.shape[:2] + (L0, L1)), action, C, cfg.shape
    )


@functools.lru_cache(maxsize=64)
def _multiframe_call(action, cfg: GaugeConfig, K: int, interpret: bool):
    ops_factory = _ops_factory_of(action)
    planes = ops_factory(action, cfg)[0]
    kernel = _build_multiframe_kernel(action, cfg, K, ops_factory)
    C = cfg.n_chains
    S, F, _g = _lattice_layout(cfg)
    lat = lambda: pl.BlockSpec(
        (1, planes, S, F), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    # (1, C) / (K, C) SMEM layouts — see _frame_call_g's note on lane padding
    sca = lambda: pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)
    hist = lambda: pl.BlockSpec((K, C), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)
    f32s = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    out_shapes = (
        f32s((C, planes, S, F)),                      # links (planes)
        f32s((1, C)), f32s((1, C)), f32s((1, C)),     # dmax, dtau, plaq_mean
        jax.ShapeDtypeStruct((1, C), jnp.uint32),     # runs lo
        jax.ShapeDtypeStruct((1, C), jnp.uint32),     # runs hi
        jax.ShapeDtypeStruct((1, C), jnp.int32),      # stab_cnt
        jax.ShapeDtypeStruct((K, C), jnp.int32),      # stable history
        f32s((K, C)),                                 # dtau history
        f32s((K, C)),                                 # drift-max history
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[lat(), sca(), sca(), sca(), sca(), sca(), sca()],
        out_specs=(
            lat(), sca(), sca(), sca(), sca(), sca(), sca(),
            hist(), hist(), hist(),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, planes, S, F), jnp.float32),  # link snapshot
            pltpu.SMEM((4,), jnp.float32),            # Σ plaq, dmax snap, unst
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret
    )


def gauge_frames_multi(
    state: GaugeState, action, cfg: GaugeConfig, K: int, *, interpret=False
):
    """K frames in ONE launch through the fused kernel of any supported
    group (u1/su2/su3 — r4 generalizes the r3 u1-only path), epilogue
    in-kernel; returns (state, {stable/dtau/drift_max histories, (K, C)})."""
    if not supports(action, cfg):
        raise ValueError(
            "frames_per_launch > 1 needs a fused-kernel group (2-D "
            "u1/su2/su3 without cooling); use the XLA path otherwise"
        )
    C = cfg.n_chains
    call = _multiframe_call(action, cfg, K, interpret)
    scalars = jnp.array([cfg.seed, 0, 0], jnp.uint32).at[1].set(state.step)
    col = lambda v: v[None, :]
    (
        links, dmax, dtau, pm, rlo, rhi, stab, st_h, dt_h, dm_h,
    ) = call(
        scalars,
        _links_to_planes(state.links, action, cfg),
        col(state.drift_max),
        col(state.dtau),
        col(state.plaq_mean),
        state.runs[:, 0][None, :],
        state.runs[:, 1][None, :],
        col(state.stab_cnt),
    )
    links = _planes_to_links(links, action, cfg)
    new_state = GaugeState(
        links=links,
        plaq_mean=pm[0],
        drift_max=dmax[0],
        runs=jnp.stack([rlo[0], rhi[0]], axis=1),
        dtau=dtau[0],
        stab_cnt=stab[0],
        step=state.step + jnp.uint32(cfg.loops) * jnp.uint32(K),
    )
    metrics = {
        "stable": st_h != 0,  # (K, C)
        "dtau": dt_h,
        "drift_max": dm_h,
        # 0 placeholder within the launch (metrics-shape parity with the
        # single-frame path, which reports it per frame; the true value for
        # the final state is cheap in XLA below)
        "unitarity_norm": jnp.zeros((K, C), jnp.float32).at[-1].set(
            action.unitarity_norm(links, cfg.ndim)
        ),
    }
    return new_state, metrics


def u1_frames_multi(
    state: GaugeState, action, cfg: GaugeConfig, K: int, *, interpret=False
):
    """Backward-compat alias for :func:`gauge_frames_multi` (r3 name)."""
    return gauge_frames_multi(state, action, cfg, K, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("action", "cfg", "n_frames", "interpret", "frames_per_launch"),
)
def run_gauge_frames_pallas(
    state: GaugeState, action, cfg: GaugeConfig, n_frames: int,
    interpret: bool = False, frames_per_launch: int = 1,
):
    """Drop-in replacement for integrators.gauge.run_gauge_frames (2-D
    u1/su2/su3).

    frames_per_launch > 1 (any fused group since r4) batches K frames per
    kernel launch with the accept/reject + merge + adaptive-Δτ epilogue
    IN-KERNEL — per-frame trajectories, means and Δτ schedules identical to
    K single-frame launches.  Metrics keep the per-frame shape
    (n_frames, C)."""
    if frames_per_launch <= 1:
        return lax.scan(
            lambda s, _: gauge_frame_pallas(s, action, cfg, interpret=interpret),
            state,
            None,
            length=n_frames,
        )
    K = frames_per_launch
    n_launches = n_frames // K
    rem = n_frames - n_launches * K
    metrics_parts = []
    if n_launches:
        state, m = lax.scan(
            lambda s, _: gauge_frames_multi(
                s, action, cfg, K, interpret=interpret
            ),
            state,
            None,
            length=n_launches,
        )
        metrics_parts.append(
            {k: v.reshape((n_launches * K,) + v.shape[2:]) for k, v in m.items()}
        )
    if rem:
        state, m_tail = lax.scan(
            lambda s, _: gauge_frame_pallas(s, action, cfg, interpret=interpret),
            state,
            None,
            length=rem,
        )
        metrics_parts.append(m_tail)
    if len(metrics_parts) == 2:
        metrics = {
            k: jnp.concatenate([metrics_parts[0][k], metrics_parts[1][k]], axis=0)
            for k in metrics_parts[0]
        }
    else:
        metrics = metrics_parts[0]
    return state, metrics


# ---------------------------------------------------------------------------
# Gauge chunk kernel (r5, VERDICT r4 item 3): the communication-avoiding
# composition for dim-0-split 2-D gauge lattices.  Per W micro-steps the
# runner (parallel/gauge_halo.make_gauge_chunk_runner) ring-exchanges an
# H = W row halo; ONE launch then advances the whole halo-extended local
# block W steps with trapezoidal recompute — the global-(chain, link, step)
# Threefry counters make the recomputed halo sites bitwise equal to the
# owning shard's, so per-site trajectories match the UNSHARDED fused kernel
# by construction (the gauge analog of field_kernel_nd's chunk path;
# reference anchor: tauhost.c:481's one-launch frame, kept under sharding).
#
# Semantics note — the drift cap: the unsharded kernels rescale dτ_eff from
# the PER-MICRO-STEP GLOBAL drift max, a collective no communication-
# avoiding chunk can afford.  In chunk mode a cap event (|f| > drift_cap
# anywhere, any step) instead flags the FRAME for rejection (rollback + Δτ
# shrink — the recovery the chain/field sectors already use).  While the
# cap is quiescent, scale == 1.0 exactly, so chunk trajectories are bitwise
# equal to the unsharded rescaling kernel; a frame where the cap would have
# fired is rejected here but rescaled-and-accepted there (both shrink
# headroom — the controller converges either way; use the XLA halo runner
# when exact rescale semantics matter).
# ---------------------------------------------------------------------------


def _build_gauge_chunk_kernel(action, cfg: GaugeConfig, ops_factory, W, H, loc0):
    planes, noise_planes, make_step = ops_factory(action, cfg)
    L0g, L1 = cfg.shape
    E0 = loc0 + 2 * H
    S, F, _g = _pack_shape((E0, L1))
    f32 = np.float32
    plane_g = L0g * L1
    buf = (H // L0g + 1) * L0g  # keeps the −H underflow positive (uint mod)
    roll_factory = _make_roll_shape((E0, L1))

    def kernel(
        scalars_ref,  # SMEM (4,): seed, step_base, chain_off, row_off
        th_ref, dtau_ref,
        tho_ref, ps_ref, dmax_ref, bad_ref, cap_ref,
    ):
        i = pl.program_id(0)
        seed = scalars_ref[0]
        step0 = scalars_ref[1]
        chain = scalars_ref[2] + jnp.uint32(i)
        row_off = scalars_ref[3]

        # owned-row mask on the packed extended block: flat lane index is
        # the C-order (E0, L1) site id, so row = flat // L1
        sub1 = lax.broadcasted_iota(jnp.int32, (1, 1, S, F), 2)
        col1 = lax.broadcasted_iota(jnp.int32, (1, 1, S, F), 3)
        row1 = (sub1 * jnp.int32(F) + col1) // jnp.int32(L1)
        own = (row1 >= H) & (row1 < H + loc0)
        step_math = make_step(own_mask=own, roll_factory=roll_factory)

        # GLOBAL noise ids (bitwise the unsharded kernel's counters): the
        # extended row maps to global row (row_off + r − H) mod L0g
        p_idx = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 1)
        subn = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 2)
        coln = lax.broadcasted_iota(jnp.uint32, (1, noise_planes, S, F), 3)
        flat = subn * jnp.uint32(F) + coln
        rown = flat // jnp.uint32(L1)
        colg = flat % jnp.uint32(L1)
        row_g = (
            row_off + jnp.uint32(buf) + rown - jnp.uint32(H)
        ) % jnp.uint32(L0g)
        site = p_idx * jnp.uint32(plane_g) + row_g * jnp.uint32(L1) + colg
        k1 = jnp.uint32(rng.Stream.FIELD) ^ lax.shift_left(chain, jnp.uint32(8))

        dtau = dtau_ref[0, i]

        normal_pair = _normal_pair_fn(seed, k1, site)

        def substep(eta):
            th = tho_ref[:]
            new_th, ps_c, dnorm, bad, capped = step_math(th, eta, dtau)
            # no freeze within the chunk: a bad/capped frame is rejected
            # wholesale at the frame boundary, so post-trip values are
            # discarded anyway (see module note above)
            tho_ref[:] = new_th
            ps_ref[0, i] = ps_ref[0, i] + ps_c
            dmax_ref[0, i] = jnp.maximum(dmax_ref[0, i], dnorm)
            bad_ref[0, i] = jnp.where(bad, 1, bad_ref[0, i])
            cap_ref[0, i] = jnp.where(capped, 1, cap_ref[0, i])

        def pair_body(k, _):
            step = step0 + jnp.uint32(2) * k.astype(jnp.uint32)
            z0, z1 = normal_pair(step)
            substep(z0)
            substep(z1)
            return 0

        tho_ref[:] = th_ref[:]
        ps_ref[0, i] = 0.0
        dmax_ref[0, i] = 0.0
        bad_ref[0, i] = 0
        cap_ref[0, i] = 0
        lax.fori_loop(0, W // 2, pair_body, 0, unroll=False)

    return kernel


@functools.lru_cache(maxsize=64)
def _chunk_call_g(action, cfg: GaugeConfig, c_local: int, loc0: int, W: int,
                  interpret: bool):
    ops_factory = _ops_factory_of(action)
    planes = ops_factory(action, cfg)[0]
    H = W
    kernel = _build_gauge_chunk_kernel(action, cfg, ops_factory, W, H, loc0)
    E0 = loc0 + 2 * H
    S, F, _g = _pack_shape((E0, cfg.shape[1]))
    C = c_local
    lat = pl.BlockSpec(
        (1, planes, S, F), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sca = lambda: pl.BlockSpec((1, C), lambda i, *_: (0, 0),
                               memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((C, planes, S, F), jnp.float32),  # ext links
        jax.ShapeDtypeStruct((1, C), jnp.float32),   # Σ_steps Σ_owned plaq
        jax.ShapeDtypeStruct((1, C), jnp.float32),   # chunk drift max
        jax.ShapeDtypeStruct((1, C), jnp.int32),     # nonfinite flag
        jax.ShapeDtypeStruct((1, C), jnp.int32),     # cap-would-fire flag
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[lat, sca()],
        out_specs=(lat, sca(), sca(), sca(), sca()),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def make_gauge_chunk_step(action, cfg: GaugeConfig, c_local: int, loc0: int,
                          W: int, *, interpret: bool = False):
    """Returns ``(step, H)`` where ``step(ext_planes, dtau, step_base,
    chain_off, row_off) -> (owned_planes, plaq_sum, dmax, bad, capped)``
    advances W micro-steps on a halo-extended local block in ONE launch.

    ``ext_planes``: UNPACKED (c_local, planes, loc0 + 2H, L1) f32 planes
    (``links_to_planes_shaped`` of the ppermute-extended local links);
    ``owned_planes`` comes back with the halo rows sliced off.  ``plaq_sum``
    is Σ over the chunk's steps of Σ over OWNED sites of the plaquette
    observable (the runner psums across shards and normalises); ``dmax`` the
    owned drift-norm max; ``bad``/``capped`` per-chain booleans (see the
    module note on cap semantics)."""
    if W % 2 or W < 2:
        raise ValueError("the gauge chunk kernel advances an even number of "
                         "micro-steps (W >= 2)")
    if not supports(action, cfg):
        raise ValueError("gauge chunk kernel: 2-D u1/su2/su3 without "
                         "cooling only; use the XLA halo runner otherwise")
    H = W
    if H > loc0:
        raise ValueError(
            f"gauge chunk halo depth H={H} exceeds the local slab "
            f"({loc0} rows) — single-hop exchange only; lower "
            f"exchange_steps or use the XLA halo runner"
        )
    call = _chunk_call_g(action, cfg, c_local, loc0, W, interpret)
    E0 = loc0 + 2 * H
    L1 = cfg.shape[1]
    P = _ops_factory_of(action)(action, cfg)[0]
    S, F, _g = _pack_shape((E0, L1))

    def step(ext_planes, dtau, step_base, chain_off, row_off):
        u32 = lambda v: jnp.asarray(v, jnp.uint32)
        scalars = jnp.stack(
            [u32(cfg.seed), u32(step_base), u32(chain_off), u32(row_off)]
        )
        out, ps, dmax, bad, capped = call(
            scalars, ext_planes.reshape((c_local, P, S, F)), dtau[None, :]
        )
        out = out.reshape((c_local, P, E0, L1))[:, :, H : H + loc0]
        return out, ps[0], dmax[0], bad[0] != 0, capped[0] != 0

    return step, H
