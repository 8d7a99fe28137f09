"""Tiled Pallas kernel for 2-D lattices that exceed VMEM.

The whole-lattice kernel (field_kernel.py) keeps one chain's full lattice
resident in VMEM for an entire frame — the fastest regime, but bounded by
VMEM.  This module trades that for an HBM-resident field with *temporal
blocking*: each launch advances one PAIR of micro-steps (both Box–Muller
outputs of one Threefry draw) on a horizontal strip of ``tile_rows`` rows,
reading the strip plus an H-row halo above and below (H = stencil depth of
the pair: 2 for synchronous sweeps, 4 for checkerboard half-sweep pairs).
Halo rows are re-computed redundantly instead of exchanged — the classic
trapezoidal scheme — so HBM traffic is ~(1 + 2H/T₀) reads + 1 write per
pair, versus the XLA path's several passes per micro-step.

Halos come straight from HBM through BlockSpec index maps: the same φ array
is passed three times (strip block, H-row block above with wraparound, H-row
block below), so XLA's pipelining overlaps the halo DMAs with compute — no
manual copies.  Edge rows of the extended strip compute garbage (the strip
is not locally periodic); the garbage propagates one row inward per stencil
application and never reaches the T₀ rows that are written back.

Noise is the same global-(site, step)-keyed Threefry as everywhere else, so
trajectories are bit-identical to integrators/field.py and invariant under
the choice of ``tile_rows`` (tests/test_field_kernel_tiled.py).

Observables are accumulated as per-strip partial sums and reduced in the
XLA epilogue per micro-step; the frame-level accept/reject + adaptive-Δτ
logic matches integrators/field.py (chains that trip mid-frame keep
evolving here instead of freezing — every affected value is discarded by
the frame rollback, so accepted trajectories and accept/reject decisions
are identical).
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
from stochquant_tpu.actions.phi4 import FieldAction
from stochquant_tpu.config import FieldConfig, Sweep
from stochquant_tpu.integrators import accum
from stochquant_tpu.integrators.field import FieldState

__all__ = ["run_field_frames_tiled", "field_frame_tiled"]


def _halo_depth(cfg: FieldConfig) -> int:
    # stencil applications per pair: 2 sync sweeps or 4 half-sweeps
    return 4 if cfg.sweep == Sweep.CHECKERBOARD else 2


#: halo block rows — Mosaic requires sublane block dims in multiples of 8;
#: the kernel slices the H ≤ 8 rows it actually needs
_HB = 8


def _build_pair_kernel(action: FieldAction, cfg: FieldConfig, T0: int, H: int):
    L0, L1 = cfg.shape
    f32 = np.float32
    a = cfg.spacing
    inv_a2 = f32(1.0 / (a * a))
    measure = f32(a * a)
    c_amp = f32(cfg.noise_amp)
    clamp = f32(cfg.clamp)
    checkerboard = cfg.sweep == Sweep.CHECKERBOARD
    E = T0 + 2 * H  # extended strip rows

    def kernel(
        scalars_ref,  # SMEM (3,): seed, step (first of the pair), chain_offset
        phic_ref, phiu_ref, phid_ref, dtau_ref,
        phio_ref, sl0_ref, sl1_ref, stats_ref,
    ):
        c = pl.program_id(0)
        i = pl.program_id(1)
        seed = scalars_ref[0]
        step0 = scalars_ref[1]
        chain = scalars_ref[2] + jnp.uint32(c)

        phi0 = jnp.concatenate(
            [phiu_ref[:, _HB - H :], phic_ref[:], phid_ref[:, :H]], axis=1
        )

        # global coordinates of the extended strip (wraparound rows)
        r_loc = lax.broadcasted_iota(jnp.int32, (1, E, L1), 1)
        row_g = (i * T0 - H + r_loc) % L0
        col = lax.broadcasted_iota(jnp.uint32, (1, E, L1), 2)
        site = row_g.astype(jnp.uint32) * jnp.uint32(L1) + col
        k1 = jnp.uint32(rng.Stream.FIELD) ^ lax.shift_left(chain, jnp.uint32(8))

        dtau = dtau_ref[c, 0]
        namp = c_amp * jnp.sqrt(2.0 * dtau / measure)

        if checkerboard:
            colp = lax.broadcasted_iota(jnp.int32, (1, E, L1), 2)
            even = (row_g + colp) % 2 == 0

        def roll(x, shift, axis):
            return pltpu.roll(x, shift % (E if axis == 1 else L1), axis)

        def laplacian(phi):
            # term order matches actions.phi4.periodic_laplacian bitwise
            lap = jnp.zeros_like(phi)
            for d in (1, 2):
                lap = lap + (roll(phi, 1, d) + roll(phi, -1, d) - 2.0 * phi)
            return lap * inv_a2

        def lap_and_act(phi):
            """Shared-roll fusion (r4): the laplacian's up-neighbours double
            as the action density's forward differences — 4 rolls instead
            of 6 per substep (per-term expressions and order unchanged, so
            both outputs are bitwise identical)."""
            lap = jnp.zeros_like(phi)
            kin = jnp.zeros_like(phi)
            for d in (1, 2):
                up = roll(phi, -1, d)
                lap = lap + (roll(phi, 1, d) + up - 2.0 * phi)
                diff = up - phi
                kin = kin + 0.5 * diff * diff * inv_a2
            return lap * inv_a2, kin + action.V(phi)

        def em_apply(phi, mask, noise, lap):
            det = (lap - action.dV(phi).astype(f32)) * dtau
            new_raw = phi + det + noise
            newphi = jnp.clip(new_raw, -clamp, clamp)
            newphi = jnp.where(jnp.isfinite(new_raw), newphi, clamp)
            # non-finite sites inject +inf into |det| so one max reduction
            # both finds the detector statistic and flags NaNs
            absdet = jnp.abs(det)
            absdet = jnp.where(jnp.isfinite(new_raw), absdet, f32(np.inf))
            if mask is not None:
                newphi = jnp.where(mask, newphi, phi)
                absdet = jnp.where(mask, absdet, f32(0.0))
            return newphi, absdet

        def micro(phi, noise):
            """One micro-step; also returns the pre-update action density
            (from the shared rolls) for the stats epilogue."""
            lap, act_d = lap_and_act(phi)
            if checkerboard:
                phi_e, absdet_e = em_apply(phi, even, noise, lap)
                newphi, absdet_o = em_apply(phi_e, ~even, noise, laplacian(phi_e))
                return newphi, jnp.maximum(absdet_e, absdet_o), act_d
            newphi, absdet = em_apply(phi, None, noise, lap)
            return newphi, absdet, act_d

        strip = lambda x: x[:, H : H + T0]

        def stats(phi_pre, phi_post, absdet, act_d, base):
            """Per-strip partial sums/maxima for one micro-step, written to
            stats lanes [base, base+5): Σφ, Σφ², Σs, max|det|, max|φ_new|."""
            p = strip(phi_pre)
            stats_ref[c, i, base + 0] = jnp.sum(p)
            stats_ref[c, i, base + 1] = jnp.sum(p * p)
            stats_ref[c, i, base + 2] = jnp.sum(strip(act_d))
            stats_ref[c, i, base + 3] = jnp.max(strip(absdet))
            stats_ref[c, i, base + 4] = jnp.max(jnp.abs(strip(phi_post)))

        # one Threefry draw serves both micro-steps (both BM outputs)
        b0, b1 = rng.threefry2x32(
            seed, k1, site, step0, rng.rounds_of(cfg.rng_impl)
        )
        u1 = rng.uniform_from_bits(b0)
        u2 = rng.uniform_from_bits(b1)
        rr = jnp.sqrt(f32(-2.0) * jnp.log(u1))
        th = f32(rng._TWO_PI) * u2
        z0 = rr * jnp.cos(th)
        z1 = rr * jnp.sin(th)

        phi1, absdet0, act0 = micro(phi0, namp * z0)
        phi2, absdet1, act1 = micro(phi1, namp * z1)

        inv_l1 = f32(1.0 / L1)
        sl0_ref[:] = jnp.sum(strip(phi0), axis=2, keepdims=True) * inv_l1
        sl1_ref[:] = jnp.sum(strip(phi1), axis=2, keepdims=True) * inv_l1
        stats(phi0, phi1, absdet0, act0, 0)
        stats(phi1, phi2, absdet1, act1, 5)
        phio_ref[:] = strip(phi2)

    return kernel


@functools.lru_cache(maxsize=64)
def _pair_call(action: FieldAction, cfg: FieldConfig, T0: int, interpret: bool):
    H = _halo_depth(cfg)
    L0, L1 = cfg.shape
    C = cfg.n_chains
    if L0 % T0:
        raise ValueError(f"tile_rows={T0} must divide L0={L0}")
    if T0 % _HB:
        raise ValueError(f"tile_rows must be a multiple of {_HB} (Mosaic sublane tiling)")
    nt = L0 // T0
    kernel = _build_pair_kernel(action, cfg, T0, H)

    lat = pl.BlockSpec((1, T0, L1), lambda c, i, *_: (c, i, 0), memory_space=pltpu.VMEM)
    halo_u = pl.BlockSpec(
        (1, _HB, L1),
        lambda c, i, *_: (c, ((i * T0 - _HB) % L0) // _HB, 0),
        memory_space=pltpu.VMEM,
    )
    halo_d = pl.BlockSpec(
        (1, _HB, L1),
        lambda c, i, *_: (c, (((i + 1) * T0) % L0) // _HB, 0),
        memory_space=pltpu.VMEM,
    )
    dtau_spec = pl.BlockSpec((C, 1), lambda c, i, *_: (0, 0), memory_space=pltpu.SMEM)
    sl = pl.BlockSpec((1, T0, 1), lambda c, i, *_: (c, i, 0), memory_space=pltpu.VMEM)
    # full-array SMEM block (like the untiled kernel's per-chain scalars):
    # each program writes its own (c, i) row
    stats = pl.BlockSpec(
        (C, nt, 16), lambda c, i, *_: (0, 0, 0), memory_space=pltpu.SMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((C, L0, L1), jnp.float32),  # phi after the pair
        jax.ShapeDtypeStruct((C, L0, 1), jnp.float32),   # slice means, step 0
        jax.ShapeDtypeStruct((C, L0, 1), jnp.float32),   # slice means, step 1
        jax.ShapeDtypeStruct((C, nt, 16), jnp.float32),  # per-strip stats
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C, nt),
        in_specs=[lat, halo_u, halo_d, dtau_spec],
        out_specs=(lat, sl, sl, stats),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        # the pair kernel's working set (~10 ext-strip temporaries, double
        # buffered) exceeds the default 16 MiB scoped-vmem budget for
        # production tile sizes
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def field_frame_tiled(
    state: FieldState, action: FieldAction, cfg: FieldConfig, *, tile_rows=None, interpret=False
):
    """One frame (cfg.loops micro-steps, loops even) through the tiled
    kernel: scan over micro-step pairs with the observable/stability math in
    XLA, then the exact accept/reject + adaptive-Δτ epilogue of
    integrators/field.py."""
    if cfg.ndim != 2:
        raise ValueError("tiled kernel supports 2-D lattices")
    if cfg.loops % 2:
        raise ValueError("tiled kernel needs an even loops count (pair launches)")
    if cfg.rng_impl == "hardware":
        raise ValueError(
            "the tiled kernel requires counter-based noise: halo rows are "
            "recomputed redundantly in neighboring strips, which only agrees "
            "when noise is a pure function of (site, step) — use "
            "rng_impl='threefry' or the whole-lattice kernel"
        )
    C = cfg.n_chains
    L0, L1 = cfg.shape
    T0 = tile_rows or cfg.tile_rows or min(L0, 256)
    volume = L0 * L1
    call = _pair_call(action, cfg, T0, interpret)
    dtau_col = state.dtau[:, None]

    def pair_body(carry, _):
        phi, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg, step = carry
        scalars = jnp.array([cfg.seed, 0, 0], jnp.uint32).at[1].set(step)
        phi2, sl0, sl1, stats = call(scalars, phi, phi, phi, dtau_col)
        sl0, sl1 = sl0[..., 0], sl1[..., 0]

        def obs_step(vals, s_slice, st):
            # frame-local sample sums (two-level accumulation, accum.py)
            ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg = vals
            mag = st[:, :, 0].sum(axis=1) / volume
            phi2m = st[:, :, 1].sum(axis=1) / volume
            act_d = st[:, :, 2].sum(axis=1) / volume
            max_det = st[:, :, 3].max(axis=1)
            max_new = st[:, :, 4].max(axis=1)
            tripped = max_det > lrg
            corr = s_slice * s_slice[:, :1]
            keep = lambda new, old: jnp.where(unstable, old, new)
            mag2 = mag * mag
            ms = keep(ms + mag, ms)
            m2s = keep(m2s + mag2, m2s)
            m4s = keep(m4s + mag2 * mag2, m4s)
            ams = keep(ams + jnp.abs(mag), ams)
            p2s = keep(p2s + phi2m, p2s)
            acs = keep(acs + act_d, acs)
            cs = jnp.where(unstable[:, None], cs, cs + corr)
            lrg = keep(jnp.maximum(lrg, max_new), lrg)
            unstable = unstable | tripped
            return (ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg)

        vals = (ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg)
        vals = obs_step(vals, sl0, stats[:, :, :5])
        vals = obs_step(vals, sl1, stats[:, :, 5:10])
        ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg = vals
        return (phi2, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg, step + 2), None

    zc = jnp.zeros((C,), jnp.float32)
    init = (
        state.phi, zc, zc, zc, zc, zc, zc, jnp.zeros_like(state.corr_mean),
        jnp.zeros((C,), bool), state.lrg_vl, state.step,
    )
    carry, _ = lax.scan(pair_body, init, None, length=cfg.loops // 2)
    phi, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg, step_end = carry

    accept = ~unstable
    au = accept[:, None, None]
    phi = jnp.where(au, phi, state.phi)
    # merge frame sums into running means (integrators/accum.py)
    n_new = accum.runs_after(state.runs, cfg.loops)
    mm = accum.merge_frame_sum(state.mag_mean, ms, cfg.loops, n_new)
    m2m = accum.merge_frame_sum(state.mag2_mean, m2s, cfg.loops, n_new)
    m4m = accum.merge_frame_sum(state.mag4_mean, m4s, cfg.loops, n_new)
    amm = accum.merge_frame_sum(state.absmag_mean, ams, cfg.loops, n_new)
    p2m = accum.merge_frame_sum(state.phi2_mean, p2s, cfg.loops, n_new)
    am = accum.merge_frame_sum(state.act_mean, acs, cfg.loops, n_new)
    cm = accum.merge_frame_sum(state.corr_mean, cs, cfg.loops, n_new[:, None])
    sel = lambda new, old: jnp.where(accept, new, old)
    mm = sel(mm, state.mag_mean)
    m2m = sel(m2m, state.mag2_mean)
    m4m = sel(m4m, state.mag4_mean)
    amm = sel(amm, state.absmag_mean)
    p2m = sel(p2m, state.phi2_mean)
    am = sel(am, state.act_mean)
    cm = jnp.where(accept[:, None], cm, state.corr_mean)
    lrg = sel(lrg, state.lrg_vl)
    runs = accum.bump_runs(state.runs, cfg.loops, accept)

    grow = accept & (state.stab_cnt >= cfg.grow_after)
    dtau = jnp.where(
        grow,
        state.dtau / cfg.shrink,
        jnp.where(accept, state.dtau, state.dtau * cfg.shrink),
    )
    if cfg.dtau_max is not None:
        dtau = jnp.minimum(dtau, jnp.asarray(cfg.dtau_max, jnp.float32))
    stab_cnt = jnp.where(accept, jnp.where(grow, 0, state.stab_cnt + 1), 0)

    new_state = FieldState(
        phi=phi, mag_mean=mm, mag2_mean=m2m, mag4_mean=m4m, absmag_mean=amm,
        phi2_mean=p2m, act_mean=am, corr_mean=cm,
        runs=runs, dtau=dtau, stab_cnt=stab_cnt, lrg_vl=lrg,
        step=step_end,
    )
    return new_state, {"stable": accept, "dtau": dtau, "max_phi": lrg}


@functools.partial(
    jax.jit, static_argnames=("action", "cfg", "n_frames", "tile_rows", "interpret")
)
def run_field_frames_tiled(
    state: FieldState,
    action: FieldAction,
    cfg: FieldConfig,
    n_frames: int,
    tile_rows=None,
    interpret: bool = False,
):
    """Drop-in replacement for integrators.field.run_field_frames for 2-D
    lattices larger than VMEM (HBM-resident field, tiled strips)."""
    return lax.scan(
        lambda s, _: field_frame_tiled(
            s, action, cfg, tile_rows=tile_rows, interpret=interpret
        ),
        state,
        None,
        length=n_frames,
    )
