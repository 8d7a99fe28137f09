"""Fused Pallas TPU kernel for batched 1-D Langevin chains.

This is the TPU-native replacement for the reference's ``time_dev`` OpenCL
kernel (``tau_kernel.cl:25-175``): one kernel launch runs the whole
``loops`` micro-step frame — RNG (K9), EM update (K2), boundary handling
(K3), collective-coordinate update (K4), divergence detection (K5) and
running-mean observables (K6) — entirely in VMEM, with the double-buffer
swap (K7) replaced by a functional ``fori_loop`` carry.

Layout: chains on sublanes, Euclidean-time sites on lanes, padded to a
multiple of 128; a grid dimension tiles large chain batches.  Noise uses
the same Threefry counters as rng.py keyed by *global* (chain, site, step),
and every expression mirrors the XLA integrator's operand order, so kernel
trajectories are invariant under chain-block tiling and bitwise equal to
the XLA path in interpret mode (tests/test_chain_kernel.py).

Tolerance contract on real TPUs: Mosaic's transcendental lowering (tanh/exp
in the background field and potentials) rounds differently from XLA's, so
on-device trajectories track the XLA path to |Δx| ≤ ~1e-6 over a
1000-micro-step double-well frame (the bench gate `chain` in
`kernel_vs_xla_max_abs_diff`, threshold 2e-6).  Kernels whose math avoids
those transcendentals hit 0.0 on device (U(1) gauge) — the bound is
rounding drift, not an algorithmic difference.
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
from stochquant_tpu.actions.base import QMAction
from stochquant_tpu.config import BoundaryCondition, ChainConfig, Formulation, Scheme
from stochquant_tpu.integrators import accum
from stochquant_tpu.integrators.langevin import ChainState, _reflect

__all__ = ["run_frames_pallas", "chain_frame_pallas"]


def _round_up(x, m):
    return (x + m - 1) // m * m


def _build_frame_kernel(action: QMAction, cfg: ChainConfig, cb: int, np_: int):
    """Kernel body for one frame over a (cb, np_) chain block."""
    N = cfg.n_sites
    dt = cfg.dt
    mid = N // 2
    f32 = np.float32  # build-time constants must be host scalars, not 0-d jax arrays
    inv_dt2 = f32(action.mass / (dt * dt))
    c_amp = f32(cfg.noise_amp)
    clamp = f32(cfg.clamp)
    zm_const = f32(action.zero_mode_const())
    background = cfg.formulation == Formulation.BACKGROUND
    has_zm = background and action.has_zero_mode and cfg.parisi
    heun = cfg.scheme == Scheme.HEUN
    upper = f32((N - 1) * dt)
    if cfg.ghost_override is not None:
        asym_l, asym_r = f32(cfg.ghost_override[0]), f32(cfg.ghost_override[1])
    else:
        asym_l = f32(action.boundary_asymptote(-1))
        asym_r = f32(action.boundary_asymptote(+1))

    def kernel(
        scalars_ref,  # SMEM (3,): seed, step_base, chain_offset (uint32)
        f_ref, om_ref, lrg_ref, dtau_ref,
        fo_ref, omo_ref, xso_ref, xxso_ref, x2so_ref, x4so_ref, lrgo_ref,
        unst_ref,
    ):
        g = pl.program_id(0)
        seed = scalars_ref[0]
        step0 = scalars_ref[1]
        chain0 = scalars_ref[2] + jnp.uint32(g * cb)

        col = lax.broadcasted_iota(jnp.uint32, (cb, np_), 1)
        colf = lax.broadcasted_iota(jnp.int32, (cb, np_), 1).astype(f32)
        mask = col < jnp.uint32(N)
        is_left = col == jnp.uint32(0)
        is_right = col == jnp.uint32(N - 1)
        chain_ids = lax.broadcasted_iota(jnp.uint32, (cb, np_), 0) + chain0
        chain_col = lax.broadcasted_iota(jnp.uint32, (cb, 1), 0) + chain0
        t_grid = colf * f32(dt)
        k1_field = jnp.uint32(rng.Stream.FIELD) ^ lax.shift_left(
            chain_ids, jnp.uint32(8)
        )
        k1_om = jnp.uint32(rng.Stream.COLLECTIVE) ^ lax.shift_left(
            chain_col, jnp.uint32(8)
        )

        dtau = dtau_ref[:]          # (cb, 1)
        noise_amp = c_amp * jnp.sqrt(2.0 * dtau / f32(dt))
        om_noise_amp = zm_const * c_amp * jnp.sqrt(2.0 * dtau)

        def x_cl(om):
            """Background field on the padded grid; (cb,1) om broadcasts."""
            return action.x_cl(t_grid, om).astype(f32)

        def ghost_vals(om):
            if cfg.bc != BoundaryCondition.FIXED_BG:
                z = jnp.zeros_like(om)
                return z, z
            if background:
                gl = asym_l - action.x_cl(f32(-dt), om).astype(f32)
                gr = asym_r - action.x_cl(f32(N * dt), om).astype(f32)
            else:
                gl = jnp.full_like(om, asym_l)
                gr = jnp.full_like(om, asym_r)
            return gl, gr

        def neighbor_sum(f, om):
            if cfg.bc == BoundaryCondition.PERIODIC:
                # lane roll with the wraparound landing at col N−1/0; padded
                # columns receive garbage that the mask discards, but the
                # *edge* columns must read the true periodic partner.
                up = pltpu.roll(f, np_ - 1, 1)
                down = pltpu.roll(f, 1, 1)
                f_first = jnp.broadcast_to(f[:, 0:1], (cb, np_))
                f_last = jnp.broadcast_to(f[:, N - 1 : N], (cb, np_))
                up = jnp.where(is_right, f_first, up)
                down = jnp.where(is_left, f_last, down)
                return up + down
            gl, gr = ghost_vals(om)
            up = jnp.where(is_right, jnp.broadcast_to(gr, (cb, np_)), pltpu.roll(f, np_ - 1, 1))
            down = jnp.where(is_left, jnp.broadcast_to(gl, (cb, np_)), pltpu.roll(f, 1, 1))
            return up + down

        # State lives in the *output* VMEM refs, updated in place each
        # micro-step: a carry-free loop keeps Mosaic's register pressure flat
        # (array-valued fori_loop carries blow up vector allocation).
        # Micro-steps run in pairs sharing one Threefry draw — both
        # Box–Muller outputs are consumed (mirrors langevin.py's pair_step,
        # halving RNG + transcendental cost).
        def substep(eta, eta_om):
            f = fo_ref[:]
            om = omo_ref[:]
            xs = xso_ref[:]
            xxs = xxso_ref[:]
            x2s = x2so_ref[:]
            x4s = x4so_ref[:]
            lrg = lrgo_ref[:]
            unst = unst_ref[:] > 0

            noise = noise_amp * eta

            # hoist the background field: one x_cl/ddV evaluation per
            # micro-step shared by the drift (×2 under Heun) and the
            # observable reconstruction below
            if background:
                bg = x_cl(om)
                ddv_bg = action.ddV(bg).astype(f32)

            def drift_fn(ff):
                lap = (neighbor_sum(ff, om) - 2.0 * ff) * inv_dt2
                if background:
                    return lap - ddv_bg * ff
                return lap - action.dV(ff).astype(f32)

            if heun:
                f1d = drift_fn(f)
                f_pred = f + dtau * f1d + noise
                det = 0.5 * dtau * (f1d + drift_fn(f_pred))
            else:
                det = drift_fn(f) * dtau
            new_raw = f + det + noise
            newf = jnp.clip(new_raw, -clamp, clamp)
            newf = jnp.where(jnp.isfinite(new_raw), newf, clamp)
            if cfg.bc == BoundaryCondition.DIRICHLET:
                newf = jnp.where(is_left | is_right, f32(0.0), newf)
            newf = jnp.where(mask, newf, f32(0.0))

            # one lane reduction for the divergence detector: non-finite
            # sites inject +inf into the masked |det| field, so the single
            # max both finds the deterministic-change peak and flags NaNs
            # (lrg is a clamped max|x| ≤ cfg.clamp, always finite)
            absdet = jnp.where(mask, jnp.abs(det), f32(0.0))
            absdet = jnp.where(mask & ~jnp.isfinite(new_raw), f32(np.inf), absdet)
            max_det = jnp.max(absdet, axis=1, keepdims=True)
            tripped = max_det > lrg

            if background:
                x = f + bg
                x_new = newf + bg
            else:
                x = f
                x_new = newf
            # frame-local sample SUMS (two-level accumulation: the shared XLA
            # epilogue merges them into the running means once per frame —
            # integrators/accum.py); padded lanes pinned to 0
            x_mid = jnp.broadcast_to(x[:, mid : mid + 1], (cb, np_))
            x2v = x * x
            xs2 = jnp.where(mask, xs + x, f32(0.0))
            xxs2 = jnp.where(mask, xxs + x * x_mid, f32(0.0))
            x2s2 = jnp.where(mask, x2s + x2v, f32(0.0))
            x4s2 = jnp.where(mask, x4s + x2v * x2v, f32(0.0))

            absx_new = jnp.where(mask, jnp.abs(x_new), f32(0.0))
            lrg2 = jnp.maximum(lrg, jnp.max(absx_new, axis=1, keepdims=True))

            if has_zm:
                om2 = _reflect(om + om_noise_amp * eta_om, upper)
            else:
                om2 = om

            fo_ref[:] = jnp.where(unst, f, newf)
            omo_ref[:] = jnp.where(unst, om, om2)
            xso_ref[:] = jnp.where(unst, xs, xs2)
            xxso_ref[:] = jnp.where(unst, xxs, xxs2)
            x2so_ref[:] = jnp.where(unst, x2s, x2s2)
            x4so_ref[:] = jnp.where(unst, x4s, x4s2)
            lrgo_ref[:] = jnp.where(unst, lrg, lrg2)
            unst_ref[:] = (unst | tripped).astype(jnp.int32)

        hw_rng = cfg.rng_impl == "hardware"
        if hw_rng:
            # one seed per (program, frame): deterministic for a fixed chain
            # blocking; rejected frames reseed (step0 advances regardless).
            # The TPU PRNG takes at most 2 seed words — hash the chain-block
            # id into the first.
            pltpu.prng_seed(seed + chain0 * jnp.uint32(2654435761), step0)

        def _box_muller(b0, b1):
            u1 = rng.uniform_from_bits(b0)
            u2 = rng.uniform_from_bits(b1)
            r = jnp.sqrt(f32(-2.0) * jnp.log(u1))
            theta = f32(rng._TWO_PI) * u2
            return r * jnp.cos(theta), r * jnp.sin(theta)

        def normal_pair(k1, counter, step):
            if hw_rng:
                shape = counter.shape
                b0 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
                b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            else:
                b0, b1 = rng.threefry2x32(
                    seed, k1, counter, step, rng.rounds_of(cfg.rng_impl)
                )
            return _box_muller(b0, b1)

        def om_noise_pair(step, z0, z1):
            if not has_zm:
                return None, None
            if hw_rng and np_ > N:
                # the collective coordinate is the reference's "extra work
                # item" at global index N (tauhost.c:441); here lane N of the
                # already-generated noise tile is exactly that: an
                # independent N(0,1) draw the field mask never consumes.
                return z0[:, N : N + 1], z1[:, N : N + 1]
            return normal_pair(k1_om, jnp.zeros((cb, 1), jnp.uint32), step)

        def pair_body(k, _):
            step = step0 + jnp.uint32(2) * k.astype(jnp.uint32)
            z0, z1 = normal_pair(k1_field, col, step)
            zo0, zo1 = om_noise_pair(step, z0, z1)
            substep(z0, zo0)
            substep(z1, zo1)
            return 0

        fo_ref[:] = f_ref[:]
        omo_ref[:] = om_ref[:]
        xso_ref[:] = jnp.zeros((cb, np_), jnp.float32)
        xxso_ref[:] = jnp.zeros((cb, np_), jnp.float32)
        x2so_ref[:] = jnp.zeros((cb, np_), jnp.float32)
        x4so_ref[:] = jnp.zeros((cb, np_), jnp.float32)
        lrgo_ref[:] = lrg_ref[:]
        unst_ref[:] = jnp.zeros((cb, 1), jnp.int32)
        lax.fori_loop(0, cfg.loops // 2, pair_body, 0, unroll=False)
        if cfg.loops % 2:
            step = step0 + jnp.uint32(cfg.loops - 1)
            z0, z1 = normal_pair(k1_field, col, step)
            zo0, _ = om_noise_pair(step, z0, z1)
            substep(z0, zo0)

    return kernel


@functools.lru_cache(maxsize=64)
def _frame_call(action: QMAction, cfg: ChainConfig, cb: int, np_: int, interpret: bool):
    kernel = _build_frame_kernel(action, cfg, cb, np_)
    C = cfg.n_chains
    grid = (C // cb,)
    blk = lambda: pl.BlockSpec((cb, np_), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    col = lambda: pl.BlockSpec((cb, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((C, np_), jnp.float32),  # f
        jax.ShapeDtypeStruct((C, 1), jnp.float32),    # omega
        jax.ShapeDtypeStruct((C, np_), jnp.float32),  # frame Σ x
        jax.ShapeDtypeStruct((C, np_), jnp.float32),  # frame Σ x·x_mid
        jax.ShapeDtypeStruct((C, np_), jnp.float32),  # frame Σ x²
        jax.ShapeDtypeStruct((C, np_), jnp.float32),  # frame Σ x⁴
        jax.ShapeDtypeStruct((C, 1), jnp.float32),    # lrg_vl
        jax.ShapeDtypeStruct((C, 1), jnp.int32),      # unstable
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[blk(), col(), col(), col()],
        out_specs=(blk(), col(), blk(), blk(), blk(), blk(), col(), col()),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )


def _build_multiframe_kernel(action: QMAction, cfg: ChainConfig, cb: int, np_: int, K: int):
    """K frames per launch with the accept/reject + running-mean merge +
    adaptive-Δτ epilogue IN-KERNEL (VERDICT r2 item 7) — the analog of the
    reference's zero-host-math frame loop (``tauhost.c:479-560`` does one
    launch per frame but reads every buffer back; here K frames round-trip
    nothing but K stability/Δτ words per chain).  Pays off at small chain
    counts (config 2's C=256), where the per-frame launch + XLA-epilogue
    overhead is comparable to the compute.

    The micro-step body is the same math as _build_frame_kernel's (shared
    expressions, same Threefry counters — ``step0 + j·loops`` per frame j
    matches K separate launches exactly); the epilogue replicates
    integrators/accum.py's merge expression and the runs-pair carry
    bit-for-bit (two-step uint32→f32 cast: hi·65536 + lo rounds once, equal
    to the XLA ``astype(float32)``)."""
    N = cfg.n_sites
    dt = cfg.dt
    mid = N // 2
    f32 = np.float32
    inv_dt2 = f32(action.mass / (dt * dt))
    c_amp = f32(cfg.noise_amp)
    clamp = f32(cfg.clamp)
    zm_const = f32(action.zero_mode_const())
    background = cfg.formulation == Formulation.BACKGROUND
    has_zm = background and action.has_zero_mode and cfg.parisi
    heun = cfg.scheme == Scheme.HEUN
    upper = f32((N - 1) * dt)
    loops = cfg.loops
    shrink = f32(cfg.shrink)
    inv_loops = f32(1.0 / loops)
    if cfg.ghost_override is not None:
        asym_l, asym_r = f32(cfg.ghost_override[0]), f32(cfg.ghost_override[1])
    else:
        asym_l = f32(action.boundary_asymptote(-1))
        asym_r = f32(action.boundary_asymptote(+1))

    def kernel(
        scalars_ref,  # SMEM (3,): seed, step_base, chain_offset (uint32)
        f_ref, om_ref, lrg_ref, dtau_ref,
        xm_ref, xxm_ref, x2m_ref, x4m_ref,
        rlo_ref, rhi_ref, stab_ref,
        fo_ref, omo_ref, lrgo_ref, dtauo_ref,
        xmo_ref, xxmo_ref, x2mo_ref, x4mo_ref,
        rloo_ref, rhio_ref, stabo_ref,
        st_hist_ref, dt_hist_ref, lrg_hist_ref,
        # scratch (VMEM): frame snapshot + frame sums + unstable flag
        fs_ref, oms_ref, lrgs_ref,
        xs_ref, xxs_ref, x2s_ref, x4s_ref, unst_ref,
    ):
        g = pl.program_id(0)
        seed = scalars_ref[0]
        step00 = scalars_ref[1]
        chain0 = scalars_ref[2] + jnp.uint32(g * cb)

        col = lax.broadcasted_iota(jnp.uint32, (cb, np_), 1)
        colf = lax.broadcasted_iota(jnp.int32, (cb, np_), 1).astype(f32)
        mask = col < jnp.uint32(N)
        is_left = col == jnp.uint32(0)
        is_right = col == jnp.uint32(N - 1)
        chain_ids = lax.broadcasted_iota(jnp.uint32, (cb, np_), 0) + chain0
        chain_col = lax.broadcasted_iota(jnp.uint32, (cb, 1), 0) + chain0
        t_grid = colf * f32(dt)
        k1_field = jnp.uint32(rng.Stream.FIELD) ^ lax.shift_left(
            chain_ids, jnp.uint32(8)
        )
        k1_om = jnp.uint32(rng.Stream.COLLECTIVE) ^ lax.shift_left(
            chain_col, jnp.uint32(8)
        )
        lane_k = lax.broadcasted_iota(jnp.int32, (cb, K), 1)

        def x_cl(om):
            return action.x_cl(t_grid, om).astype(f32)

        def ghost_vals(om):
            if cfg.bc != BoundaryCondition.FIXED_BG:
                z = jnp.zeros_like(om)
                return z, z
            if background:
                gl = asym_l - action.x_cl(f32(-dt), om).astype(f32)
                gr = asym_r - action.x_cl(f32(N * dt), om).astype(f32)
            else:
                gl = jnp.full_like(om, asym_l)
                gr = jnp.full_like(om, asym_r)
            return gl, gr

        def neighbor_sum(f, om):
            if cfg.bc == BoundaryCondition.PERIODIC:
                up = pltpu.roll(f, np_ - 1, 1)
                down = pltpu.roll(f, 1, 1)
                f_first = jnp.broadcast_to(f[:, 0:1], (cb, np_))
                f_last = jnp.broadcast_to(f[:, N - 1 : N], (cb, np_))
                up = jnp.where(is_right, f_first, up)
                down = jnp.where(is_left, f_last, down)
                return up + down
            gl, gr = ghost_vals(om)
            up = jnp.where(is_right, jnp.broadcast_to(gr, (cb, np_)), pltpu.roll(f, np_ - 1, 1))
            down = jnp.where(is_left, jnp.broadcast_to(gl, (cb, np_)), pltpu.roll(f, 1, 1))
            return up + down

        hw_rng = cfg.rng_impl == "hardware"

        def _box_muller(b0, b1):
            u1 = rng.uniform_from_bits(b0)
            u2 = rng.uniform_from_bits(b1)
            r = jnp.sqrt(f32(-2.0) * jnp.log(u1))
            theta = f32(rng._TWO_PI) * u2
            return r * jnp.cos(theta), r * jnp.sin(theta)

        def normal_pair(k1, counter, step):
            if hw_rng:
                shape = counter.shape
                b0 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
                b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            else:
                b0, b1 = rng.threefry2x32(
                    seed, k1, counter, step, rng.rounds_of(cfg.rng_impl)
                )
            return _box_muller(b0, b1)

        def om_noise_pair(step, z0, z1):
            if not has_zm:
                return None, None
            if hw_rng and np_ > N:
                return z0[:, N : N + 1], z1[:, N : N + 1]
            return normal_pair(k1_om, jnp.zeros((cb, 1), jnp.uint32), step)

        def substep(eta, eta_om):
            f = fo_ref[:]
            om = omo_ref[:]
            xs = xs_ref[:]
            xxs = xxs_ref[:]
            x2s = x2s_ref[:]
            x4s = x4s_ref[:]
            lrg = lrgo_ref[:]
            unst = unst_ref[:] > 0

            dtau = dtauo_ref[:]
            noise_amp = c_amp * jnp.sqrt(2.0 * dtau / f32(dt))
            om_noise_amp = zm_const * c_amp * jnp.sqrt(2.0 * dtau)
            noise = noise_amp * eta

            if background:
                bg = x_cl(om)
                ddv_bg = action.ddV(bg).astype(f32)

            def drift_fn(ff):
                lap = (neighbor_sum(ff, om) - 2.0 * ff) * inv_dt2
                if background:
                    return lap - ddv_bg * ff
                return lap - action.dV(ff).astype(f32)

            if heun:
                f1d = drift_fn(f)
                f_pred = f + dtau * f1d + noise
                det = 0.5 * dtau * (f1d + drift_fn(f_pred))
            else:
                det = drift_fn(f) * dtau
            new_raw = f + det + noise
            newf = jnp.clip(new_raw, -clamp, clamp)
            newf = jnp.where(jnp.isfinite(new_raw), newf, clamp)
            if cfg.bc == BoundaryCondition.DIRICHLET:
                newf = jnp.where(is_left | is_right, f32(0.0), newf)
            newf = jnp.where(mask, newf, f32(0.0))

            absdet = jnp.where(mask, jnp.abs(det), f32(0.0))
            absdet = jnp.where(mask & ~jnp.isfinite(new_raw), f32(np.inf), absdet)
            max_det = jnp.max(absdet, axis=1, keepdims=True)
            tripped = max_det > lrg

            if background:
                x = f + bg
                x_new = newf + bg
            else:
                x = f
                x_new = newf
            x_mid = jnp.broadcast_to(x[:, mid : mid + 1], (cb, np_))
            x2v = x * x
            xs2 = jnp.where(mask, xs + x, f32(0.0))
            xxs2 = jnp.where(mask, xxs + x * x_mid, f32(0.0))
            x2s2 = jnp.where(mask, x2s + x2v, f32(0.0))
            x4s2 = jnp.where(mask, x4s + x2v * x2v, f32(0.0))

            absx_new = jnp.where(mask, jnp.abs(x_new), f32(0.0))
            lrg2 = jnp.maximum(lrg, jnp.max(absx_new, axis=1, keepdims=True))

            if has_zm:
                om2 = _reflect(om + om_noise_amp * eta_om, upper)
            else:
                om2 = om

            fo_ref[:] = jnp.where(unst, f, newf)
            omo_ref[:] = jnp.where(unst, om, om2)
            xs_ref[:] = jnp.where(unst, xs, xs2)
            xxs_ref[:] = jnp.where(unst, xxs, xxs2)
            x2s_ref[:] = jnp.where(unst, x2s, x2s2)
            x4s_ref[:] = jnp.where(unst, x4s, x4s2)
            lrgo_ref[:] = jnp.where(unst, lrg, lrg2)
            unst_ref[:] = (unst | tripped).astype(jnp.int32)

        def u32_to_f32(v):
            """uint32 → float32, bit-equal to XLA's astype: two exact halves
            summed in one rounding (Mosaic lacks a direct unsigned cast)."""
            hi = lax.shift_right_logical(v, jnp.uint32(16)).astype(jnp.int32)
            lo = (v & jnp.uint32(0xFFFF)).astype(jnp.int32)
            return hi.astype(f32) * f32(65536.0) + lo.astype(f32)

        def frame_body(j, _):
            # --- frame setup: snapshot + zeroed frame sums -----------------
            fs_ref[:] = fo_ref[:]
            oms_ref[:] = omo_ref[:]
            lrgs_ref[:] = lrgo_ref[:]
            xs_ref[:] = jnp.zeros((cb, np_), jnp.float32)
            xxs_ref[:] = jnp.zeros((cb, np_), jnp.float32)
            x2s_ref[:] = jnp.zeros((cb, np_), jnp.float32)
            x4s_ref[:] = jnp.zeros((cb, np_), jnp.float32)
            unst_ref[:] = jnp.zeros((cb, 1), jnp.int32)

            step0 = step00 + j.astype(jnp.uint32) * jnp.uint32(loops)
            if hw_rng:
                # per-frame reseed — identical to K separate launches
                pltpu.prng_seed(seed + chain0 * jnp.uint32(2654435761), step0)

            def pair_body(k, _):
                step = step0 + jnp.uint32(2) * k.astype(jnp.uint32)
                z0, z1 = normal_pair(k1_field, col, step)
                zo0, zo1 = om_noise_pair(step, z0, z1)
                substep(z0, zo0)
                substep(z1, zo1)
                return 0

            lax.fori_loop(0, loops // 2, pair_body, 0, unroll=False)
            if loops % 2:
                step = step0 + jnp.uint32(loops - 1)
                z0, z1 = normal_pair(k1_field, col, step)
                zo0, _ = om_noise_pair(step, z0, z1)
                substep(z0, zo0)

            # --- in-kernel epilogue (the XLA frame epilogue, verbatim) -----
            accept = unst_ref[:] == 0          # (cb, 1)
            dtau_old = dtauo_ref[:]
            rlo = rloo_ref[:]
            lo_n = rlo + jnp.uint32(loops)
            carry = (lo_n < rlo).astype(jnp.uint32)
            hi_n = rhio_ref[:] + carry
            n_new = u32_to_f32(hi_n) * f32(4294967296.0) + u32_to_f32(lo_n)
            w = f32(loops) / n_new

            def merge(mref, sref):
                m = mref[:]
                merged = m + (sref[:] * inv_loops - m) * w
                mref[:] = jnp.where(accept, merged, m)

            merge(xmo_ref, xs_ref)
            merge(xxmo_ref, xxs_ref)
            merge(x2mo_ref, x2s_ref)
            merge(x4mo_ref, x4s_ref)

            fo_ref[:] = jnp.where(accept, fo_ref[:], fs_ref[:])
            omo_ref[:] = jnp.where(accept, omo_ref[:], oms_ref[:])
            lrgo_ref[:] = jnp.where(accept, lrgo_ref[:], lrgs_ref[:])
            rloo_ref[:] = jnp.where(accept, lo_n, rlo)
            rhio_ref[:] = jnp.where(accept, hi_n, rhio_ref[:])

            grow = accept & (stabo_ref[:] >= cfg.grow_after)
            dtau_new = jnp.where(
                grow,
                dtau_old / shrink,
                jnp.where(accept, dtau_old, dtau_old * shrink),
            )
            if cfg.dtau_max is not None:
                dtau_new = jnp.minimum(dtau_new, f32(cfg.dtau_max))
            dtauo_ref[:] = dtau_new
            stabo_ref[:] = jnp.where(
                accept, jnp.where(grow, 0, stabo_ref[:] + 1), 0
            )

            # per-frame metrics history via lane-masked writes (K lanes)
            sel_j = lane_k == j
            st_hist_ref[:] = jnp.where(
                sel_j, jnp.broadcast_to(accept.astype(jnp.int32), (cb, K)),
                st_hist_ref[:],
            )
            dt_hist_ref[:] = jnp.where(
                sel_j, jnp.broadcast_to(dtau_new, (cb, K)), dt_hist_ref[:]
            )
            lrg_hist_ref[:] = jnp.where(
                sel_j, jnp.broadcast_to(lrgo_ref[:], (cb, K)), lrg_hist_ref[:]
            )
            return 0

        # init working state from inputs
        fo_ref[:] = f_ref[:]
        omo_ref[:] = om_ref[:]
        lrgo_ref[:] = lrg_ref[:]
        dtauo_ref[:] = dtau_ref[:]
        xmo_ref[:] = xm_ref[:]
        xxmo_ref[:] = xxm_ref[:]
        x2mo_ref[:] = x2m_ref[:]
        x4mo_ref[:] = x4m_ref[:]
        rloo_ref[:] = rlo_ref[:]
        rhio_ref[:] = rhi_ref[:]
        stabo_ref[:] = stab_ref[:]
        st_hist_ref[:] = jnp.zeros((cb, K), jnp.int32)
        dt_hist_ref[:] = jnp.zeros((cb, K), jnp.float32)
        lrg_hist_ref[:] = jnp.zeros((cb, K), jnp.float32)
        lax.fori_loop(0, K, frame_body, 0, unroll=False)

    return kernel


@functools.lru_cache(maxsize=64)
def _multiframe_call(
    action: QMAction, cfg: ChainConfig, cb: int, np_: int, K: int, interpret: bool
):
    kernel = _build_multiframe_kernel(action, cfg, cb, np_, K)
    C = cfg.n_chains
    grid = (C // cb,)
    blk = lambda: pl.BlockSpec((cb, np_), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    col = lambda: pl.BlockSpec((cb, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    hist = lambda: pl.BlockSpec((cb, K), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    f32s = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    out_shapes = (
        f32s((C, np_)),                                   # f
        f32s((C, 1)),                                     # omega
        f32s((C, 1)),                                     # lrg_vl
        f32s((C, 1)),                                     # dtau
        f32s((C, np_)), f32s((C, np_)),                   # x_mean, xx0_mean
        f32s((C, np_)), f32s((C, np_)),                   # x2_mean, x4_mean
        jax.ShapeDtypeStruct((C, 1), jnp.uint32),         # runs lo
        jax.ShapeDtypeStruct((C, 1), jnp.uint32),         # runs hi
        jax.ShapeDtypeStruct((C, 1), jnp.int32),          # stab_cnt
        jax.ShapeDtypeStruct((C, K), jnp.int32),          # stable history
        f32s((C, K)),                                     # dtau history
        f32s((C, K)),                                     # lrg history
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            blk(), col(), col(), col(),
            blk(), blk(), blk(), blk(),
            col(), col(), col(),
        ],
        out_specs=(
            blk(), col(), col(), col(),
            blk(), blk(), blk(), blk(),
            col(), col(), col(),
            hist(), hist(), hist(),
        ),
        scratch_shapes=[
            pltpu.VMEM((cb, np_), jnp.float32),  # f snapshot
            pltpu.VMEM((cb, 1), jnp.float32),    # omega snapshot
            pltpu.VMEM((cb, 1), jnp.float32),    # lrg snapshot
            pltpu.VMEM((cb, np_), jnp.float32),  # frame Σ x
            pltpu.VMEM((cb, np_), jnp.float32),  # frame Σ x·x_mid
            pltpu.VMEM((cb, np_), jnp.float32),  # frame Σ x²
            pltpu.VMEM((cb, np_), jnp.float32),  # frame Σ x⁴
            pltpu.VMEM((cb, 1), jnp.int32),      # unstable
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )


def chain_frames_multi(
    state: ChainState, action: QMAction, cfg: ChainConfig, K: int, *,
    block_chains=None, interpret=False,
):
    """K frames in ONE launch, epilogue in-kernel; returns
    (state, {stable/dtau/max_x histories, each (K, C)})."""
    if cfg.accumulate_spectrum or cfg.scheme in (Scheme.LM, Scheme.EXACT):
        raise ValueError("multi-frame kernel: same feature surface as the "
                         "single-frame kernel (no spectrum / LM / EXACT)")
    C, N = cfg.n_chains, cfg.n_sites
    np_ = _round_up(N, 128)
    cb = block_chains or min(C, 256)
    if C % cb:
        raise ValueError(f"n_chains={C} not divisible by chain block {cb}")
    call = _multiframe_call(action, cfg, cb, np_, K, interpret)
    scalars = jnp.array([cfg.seed, 0, 0], jnp.uint32).at[1].set(state.step)
    (
        f, om, lrg, dtau, xm, xxm, x2m, x4m, rlo, rhi, stab,
        st_h, dt_h, lrg_h,
    ) = call(
        scalars,
        _pad_sites(state.f, np_),
        state.omega[:, None],
        state.lrg_vl[:, None],
        state.dtau[:, None],
        _pad_sites(state.x_mean, np_),
        _pad_sites(state.xx0_mean, np_),
        _pad_sites(state.x2_mean, np_),
        _pad_sites(state.x4_mean, np_),
        state.runs[:, 0:1],
        state.runs[:, 1:2],
        state.stab_cnt[:, None],
    )
    new_state = ChainState(
        f=f[:, :N],
        omega=om[:, 0],
        x_mean=xm[:, :N], xx0_mean=xxm[:, :N],
        x2_mean=x2m[:, :N], x4_mean=x4m[:, :N],
        runs=jnp.concatenate([rlo, rhi], axis=1),
        dtau=dtau[:, 0],
        stab_cnt=stab[:, 0],
        lrg_vl=lrg[:, 0],
        spec_mean=state.spec_mean,
        step=state.step + jnp.uint32(cfg.loops) * jnp.uint32(K),
    )
    metrics = {
        "stable": (st_h != 0).T,          # (K, C)
        "dtau": dt_h.T,
        "max_x": lrg_h.T,
    }
    return new_state, metrics


def _pad_sites(x, np_):
    pad = np_ - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)))


def chain_frame_pallas(
    state: ChainState, action: QMAction, cfg: ChainConfig, *, block_chains=None, interpret=False
):
    """One frame (cfg.loops micro-steps) through the fused kernel, plus the
    XLA-side accept/reject + adaptive-Δτ epilogue (exactly the frame
    semantics of integrators/langevin.py)."""
    if cfg.accumulate_spectrum:
        raise ValueError(
            "accumulate_spectrum requires the XLA path (no FFT in Pallas); "
            "use integrators.langevin.run_frames"
        )
    if cfg.scheme in (Scheme.LM, Scheme.EXACT):
        raise ValueError(
            f"Scheme.{cfg.scheme.name} is XLA-path only (LM carries a noise pair; "
            "EXACT is dense-matmul MXU work); use "
            "integrators.langevin.run_frames"
        )
    C, N = cfg.n_chains, cfg.n_sites
    np_ = _round_up(N, 128)
    cb = block_chains or min(C, 256)
    if C % cb:
        raise ValueError(f"n_chains={C} not divisible by chain block {cb}")
    call = _frame_call(action, cfg, cb, np_, interpret)

    scalars = jnp.array([cfg.seed, 0, 0], jnp.uint32).at[1].set(state.step)
    f, om, xs, xxs, x2s, x4s, lrg, unst = call(
        scalars,
        _pad_sites(state.f, np_),
        state.omega[:, None],
        state.lrg_vl[:, None],
        state.dtau[:, None],
    )
    f, xs, xxs, x2s, x4s = (a[:, :N] for a in (f, xs, xxs, x2s, x4s))
    om, lrg = om[:, 0], lrg[:, 0]
    accept = unst[:, 0] == 0

    # merge frame sums into running means — the identical expression the XLA
    # path uses (integrators/accum.py), so both paths stay bitwise equal
    n_new = accum.runs_after(state.runs, cfg.loops)[:, None]
    xm = accum.merge_frame_sum(state.x_mean, xs, cfg.loops, n_new)
    xxm = accum.merge_frame_sum(state.xx0_mean, xxs, cfg.loops, n_new)
    x2m = accum.merge_frame_sum(state.x2_mean, x2s, cfg.loops, n_new)
    x4m = accum.merge_frame_sum(state.x4_mean, x4s, cfg.loops, n_new)

    a1 = accept[:, None]
    sel = lambda new, old: jnp.where(a1, new, old)
    f = sel(f, state.f)
    xm = sel(xm, state.x_mean)
    xxm = sel(xxm, state.xx0_mean)
    x2m = sel(x2m, state.x2_mean)
    x4m = sel(x4m, state.x4_mean)
    om = jnp.where(accept, om, state.omega)
    lrg = jnp.where(accept, lrg, state.lrg_vl)
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

    new_state = ChainState(
        f=f, omega=om, x_mean=xm, xx0_mean=xxm, x2_mean=x2m, x4_mean=x4m,
        runs=runs, dtau=dtau, stab_cnt=stab_cnt, lrg_vl=lrg,
        spec_mean=state.spec_mean,
        step=state.step + jnp.uint32(cfg.loops),
    )
    return new_state, {"stable": accept, "dtau": dtau, "max_x": lrg}


@functools.partial(
    jax.jit,
    static_argnames=(
        "action", "cfg", "n_frames", "block_chains", "interpret",
        "frames_per_launch",
    ),
)
def run_frames_pallas(
    state: ChainState,
    action: QMAction,
    cfg: ChainConfig,
    n_frames: int,
    block_chains=None,
    interpret: bool = False,
    frames_per_launch: int = 1,
):
    """Drop-in replacement for integrators.langevin.run_frames using the
    fused kernel for the hot loop.

    frames_per_launch > 1 batches K frames per kernel launch with the
    accept/reject + merge + adaptive-Δτ epilogue IN-KERNEL — per-frame
    trajectories, means and Δτ schedules are identical to K single-frame
    launches; only the launch/epilogue overhead goes away (the win at small
    chain counts; VERDICT r2 item 7).  Metrics keep the per-frame shape
    (n_frames, C)."""
    if frames_per_launch <= 1:
        def step(s, _):
            return chain_frame_pallas(
                s, action, cfg, block_chains=block_chains, interpret=interpret
            )

        return lax.scan(step, state, None, length=n_frames)

    K = frames_per_launch
    n_launches = n_frames // K
    rem = n_frames - n_launches * K

    def launch(s, _):
        return chain_frames_multi(
            s, action, cfg, K, block_chains=block_chains, interpret=interpret
        )

    metrics_parts = []
    if n_launches:
        state, m = lax.scan(launch, state, None, length=n_launches)
        # (n_launches, K, C) → (n_launches·K, C)
        metrics_parts.append(
            {k: v.reshape((n_launches * K,) + v.shape[2:]) for k, v in m.items()}
        )
    if rem:
        state, m_tail = lax.scan(
            lambda s, _: chain_frame_pallas(
                s, action, cfg, block_chains=block_chains, interpret=interpret
            ),
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
