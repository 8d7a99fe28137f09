"""Fused Pallas TPU kernel for 2-D scalar-field Langevin frames.

One kernel launch = one macro-frame of a 2-D lattice chain (BASELINE.json
config 3: 256² φ⁴): per micro-step it draws counter-based noise, applies the
EM update (synchronous or checkerboard half-sweeps), accumulates the running
observables (magnetization moments, ⟨φ²⟩, action density, time-slice
correlator) and maintains the divergence detector — all in VMEM, one chain
per grid program.

Math mirrors integrators/field.py exactly (same Threefry counters via the
global 2-D site ids, same op order), so kernel trajectories are
bit-compatible with the XLA path; the accept/reject + adaptive-Δτ epilogue
runs in XLA around the kernel.
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

__all__ = ["run_field_frames_pallas", "field_frame_pallas"]


def _build_kernel(action: FieldAction, cfg: FieldConfig):
    if cfg.ndim != 2:
        raise ValueError("field kernel supports 2-D lattices (use the XLA/halo "
                         "paths for other dimensionalities)")
    L0, L1 = cfg.shape
    f32 = np.float32
    a = cfg.spacing
    inv_a2 = f32(1.0 / (a * a))
    measure = f32(a * a)
    c_amp = f32(cfg.noise_amp)
    clamp = f32(cfg.clamp)
    volume = L0 * L1
    checkerboard = cfg.sweep == Sweep.CHECKERBOARD

    def kernel(
        scalars_ref,  # SMEM (3,): seed, step_base, chain_offset
        phi_ref, lrg_ref, dtau_ref,
        phio_ref, ms_ref, m2s_ref, m4s_ref, ams_ref, p2s_ref, acs_ref,
        corro_ref, lrgo_ref, unst_ref,
    ):
        i = pl.program_id(0)
        seed = scalars_ref[0]
        step0 = scalars_ref[1]
        chain = scalars_ref[2] + jnp.uint32(i)

        row = lax.broadcasted_iota(jnp.uint32, (1, L0, L1), 1)
        col = lax.broadcasted_iota(jnp.uint32, (1, L0, L1), 2)
        site = row * jnp.uint32(L1) + col
        k1 = jnp.uint32(rng.Stream.FIELD) ^ lax.shift_left(chain, jnp.uint32(8))
        if checkerboard:
            par = (
                lax.broadcasted_iota(jnp.int32, (1, L0, L1), 1)
                + lax.broadcasted_iota(jnp.int32, (1, L0, L1), 2)
            )
            even = par % 2 == 0
        dtau = dtau_ref[i, 0]
        namp = c_amp * jnp.sqrt(2.0 * dtau / measure)

        def roll(x, shift, axis):
            return pltpu.roll(x, shift % (L0 if axis == 1 else L1), axis)

        def laplacian(phi):
            lap = jnp.zeros_like(phi)
            for d, n in ((1, L0), (2, L1)):
                lap = lap + (roll(phi, -1, d) + roll(phi, 1, d) - 2.0 * phi)
            return lap * inv_a2

        def action_density(phi):
            kin = jnp.zeros_like(phi)
            for d in (1, 2):
                diff = roll(phi, -1, d) - phi
                kin = kin + 0.5 * diff * diff * inv_a2
            return kin + action.V(phi)

        def em_apply(phi, mask, noise):
            det = (laplacian(phi) - action.dV(phi).astype(jnp.float32)) * dtau
            new_raw = phi + det + noise
            newphi = jnp.clip(new_raw, -clamp, clamp)
            newphi = jnp.where(jnp.isfinite(new_raw), newphi, clamp)
            if mask is not None:
                newphi = jnp.where(mask, newphi, phi)
                det = jnp.where(mask, det, f32(0.0))
                fin = jnp.isfinite(new_raw) | ~mask
            else:
                fin = jnp.isfinite(new_raw)
            return newphi, jnp.abs(det), fin

        def substep(eta):
            phi = phio_ref[:]
            unst = unst_ref[i, 0] > 0
            lrg = lrgo_ref[i, 0]

            noise = namp * eta
            if checkerboard:
                phi_e, absdet_e, fin_e = em_apply(phi, even, noise)
                newphi, absdet_o, fin_o = em_apply(phi_e, ~even, noise)
                absdet = jnp.maximum(absdet_e, absdet_o)
                fin = fin_e & fin_o
            else:
                newphi, absdet, fin = em_apply(phi, None, noise)

            max_det = jnp.max(absdet)
            bad = jnp.sum(jnp.where(fin, f32(0.0), f32(1.0))) > 0.0
            tripped = (max_det > lrg) | bad

            mag = jnp.mean(phi)
            phi2 = jnp.mean(phi * phi)
            act_d = jnp.mean(action_density(phi).astype(jnp.float32))
            s_slice = jnp.mean(phi, axis=2, keepdims=True)  # (1, L0, 1)
            corr = s_slice * s_slice[:, 0:1, :]

            # frame-local sample SUMS; the shared XLA epilogue merges them
            # into the running means (two-level accumulation, accum.py)
            keep = lambda new, old: jnp.where(unst, old, new)
            mag2 = mag * mag
            ms_ref[i, 0] = keep(ms_ref[i, 0] + mag, ms_ref[i, 0])
            m2s_ref[i, 0] = keep(m2s_ref[i, 0] + mag2, m2s_ref[i, 0])
            m4s_ref[i, 0] = keep(m4s_ref[i, 0] + mag2 * mag2, m4s_ref[i, 0])
            ams_ref[i, 0] = keep(ams_ref[i, 0] + jnp.abs(mag), ams_ref[i, 0])
            p2s_ref[i, 0] = keep(p2s_ref[i, 0] + phi2, p2s_ref[i, 0])
            acs_ref[i, 0] = keep(acs_ref[i, 0] + act_d, acs_ref[i, 0])
            corro_ref[:] = jnp.where(unst, corro_ref[:], corro_ref[:] + corr)

            lrg2 = jnp.maximum(lrg, jnp.max(jnp.abs(newphi)))
            phio_ref[:] = jnp.where(unst, phi, newphi)
            lrgo_ref[i, 0] = jnp.where(unst, lrg, lrg2)
            unst_ref[i, 0] = jnp.where(unst | tripped, 1, 0)

        hw_rng = cfg.rng_impl == "hardware"
        if hw_rng:
            # one seed per (chain program, frame): deterministic for a fixed
            # chain assignment; rejected frames reseed (step0 advances
            # regardless) — same contract as the chain kernel's fast path
            pltpu.prng_seed(seed + chain * jnp.uint32(2654435761), step0)

        def normal_pair(step):
            if hw_rng:
                b0 = pltpu.bitcast(pltpu.prng_random_bits(site.shape), jnp.uint32)
                b1 = pltpu.bitcast(pltpu.prng_random_bits(site.shape), jnp.uint32)
            else:
                b0, b1 = rng.threefry2x32(seed, k1, site, step)
            u1 = rng.uniform_from_bits(b0)
            u2 = rng.uniform_from_bits(b1)
            r = jnp.sqrt(f32(-2.0) * jnp.log(u1))
            theta = f32(rng._TWO_PI) * u2
            return r * jnp.cos(theta), r * jnp.sin(theta)

        def pair_body(k, _):
            step = step0 + jnp.uint32(2) * k.astype(jnp.uint32)
            z0, z1 = normal_pair(step)
            substep(z0)
            substep(z1)
            return 0

        phio_ref[:] = phi_ref[:]
        corro_ref[:] = jnp.zeros((1, L0, 1), jnp.float32)
        lrgo_ref[i, 0] = lrg_ref[i, 0]
        unst_ref[i, 0] = 0
        ms_ref[i, 0] = 0.0
        m2s_ref[i, 0] = 0.0
        m4s_ref[i, 0] = 0.0
        ams_ref[i, 0] = 0.0
        p2s_ref[i, 0] = 0.0
        acs_ref[i, 0] = 0.0
        lax.fori_loop(0, cfg.loops // 2, pair_body, 0, unroll=False)
        if cfg.loops % 2:
            step = step0 + jnp.uint32(cfg.loops - 1)
            z0, _ = normal_pair(step)
            substep(z0)

    return kernel


@functools.lru_cache(maxsize=64)
def _frame_call(action: FieldAction, cfg: FieldConfig, interpret: bool):
    kernel = _build_kernel(action, cfg)
    C = cfg.n_chains
    L0, L1 = cfg.shape
    grid = (C,)
    lat = pl.BlockSpec((1, L0, L1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    lat_o = pl.BlockSpec((1, L0, L1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    corr = pl.BlockSpec((1, L0, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    # per-chain scalars: full-array (C,1) blocks in SMEM (full blocks are
    # always legal; SMEM supports the scalar loads/stores each program does
    # on its own row)
    sca = lambda: pl.BlockSpec((C, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((C, L0, L1), jnp.float32),  # phi
        jax.ShapeDtypeStruct((C, 1), jnp.float32),       # frame Σ M
        jax.ShapeDtypeStruct((C, 1), jnp.float32),       # frame Σ M²
        jax.ShapeDtypeStruct((C, 1), jnp.float32),       # frame Σ M⁴
        jax.ShapeDtypeStruct((C, 1), jnp.float32),       # frame Σ |M|
        jax.ShapeDtypeStruct((C, 1), jnp.float32),       # frame Σ φ²
        jax.ShapeDtypeStruct((C, 1), jnp.float32),       # frame Σ s
        jax.ShapeDtypeStruct((C, L0, 1), jnp.float32),   # frame Σ corr
        jax.ShapeDtypeStruct((C, 1), jnp.float32),       # lrg
        jax.ShapeDtypeStruct((C, 1), jnp.int32),         # unstable
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[lat, sca(), sca()],
        out_specs=(lat_o, sca(), sca(), sca(), sca(), sca(), sca(), corr, sca(), sca()),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )


def field_frame_pallas(
    state: FieldState, action: FieldAction, cfg: FieldConfig, *,
    interpret=False, chain_offset=0,
):
    """One frame through the fused kernel + XLA epilogue (exact semantics of
    integrators/field.py's frame).

    ``chain_offset``: this block's first *global* chain index — pass the
    shard offset when running per-shard inside a chain-sharded ``shard_map``
    (parallel/halo.py backend='pallas') so the Threefry streams stay keyed
    by global chain ids and the trajectory is placement-invariant."""
    C = cfg.n_chains
    call = _frame_call(action, cfg, interpret)
    scalars = (
        jnp.array([cfg.seed, 0, 0], jnp.uint32)
        .at[1].set(state.step)
        .at[2].set(jnp.asarray(chain_offset, jnp.uint32))
    )
    col = lambda v: v[:, None]
    phi, ms, m2s, m4s, ams, p2s, acs, cs, lrg, unst = call(
        scalars,
        state.phi,
        col(state.lrg_vl),
        col(state.dtau),
    )
    ms, m2s, m4s, ams, p2s, acs, lrg = (
        v[:, 0] for v in (ms, m2s, m4s, ams, p2s, acs, lrg)
    )
    cs = cs[:, :, 0]
    accept = unst[:, 0] == 0

    ndim = 2
    au = accept.reshape((C,) + (1,) * ndim)
    phi = jnp.where(au, phi, state.phi)
    # merge frame sums into running means — identical expression to the XLA
    # path (integrators/accum.py), keeping both paths bitwise comparable
    n_new = accum.runs_after(state.runs, cfg.loops)
    mm = accum.merge_frame_sum(state.mag_mean, ms, cfg.loops, n_new)
    m2m = accum.merge_frame_sum(state.mag2_mean, m2s, cfg.loops, n_new)
    m4m = accum.merge_frame_sum(state.mag4_mean, m4s, cfg.loops, n_new)
    amm = accum.merge_frame_sum(state.absmag_mean, ams, cfg.loops, n_new)
    p2m = accum.merge_frame_sum(state.phi2_mean, p2s, cfg.loops, n_new)
    am = accum.merge_frame_sum(state.act_mean, acs, cfg.loops, n_new)
    corr = accum.merge_frame_sum(state.corr_mean, cs, cfg.loops, n_new[:, None])
    sel = lambda new, old: jnp.where(accept, new, old)
    mm = sel(mm, state.mag_mean)
    m2m = sel(m2m, state.mag2_mean)
    m4m = sel(m4m, state.mag4_mean)
    amm = sel(amm, state.absmag_mean)
    p2m = sel(p2m, state.phi2_mean)
    am = sel(am, state.act_mean)
    corr = jnp.where(accept[:, None], corr, state.corr_mean)
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
        phi2_mean=p2m, act_mean=am, corr_mean=corr,
        runs=runs, dtau=dtau, stab_cnt=stab_cnt, lrg_vl=lrg,
        step=state.step + jnp.uint32(cfg.loops),
    )
    return new_state, {"stable": accept, "dtau": dtau, "max_phi": lrg}


@functools.partial(jax.jit, static_argnames=("action", "cfg", "n_frames", "interpret"))
def run_field_frames_pallas(
    state: FieldState, action: FieldAction, cfg: FieldConfig, n_frames: int,
    interpret: bool = False, chain_offset=0,
):
    """Drop-in replacement for integrators.field.run_field_frames (2-D)."""
    return lax.scan(
        lambda s, _: field_frame_pallas(
            s, action, cfg, interpret=interpret, chain_offset=chain_offset
        ),
        state,
        None,
        length=n_frames,
    )
