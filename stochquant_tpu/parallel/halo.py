"""Explicit domain decomposition: shard_map + ring ``ppermute`` halo exchange.

parallel/mesh.py's GSPMD path lets XLA partition the ``jnp.roll`` stencil
automatically.  This module is the manually-scheduled equivalent (SURVEY.md
§2.5 "ring / neighbor-exchange"): each shard owns a contiguous lattice block,
exchanges 1-site-wide edge slices with its ring neighbours over ICI
(`lax.ppermute` — stencil radius 1, the analog of ``tau_kernel.cl:114``'s
neighbour reads), and updates its block locally.  The halo sends are issued
before any local math that needs them, so XLA's latency-hiding scheduler
overlaps the collective-permute with the interior drift computation.

Bitwise-identical to the unsharded integrator (tests/test_halo.py): noise is
keyed by global coordinates, halo values are exact copies, and per-chain
reductions use max/psum trees that are exact (max) or tolerance-tested (sum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stochquant_tpu import rng
from stochquant_tpu.actions.phi4 import FieldAction
from stochquant_tpu.config import FieldConfig, Sweep
from stochquant_tpu.integrators import accum
from stochquant_tpu.integrators.field import FieldState

__all__ = ["halo_shifted", "make_halo_runner"]


def halo_shifted(x, axis: int, mesh_axis: str | None):
    """(x shifted −1, x shifted +1) along ``axis`` with periodic wraparound
    across the shard ring.

    Returns (up, down) where up[i] = x[i+1] and down[i] = x[i−1] in *global*
    coordinates.  For an unsharded axis this is plain ``jnp.roll``; for a
    sharded axis the wrap elements come from ring neighbours via
    ``lax.ppermute`` (the SPMD halo exchange over ICI).
    """
    if mesh_axis is None:
        return jnp.roll(x, -1, axis), jnp.roll(x, 1, axis)
    n = lax.axis_size(mesh_axis)
    if n == 1:
        return jnp.roll(x, -1, axis), jnp.roll(x, 1, axis)
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    # my right halo = left edge of my right neighbour (src i+1 → dst i);
    # issue both sends up front so they overlap with local compute.
    right_halo = lax.ppermute(first, mesh_axis, [((i + 1) % n, i) for i in range(n)])
    left_halo = lax.ppermute(last, mesh_axis, [((i - 1) % n, i) for i in range(n)])
    body_up = lax.slice_in_dim(x, 1, x.shape[axis], axis=axis)
    body_down = lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)
    up = jnp.concatenate([body_up, right_halo], axis=axis)
    down = jnp.concatenate([left_halo, body_down], axis=axis)
    return up, down


def _chunk_guard_geometry(cfg: FieldConfig, mesh: Mesh):
    """Shared derivation for the chunk/rdma eligibility guards (r5 review:
    keeping ONE copy is what makes 'router and runner cannot disagree'
    true).  Returns ``None`` when the common preconditions fail, else
    ``(lat, local_shape, c_local, sharded_dims, W_probe)``."""
    from stochquant_tpu.kernels import field_kernel_nd as fknd

    if cfg.dtype != "float32" or cfg.loops % 2:
        return None
    if not rng.counter_based(cfg.rng_impl):
        return None
    W_try = cfg.exchange_steps or fknd.default_exchange_steps(cfg)
    if not W_try or W_try % 2:
        return None
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    lat = cfg.mesh_axes or (None,) * cfg.ndim
    local_shape = tuple(
        s // (axis_sizes.get(ax, 1) if ax else 1)
        for s, ax in zip(cfg.shape, lat)
    )
    ca = cfg.mesh_chain_axis
    c_local = cfg.n_chains // (axis_sizes.get(ca, 1) if ca else 1)
    sharded_dims = tuple(
        bool(ax) and axis_sizes.get(ax, 1) > 1 for ax in lat
    )
    return lat, local_shape, c_local, sharded_dims, min(
        W_try, max(cfg.loops, 2)
    )


def chunk_backend_available(action, cfg: FieldConfig, mesh: Mesh, *,
                            interpret: bool = False) -> bool:
    """True when the multi-dim chunk kernel admits this (cfg, mesh) split
    geometry — the single source of truth shared by ``make_halo_runner``'s
    backend resolution and ``runtime.select_field_backend`` (keeping the
    auto-router and the runner from disagreeing, ADVICE r3)."""
    from stochquant_tpu.kernels import field_kernel_nd as fknd

    geo = _chunk_guard_geometry(cfg, mesh)
    if geo is None:
        return False
    _lat, local_shape, c_local, sharded_dims, W_probe = geo
    try:
        fknd.make_sharded_chunk_step_md(
            action, cfg, c_local, local_shape, W_probe, sharded_dims,
            interpret=interpret,
        )
    except ValueError:
        return False
    return True


def rdma_backend_available(action, cfg: FieldConfig, mesh: Mesh, *,
                           interpret: bool = False) -> bool:
    """True when the in-kernel remote-DMA halo path admits this (cfg, mesh)
    geometry: dim-0-ONLY split with the ring axis named, plus the chunk
    guards' common preconditions and single-hop halos.  The guard behind
    ``FieldConfig.prefer_rdma`` auto-routing (r5, VERDICT r4 weak #8) —
    shared with ``runtime.select_field_backend`` so router and runner
    cannot disagree."""
    from stochquant_tpu.kernels import field_kernel_nd as fknd

    geo = _chunk_guard_geometry(cfg, mesh)
    if geo is None:
        return False
    lat, local_shape, c_local, sharded_dims, W_probe = geo
    if not lat[0]:
        return False  # the dim-0 ring axis must be named
    if any(sharded_dims[1:]):
        return False  # dim-0-only splits
    try:
        fknd.make_rdma_chunk_step(
            action, cfg, c_local, local_shape, W_probe, interpret=interpret,
        )
    except ValueError:
        return False
    return True


def make_halo_runner(
    action: FieldAction,
    cfg: FieldConfig,
    mesh: Mesh,
    *,
    overlap: bool = True,
    backend: str = "xla",
    interpret: bool = False,
):
    """Build ``run(state, n_frames) -> (state, metrics)`` executing the field
    frame loop under shard_map with explicit halo exchange.

    ``cfg.mesh_axes`` names the mesh axis for each lattice dimension (None =
    unsharded); ``cfg.mesh_chain_axis`` optionally shards chains.  State must
    be placed with ``parallel.shard_field_state`` using the same cfg.

    overlap=True (default): halos are issued before the bulk stencil, which
    runs with local wraparound and has NO data dependency on the collectives;
    only the O(surface) edge-slice fixup waits on them.  overlap=False keeps
    the halo values on the critical path of the whole stencil (concatenate
    then shift) — the A/B reference for measuring the overlap win
    (bench_halo.py); both variants are bitwise identical.

    backend:
      'xla'         — the per-micro-step XLA stencil (any D, any dtype).
      'pallas'      — fused Pallas kernels composed with the decomposition
                      (VERDICT r2 item 1).  When no lattice axis is actually
                      split (chain-data-parallel meshes), each shard runs the
                      whole-frame fused kernel (kernels/field_kernel.py) at
                      full single-chip kernel speed; when the lattice IS
                      split, each micro-step runs the fused bulk kernel with
                      the halo ``ppermute``s in flight and an exact XLA edge
                      fixup (kernels/field_halo_kernel.py).  2-D float32
                      only; lattice-split shards additionally require
                      rng_impl='threefry' (the edge fixup re-derives counter
                      noise).
      'pallas_step' — force the per-micro-step kernel even when the lattice
                      is unsharded (benchmarking the composition overhead).
      'pallas_pair' — the D >= 2 pair kernel on a dim-0-only split:
                      ring-exchange an H-slab halo per micro-step PAIR and
                      recompute the halo slabs trapezoidally in-kernel
                      (half the exchanges/launches of 'pallas_step'; the
                      default composition for split D >= 3 lattices, opt-in
                      for 2-D).
    interpret: run the Pallas kernels in interpret mode (CPU tests).
    """
    if cfg.mesh_axes is None:
        raise ValueError("cfg.mesh_axes required for the halo runner")
    if backend not in (
        "xla", "pallas", "pallas_step", "pallas_pair", "pallas_rdma"
    ):
        raise ValueError(f"unknown halo backend {backend!r}")
    ndim = cfg.ndim
    shape = tuple(cfg.shape)
    ca = cfg.mesh_chain_axis
    lat_axes_spec = tuple(cfg.mesh_axes)
    dtype = cfg.jdtype
    a = cfg.spacing
    measure = a**ndim
    inv_a2 = 1.0 / (a * a)
    c_amp = jnp.asarray(cfg.noise_amp, dtype)
    clamp = jnp.asarray(cfg.clamp, dtype)

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    local_shape = tuple(
        s // (axis_sizes[ax] if ax else 1) for s, ax in zip(shape, lat_axes_spec)
    )
    for s, ls, ax in zip(shape, local_shape, lat_axes_spec):
        if ax and ls * axis_sizes[ax] != s:
            raise ValueError(f"lattice dim {s} not divisible by mesh axis {ax}")
    c_local = cfg.n_chains // (axis_sizes[ca] if ca else 1)

    # --- fused-kernel composition (VERDICT r2 item 1, r3 item 1) ------------
    # 'pallas' resolves to the whole-frame kernel when no lattice axis is
    # actually split (pure chain-DP: full kernel speed per shard); to the
    # multi-dim chunk kernel ('pallas_nd') when a lattice is split on ANY
    # set of dims and the chunk geometry is admissible (ring-exchanged
    # H-deep halos per split dim — multi-hop for thin slabs — and
    # trapezoidal recompute in-kernel: noise keyed by global counters makes
    # the recomputed halo sites bitwise equal to the owning shard's, no
    # fixup needed); and to the 2-D per-micro-step bulk kernel + exact halo
    # fixup as the 2-D fallback when the chunk geometry is not.
    sharded_dims = tuple(bool(ax) and axis_sizes[ax] > 1 for ax in lat_axes_spec)

    def _chunk_eligible():
        return chunk_backend_available(action, cfg, mesh, interpret=interpret)

    if backend == "pallas_pair":
        # explicit request for the chunk kernel (communication-avoiding
        # wide-halo scheme) — any split-dim set at any D >= 2.  A 1-way
        # dim-0 "split" is allowed (ring of one — benchmarking the chunk
        # kernel on a single chip).
        if not any(sharded_dims) and not lat_axes_spec[0]:
            raise ValueError(
                "backend='pallas_pair' needs a split lattice dim (or "
                "cfg.mesh_axes[0] set for the ring-of-one bench case)"
            )
        backend = "pallas_nd"
    if backend == "pallas_rdma":
        # in-kernel remote-DMA halo exchange (r4, VERDICT r3 item 2):
        # dim-0-only splits, single-hop halos; the ring-of-one bench case
        # is allowed like pallas_pair
        if any(sharded_dims[1:]):
            raise ValueError(
                "backend='pallas_rdma' supports dim-0-only lattice splits"
            )
        if not lat_axes_spec[0]:
            raise ValueError(
                "backend='pallas_rdma' needs cfg.mesh_axes[0] set (the "
                "dim-0 ring axis)"
            )
    if backend == "pallas":
        if not any(sharded_dims):
            backend = "pallas_frame"
        elif _chunk_eligible():
            # the wide-halo chunk kernel (measured 1.3x the per-step fixup
            # path and 1.65x the XLA runner on chip, W-fold less
            # communication) covers every admissible split geometry,
            # including multi-dim splits and thin slabs
            backend = "pallas_nd"
        elif ndim == 2:
            # 2-D fallback: per-micro-step bulk kernel + exact edge fixup
            backend = "pallas_step"
        else:
            raise ValueError(
                "this D >= 3 split geometry is not admissible for the "
                "composed chunk kernel (odd loops/W, non-counter RNG, or "
                "no aligned halo/tile); use backend='xla'"
            )
    if backend in ("pallas_frame", "pallas_step", "pallas_nd", "pallas_rdma"):
        if cfg.dtype != "float32":
            raise ValueError(
                "the fused halo kernels are float32-only; use backend='xla' "
                "for other dtypes"
            )
    if backend == "pallas_step" and ndim != 2:
        raise ValueError(
            "the per-micro-step halo kernel supports 2-D lattices; D >= 3 "
            "split lattices use backend='pallas' (the pair kernel) or 'xla'"
        )
    if backend == "pallas_frame" and ndim >= 3 and (
        cfg.loops % 2 or not rng.counter_based(cfg.rng_impl)
    ):
        raise ValueError(
            "the D-dim whole-frame kernel needs an even cfg.loops and "
            "rng_impl='threefry'; use backend='xla' otherwise"
        )
    if backend == "pallas_step" and not rng.counter_based(cfg.rng_impl):
        raise ValueError(
            "the lattice-split Pallas halo path requires rng_impl='threefry' "
            "(the exact edge fixup re-derives counter noise in XLA)"
        )
    volume = float(np.prod(shape))
    lat_reduce = tuple(range(1, ndim + 1))
    nonzero_reduce = tuple(range(2, ndim + 1))
    lat_mesh_axes = tuple(ax for ax in lat_axes_spec if ax)

    def psum_lat(v):
        return lax.psum(v, lat_mesh_axes) if lat_mesh_axes else v

    def pmax_lat(v):
        return lax.pmax(v, lat_mesh_axes) if lat_mesh_axes else v

    def local_offsets():
        ch_off = (lax.axis_index(ca) * c_local) if ca else 0
        lat_off = tuple(
            (lax.axis_index(ax) * ls) if ax else 0
            for ax, ls in zip(lat_axes_spec, local_shape)
        )
        return ch_off, lat_off

    def _exchange_halos(phi):
        """Kick off the ring ppermutes for every sharded lattice dim and
        return {dim: (left_halo, right_halo)}.  Issued before ANY local
        stencil math so the collective-permutes are in flight over ICI while
        the (much larger) interior compute runs — the sends are not data
        dependencies of the bulk work below, which is what lets XLA's
        latency-hiding scheduler overlap them (SURVEY.md §2.5 ring row)."""
        pending = {}
        for d in range(ndim):
            ax = lat_axes_spec[d]
            if not ax or axis_sizes[ax] == 1:
                continue
            axis = d + 1
            n = axis_sizes[ax]
            first = lax.slice_in_dim(phi, 0, 1, axis=axis)
            last = lax.slice_in_dim(
                phi, phi.shape[axis] - 1, phi.shape[axis], axis=axis
            )
            right_halo = lax.ppermute(
                first, ax, [((i + 1) % n, i) for i in range(n)]
            )
            left_halo = lax.ppermute(
                last, ax, [((i - 1) % n, i) for i in range(n)]
            )
            pending[d] = (left_halo, right_halo)
        return pending

    def laplacian_blocking(phi):
        """Non-overlapped reference: halo values sit on the critical path of
        every site's stencil (concatenate-then-add)."""
        lap = jnp.zeros_like(phi)
        for d in range(ndim):
            up, down = halo_shifted(phi, d + 1, lat_axes_spec[d])
            lap = lap + (up + down - 2.0 * phi)
        return lap * inv_a2

    def laplacian_overlapped(phi):
        """Overlapped halo-exchange stencil, bitwise-equal to the unsharded
        ∇²: (a) halos go on the wire, (b) the bulk stencil runs with local
        wraparound (exact for every interior site), (c) only the two edge
        slices per exchanged dim are recomputed with the true neighbor
        values — same operand order as the bulk, so the fixup is exact, and
        it is the only code that waits on the collectives."""
        pending = _exchange_halos(phi)
        lap = jnp.zeros_like(phi)
        for d in range(ndim):
            axis = d + 1
            c = jnp.roll(phi, -1, axis) + jnp.roll(phi, 1, axis) - 2.0 * phi
            if d in pending:
                left_halo, right_halo = pending[d]
                L = phi.shape[axis]
                phi_first = lax.slice_in_dim(phi, 0, 1, axis=axis)
                phi_last = lax.slice_in_dim(phi, L - 1, L, axis=axis)
                up_first = (
                    lax.slice_in_dim(phi, 1, 2, axis=axis) if L > 1 else right_halo
                )
                down_last = (
                    lax.slice_in_dim(phi, L - 2, L - 1, axis=axis)
                    if L > 1
                    else left_halo
                )
                fix_first = up_first + left_halo - 2.0 * phi_first
                fix_last = right_halo + down_last - 2.0 * phi_last
                c = lax.dynamic_update_slice_in_dim(c, fix_first, 0, axis)
                c = lax.dynamic_update_slice_in_dim(c, fix_last, L - 1, axis)
            lap = lap + c
        return lap * inv_a2

    laplacian = laplacian_overlapped if overlap else laplacian_blocking

    def action_density_overlapped(phi):
        """Local block's action density (forward differences), with the same
        overlap structure: bulk forward-diffs run on local rolls while the
        right-edge halos fly, then only the last slice per exchanged dim is
        fixed up."""
        pending = _exchange_halos(phi)
        kin = jnp.zeros_like(phi)
        for d in range(ndim):
            axis = d + 1
            up = jnp.roll(phi, -1, axis)
            if d in pending:
                _, right_halo = pending[d]
                L = phi.shape[axis]
                up = lax.dynamic_update_slice_in_dim(up, right_halo, L - 1, axis)
            diff = up - phi
            kin = kin + 0.5 * diff * diff * inv_a2
        return kin + action.V(phi)

    def action_density_blocking(phi):
        """Non-overlapped reference: the forward-difference neighbours come
        from halo_shifted (concatenate-then-diff), keeping the halo values on
        the critical path of every site — so the bench_halo A/B comparison
        isolates the *full* overlap effect (the laplacian's and this one's)."""
        kin = jnp.zeros_like(phi)
        for d in range(ndim):
            up, _ = halo_shifted(phi, d + 1, lat_axes_spec[d])
            diff = up - phi
            kin = kin + 0.5 * diff * diff * inv_a2
        return kin + action.V(phi)

    action_density_local = (
        action_density_overlapped if overlap else action_density_blocking
    )

    state_spec = FieldState(
        phi=P(ca, *lat_axes_spec),
        mag_mean=P(ca), mag2_mean=P(ca), mag4_mean=P(ca), absmag_mean=P(ca),
        phi2_mean=P(ca), act_mean=P(ca),
        corr_mean=P(ca, lat_axes_spec[0]),
        runs=P(ca), dtau=P(ca), stab_cnt=P(ca), lrg_vl=P(ca), step=P(),
    )
    metrics_spec = {"stable": P(None, ca), "dtau": P(None, ca), "max_phi": P(None, ca)}

    checkerboard = cfg.sweep == Sweep.CHECKERBOARD

    def local_even_mask(lat_off):
        """'Even' sites of the *global* checkerboard on this shard's block."""
        full = (1,) + local_shape
        s = jnp.zeros(full, jnp.int32)
        for d in range(1, ndim + 1):
            s = s + lax.broadcasted_iota(jnp.int32, full, d) + jnp.asarray(
                lat_off[d - 1], jnp.int32
            )
        return s % 2 == 0

    kstep = None
    if backend == "pallas_step":
        from stochquant_tpu.kernels.field_halo_kernel import make_local_step

        kstep = make_local_step(
            action, cfg, local_shape, c_local, sharded_dims, interpret=interpret
        )
    elif backend == "pallas_nd":
        from stochquant_tpu.kernels import field_kernel_nd as fknd

        if cfg.loops % 2:
            raise ValueError("the composed chunk kernel needs an even cfg.loops")
        W_cfg = cfg.exchange_steps or fknd.default_exchange_steps(cfg)
        if W_cfg % 2 or W_cfg < 2:
            raise ValueError("cfg.exchange_steps must be even and >= 2")
        # explicit pallas_pair on an unsplit mesh ("ring of one"): keep the
        # dim-0 halo machinery live so the chunk path itself is benched
        chunk_split = (
            sharded_dims
            if any(sharded_dims)
            else (bool(lat_axes_spec[0]),) + (False,) * (ndim - 1)
        )
        W_main = min(W_cfg, cfg.loops)
        n_chunks = cfg.loops // W_main
        W_tail = cfg.loops - n_chunks * W_main
        kstep_main, halos_main = fknd.make_sharded_chunk_step_md(
            action, cfg, c_local, local_shape, W_main, chunk_split,
            interpret=interpret,
        )
        kstep_tail = halos_tail = None
        if W_tail:
            kstep_tail, halos_tail = fknd.make_sharded_chunk_step_md(
                action, cfg, c_local, local_shape, W_tail, chunk_split,
                interpret=interpret,
            )
    elif backend == "pallas_rdma":
        from stochquant_tpu.kernels import field_kernel_nd as fknd

        if cfg.loops % 2:
            raise ValueError("the RDMA chunk kernel needs an even cfg.loops")
        W_cfg = cfg.exchange_steps or fknd.default_exchange_steps(cfg)
        if W_cfg % 2 or W_cfg < 2:
            raise ValueError("cfg.exchange_steps must be even and >= 2")
        W_main = min(W_cfg, cfg.loops)
        n_chunks = cfg.loops // W_main
        W_tail = cfg.loops - n_chunks * W_main
        kstep_main, _H = fknd.make_rdma_chunk_step(
            action, cfg, c_local, local_shape, W_main, interpret=interpret
        )
        halos_main = None
        kstep_tail = halos_tail = None
        if W_tail:
            kstep_tail, _Ht = fknd.make_rdma_chunk_step(
                action, cfg, c_local, local_shape, W_tail,
                interpret=interpret,
            )
    elif backend == "pallas_frame":
        import dataclasses

        from stochquant_tpu.kernels import field_kernel
        from stochquant_tpu.kernels import field_kernel_nd

        # the lattice is whole on every shard: run the full fused frame
        # kernel per shard (chain-DP composition at single-chip kernel speed)
        local_cfg = dataclasses.replace(
            cfg, n_chains=c_local, mesh_axes=None, mesh_chain_axis=None
        )

    def frame(state: FieldState):
        if backend == "pallas_frame":
            ch_off, _ = local_offsets()
            if ndim >= 3:
                return field_kernel_nd.field_frame_nd(
                    state, action, local_cfg, interpret=interpret,
                    chain_offset=ch_off,
                )
            return field_kernel.field_frame_pallas(
                state, action, local_cfg, interpret=interpret,
                chain_offset=ch_off,
            )
        ch_off, lat_off = local_offsets()
        even = local_even_mask(lat_off) if checkerboard else None

        def em_apply(phi, mask, noise):
            det = (laplacian(phi) - action.dV(phi).astype(dtype)) * state.dtau.reshape(
                (c_local,) + (1,) * ndim
            )
            new_raw = phi + det + noise
            newphi = jnp.clip(new_raw, -clamp, clamp)
            newphi = jnp.where(jnp.isfinite(new_raw), newphi, clamp)
            if mask is not None:
                newphi = jnp.where(mask, newphi, phi)
                det = jnp.where(mask, det, 0.0)
                fin = jnp.isfinite(new_raw) | ~mask
            else:
                fin = jnp.isfinite(new_raw)
            return newphi, jnp.abs(det), fin

        def noise_pair(step):
            return rng.normal_pair_for_shape(
                cfg.seed,
                rng.Stream.FIELD,
                step,
                (c_local,) + local_shape,
                global_lattice_shape=shape,
                chain_offset=ch_off,
                lattice_offsets=lat_off,
                rounds=rng.rounds_of(cfg.rng_impl),
            )

        def finish_micro_step(
            carry, newphi, max_det_loc, bad_loc, npmax_loc,
            mag_loc, phi2_loc, act_loc, s_slice_loc,
        ):
            """Shared micro-step tail: global reductions, trip decision,
            observable accumulation, per-chain freeze.  The XLA and Pallas
            micro-step bodies both end here so the trip semantics and the
            accumulated sums go through ONE set of expressions (the bitwise
            contract of tests/test_halo.py)."""
            phi, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrgvl, step = carry

            max_det = pmax_lat(max_det_loc)
            # pmax over int-cast booleans: "any non-finite value anywhere"
            anybad = pmax_lat(bad_loc.astype(jnp.int32)) > 0
            tripped = (max_det > lrgvl) | anybad

            mag = psum_lat(mag_loc) / volume
            phi2 = psum_lat(phi2_loc) / volume
            act_d = psum_lat(act_loc) / volume

            # time-slice mean over non-0 dims: (C_loc, L0_loc)
            n_per_slice = volume / shape[0]
            s_slice = s_slice_loc
            if lat_mesh_axes:
                other_axes = tuple(ax for ax in lat_axes_spec[1:] if ax)
                if other_axes:
                    s_slice = lax.psum(s_slice, other_axes)
            s_slice = s_slice / n_per_slice
            ax0 = lat_axes_spec[0]
            if ax0:
                contrib = jnp.where(
                    lax.axis_index(ax0) == 0, s_slice[:, :1], jnp.zeros_like(s_slice[:, :1])
                )
                s0 = lax.psum(contrib, ax0)
            else:
                s0 = s_slice[:, :1]
            corr = s_slice * s0

            # frame-local sample sums (two-level accumulation, accum.py)
            mag2 = mag * mag
            ms2 = ms + mag
            m2s2 = m2s + mag2
            m4s2 = m4s + mag2 * mag2
            ams2 = ams + jnp.abs(mag)
            p2s2 = p2s + phi2
            acs2 = acs + act_d
            cs2 = cs + corr

            lrgvl2 = jnp.maximum(lrgvl, pmax_lat(npmax_loc))

            u = unstable.reshape((c_local,) + (1,) * ndim)
            phi = jnp.where(u, phi, newphi)
            keep = lambda new, old: jnp.where(unstable, old, new)
            ms = keep(ms2, ms)
            m2s = keep(m2s2, m2s)
            m4s = keep(m4s2, m4s)
            ams = keep(ams2, ams)
            p2s = keep(p2s2, p2s)
            acs = keep(acs2, acs)
            cs = jnp.where(unstable[:, None], cs, cs2)
            lrgvl = jnp.where(unstable, lrgvl, lrgvl2)
            unstable = unstable | tripped
            return (phi, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrgvl, step + 1)

        def micro_step(carry, eta):
            phi = carry[0]

            noise = c_amp * jnp.sqrt(2.0 * state.dtau / measure).reshape(
                (c_local,) + (1,) * ndim
            ) * eta

            if checkerboard:
                # second half-sweep re-exchanges halos of the fresh even sites
                phi_e, absdet_e, fin_e = em_apply(phi, even, noise)
                newphi, absdet_o, fin_o = em_apply(phi_e, ~even, noise)
                absdet = jnp.maximum(absdet_e, absdet_o)
                fin = fin_e & fin_o
            else:
                newphi, absdet, fin = em_apply(phi, None, noise)

            return finish_micro_step(
                carry,
                newphi,
                jnp.max(absdet, axis=lat_reduce),
                ~jnp.all(fin, axis=lat_reduce),
                jnp.max(jnp.abs(newphi), axis=lat_reduce),
                jnp.sum(phi, axis=lat_reduce),
                jnp.sum(phi * phi, axis=lat_reduce),
                jnp.sum(action_density_local(phi).astype(dtype), axis=lat_reduce),
                jnp.sum(phi, axis=nonzero_reduce),
            )

        # ------------- fused-kernel micro-step (backend='pallas_step') ------
        # kernels/field_halo_kernel.py: the bulk kernel has NO halo inputs
        # (its edge slices wrap locally and are masked from the detector
        # partials), so the ppermutes issued here overlap the kernel launch;
        # the O(surface) fixup below then recomputes the edge updates with
        # the true halos — exact per-site expression/operand order, so the
        # trajectory stays bitwise vs the XLA micro_step (interpret mode).

        def slice_noise(pair_base, parity, d, idx):
            """Re-derive the counter noise on one edge slice (same global
            (chain, site, step) Threefry counters as the kernel)."""
            slice_shape = tuple(
                1 if dd == d else local_shape[dd] for dd in range(ndim)
            )
            offs = tuple(
                lat_off[dd] + (idx if dd == d else 0) for dd in range(ndim)
            )
            e0, e1 = rng.normal_pair_for_shape(
                cfg.seed, rng.Stream.FIELD, pair_base,
                (c_local,) + slice_shape,
                global_lattice_shape=shape,
                chain_offset=ch_off,
                lattice_offsets=offs,
                rounds=rng.rounds_of(cfg.rng_impl),
            )
            z = e0 if parity == 0 else e1
            return (
                c_amp * jnp.sqrt(2.0 * state.dtau / measure)
            ).reshape((c_local,) + (1,) * ndim) * z.astype(dtype), offs, slice_shape

        def parity_mask_slice(offs, slice_shape, kind):
            if kind is None:
                return None
            full = (1,) + slice_shape
            s = jnp.zeros(full, jnp.int32)
            for dd in range(ndim):
                s = s + lax.broadcasted_iota(jnp.int32, full, dd + 1) + jnp.asarray(
                    offs[dd], jnp.int32
                )
            evenm = (s % 2) == 0
            return evenm if kind == "even" else ~evenm

        def slice_laplacian(phi, pending, d, side):
            """True laplacian on the first/last slice along sharded dim d,
            composed dim-0-then-dim-1 like the kernel body (2-D)."""
            axis = d + 1
            L = phi.shape[axis]
            idx = 0 if side == 0 else L - 1
            sl = lambda x: lax.slice_in_dim(x, idx, idx + 1, axis=axis)
            sl_phi = sl(phi)
            left_halo, right_halo = pending[d]
            if side == 0:
                up_d = lax.slice_in_dim(phi, 1, 2, axis=axis) if L > 1 else right_halo
                c_own = up_d + left_halo - 2.0 * sl_phi
            else:
                down_d = (
                    lax.slice_in_dim(phi, L - 2, L - 1, axis=axis)
                    if L > 1
                    else left_halo
                )
                c_own = right_halo + down_d - 2.0 * sl_phi
            e = 1 - d
            e_axis = e + 1
            Le = phi.shape[e_axis]
            up_e = jnp.roll(sl_phi, -1, e_axis)
            down_e = jnp.roll(sl_phi, 1, e_axis)
            if e in pending:
                el, er = pending[e]
                up_e = lax.dynamic_update_slice_in_dim(up_e, sl(er), Le - 1, e_axis)
                down_e = lax.dynamic_update_slice_in_dim(down_e, sl(el), 0, e_axis)
            c_other = up_e + down_e - 2.0 * sl_phi
            zero = jnp.zeros_like(sl_phi)
            lap = (zero + c_own + c_other) if d == 0 else (zero + c_other + c_own)
            return sl_phi, lap * inv_a2, idx

        def apply_fixup(phi, newphi, pending, pair_base, parity, mask_kind):
            """Splice the exact halo-informed updates into the kernel's bulk
            result; returns the fixed field + the edge detector partials."""
            dtau_b = state.dtau.reshape((c_local,) + (1,) * ndim)
            ed = jnp.zeros((c_local,), dtype)
            eb = jnp.zeros((c_local,), bool)
            ep = jnp.zeros((c_local,), dtype)
            for d in pending:
                axis = d + 1
                for side in (0, 1):
                    sl_phi, lap, idx = slice_laplacian(phi, pending, d, side)
                    noise_sl, offs, slice_shape = slice_noise(pair_base, parity, d, idx)
                    mask_sl = parity_mask_slice(offs, slice_shape, mask_kind)
                    det = (lap - action.dV(sl_phi).astype(dtype)) * dtau_b
                    new_raw = sl_phi + det + noise_sl
                    new_sl = jnp.clip(new_raw, -clamp, clamp)
                    new_sl = jnp.where(jnp.isfinite(new_raw), new_sl, clamp)
                    if mask_sl is not None:
                        new_sl = jnp.where(mask_sl, new_sl, sl_phi)
                        det = jnp.where(mask_sl, det, 0.0)
                        fin = jnp.isfinite(new_raw) | ~mask_sl
                    else:
                        fin = jnp.isfinite(new_raw)
                    newphi = lax.dynamic_update_slice_in_dim(newphi, new_sl, idx, axis)
                    ed = jnp.maximum(ed, jnp.max(jnp.abs(det), axis=lat_reduce))
                    eb = eb | ~jnp.all(fin, axis=lat_reduce)
                    ep = jnp.maximum(ep, jnp.max(jnp.abs(new_sl), axis=lat_reduce))
            return newphi, ed, eb, ep

        def act_corrections(phi, pending):
            """Forward-difference kinetic-term corrections for the kernel's
            locally-wrapped action sum: only the last slice per exchanged dim
            differs (sum-order perturbation only — observables are
            tolerance-gated, the trajectory never reads this)."""
            corr = jnp.zeros((c_local,), dtype)
            for d in pending:
                axis = d + 1
                L = phi.shape[axis]
                _, right_halo = pending[d]
                last = lax.slice_in_dim(phi, L - 1, L, axis=axis)
                first = lax.slice_in_dim(phi, 0, 1, axis=axis)
                diff_l = first - last
                diff_t = right_halo - last
                corr = corr + jnp.sum(
                    0.5 * diff_t * diff_t * inv_a2
                    - 0.5 * diff_l * diff_l * inv_a2,
                    axis=lat_reduce,
                )
            return corr

        def micro_step_pallas(carry, pair_base, parity):
            phi = carry[0]
            koffs = (ch_off, lat_off[0], lat_off[1])
            pending = _exchange_halos(phi)
            if checkerboard:
                o = kstep(phi, state.dtau, pair_base, parity, 0, koffs)
                np_e, mag_s, phi2_s, act_s, slice_s, ad_e, nb_e, _ = o
                phi_e, ed_e, eb_e, _ = apply_fixup(
                    phi, np_e, pending, pair_base, parity, "even"
                )
                pending2 = _exchange_halos(phi_e)
                o2 = kstep(phi_e, state.dtau, pair_base, parity, 1, koffs)
                np_o, _, _, _, _, ad_o, nb_o, npm_o = o2
                newphi, ed_o, eb_o, ep_o = apply_fixup(
                    phi_e, np_o, pending2, pair_base, parity, "odd"
                )
                max_det_loc = jnp.maximum(
                    jnp.maximum(ad_e[:, 0], ed_e), jnp.maximum(ad_o[:, 0], ed_o)
                )
                bad_loc = (nb_e[:, 0] > 0) | eb_e | (nb_o[:, 0] > 0) | eb_o
                npmax_loc = jnp.maximum(npm_o[:, 0], ep_o)
            else:
                o = kstep(phi, state.dtau, pair_base, parity, 0, koffs)
                np_b, mag_s, phi2_s, act_s, slice_s, ad_i, nb_i, npm_i = o
                newphi, ed, eb, ep = apply_fixup(
                    phi, np_b, pending, pair_base, parity, None
                )
                max_det_loc = jnp.maximum(ad_i[:, 0], ed)
                bad_loc = (nb_i[:, 0] > 0) | eb
                npmax_loc = jnp.maximum(npm_i[:, 0], ep)
            act_loc = act_s[:, 0] + act_corrections(phi, pending)
            return finish_micro_step(
                carry, newphi, max_det_loc, bad_loc, npmax_loc,
                mag_s[:, 0], phi2_s[:, 0], act_loc, slice_s[:, :, 0],
            )

        # --------- D >= 2 chunk kernel (backend='pallas_nd') ----------------
        # kernels/field_kernel_nd.make_sharded_chunk_step_md: ring-exchange
        # an H-deep halo along EVERY split lattice dim once per W
        # micro-steps (two-phase, ascending dims, so corners arrive through
        # the neighbours' already-extended blocks; multi-hop ppermutes when
        # the local slab is thinner than the halo — config 4's 2-row slabs),
        # then ONE kernel launch advances the whole chunk, recomputing the
        # halo regions trapezoidally — global-counter noise makes the
        # recomputed sites bitwise equal to the owning shard's values, so
        # there is no fixup and communication drops to one exchange per W
        # steps (the communication-avoiding wide-halo scheme,
        # cfg.exchange_steps).  Per-step detector stats come out of the
        # kernel; the trip/keep gating below matches
        # field_kernel_nd.field_frame_nd exactly (phi evolves un-frozen
        # within a tripped frame — unobservable, the frame epilogue rolls
        # rejected frames back to the frame-start state).

        def _extend(x, d, Hd):
            """Extend ``x`` by Hd sites per side along lattice dim d via the
            ring; multi-hop when the local extent is thinner than Hd."""
            ax = lat_axes_spec[d]
            axis = d + 1
            n = axis_sizes[ax] if ax else 1
            Ld = x.shape[axis]
            if Hd <= Ld:
                first = lax.slice_in_dim(x, 0, Hd, axis=axis)
                last = lax.slice_in_dim(x, Ld - Hd, Ld, axis=axis)
                down = lax.ppermute(
                    first, ax, [((i + 1) % n, i) for i in range(n)]
                )
                up = lax.ppermute(
                    last, ax, [((i - 1) % n, i) for i in range(n)]
                )
            else:
                k = -(-Hd // Ld)  # hops per side
                ups, downs = [], []
                for j in range(1, k + 1):
                    ups.append(
                        lax.ppermute(x, ax, [((i - j) % n, i) for i in range(n)])
                    )
                    downs.append(
                        lax.ppermute(x, ax, [((i + j) % n, i) for i in range(n)])
                    )
                upcat = jnp.concatenate(list(reversed(ups)), axis=axis)
                dncat = jnp.concatenate(downs, axis=axis)
                up = lax.slice_in_dim(upcat, k * Ld - Hd, k * Ld, axis=axis)
                down = lax.slice_in_dim(dncat, 0, Hd, axis=axis)
            return jnp.concatenate([up, x, down], axis=axis)

        n_per_slice = volume / shape[0]

        def chunk_step_md(carry, kstep, halos, Wx):
            phi, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg, step = carry
            if halos is None:
                # RDMA mode: the KERNEL exchanges the halos itself — no
                # ppermute, no concat.  Pass the ring neighbours' LOGICAL
                # device ids (flattened mesh coordinates, C order) so the
                # kernel addresses the right chip on multi-axis meshes.
                ax0 = lat_axes_spec[0]
                n0 = axis_sizes[ax0]
                me0 = lax.axis_index(ax0)
                base = jnp.int32(0)
                for name in mesh.axis_names:
                    sz = axis_sizes[name]
                    idx = lax.axis_index(name) if name != ax0 else 0
                    base = base * sz + idx
                stride = jnp.int32(1)
                seen = False
                for name in reversed(mesh.axis_names):
                    if name == ax0:
                        seen = True
                        break
                    stride = stride * axis_sizes[name]
                assert seen
                left_id = base + ((me0 + n0 - 1) % n0) * stride
                right_id = base + ((me0 + 1) % n0) * stride
                phi2_arr, sl, stats = kstep(
                    phi, state.dtau, step, (ch_off, lat_off[0], left_id, right_id)
                )
                halos = (0,) * ndim
            else:
                ext = phi
                for d in range(ndim):
                    if halos[d]:
                        ext = _extend(ext, d, halos[d])
                phi2_arr, sl, stats = kstep(
                    ext, state.dtau, step, (ch_off,) + tuple(lat_off)
                )

            def obs_step(vals, s_slice_loc, st):
                ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg = vals
                mag = psum_lat(st[:, :, 0].sum(axis=1)) / volume
                phi2m = psum_lat(st[:, :, 1].sum(axis=1)) / volume
                act_d = psum_lat(st[:, :, 2].sum(axis=1)) / volume
                max_det = pmax_lat(st[:, :, 3].max(axis=1))
                max_new = pmax_lat(st[:, :, 4].max(axis=1))
                tripped = max_det > lrg
                # s_slice_loc: per-row OWNED sums over local dims >= 1;
                # complete the slice across the other mesh axes, then
                # normalise.  Global row 0 lives on the dim-0 ring's first
                # shard.
                s_slice = s_slice_loc
                other_axes = tuple(ax for ax in lat_axes_spec[1:] if ax)
                if other_axes:
                    s_slice = lax.psum(s_slice, other_axes)
                s_slice = s_slice / n_per_slice
                ax0 = lat_axes_spec[0]
                if ax0:
                    contrib = jnp.where(
                        lax.axis_index(ax0) == 0,
                        s_slice[:, :1],
                        jnp.zeros_like(s_slice[:, :1]),
                    )
                    s0 = lax.psum(contrib, ax0)
                else:
                    s0 = s_slice[:, :1]
                corr = s_slice * s0
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
            for w in range(Wx):
                vals = obs_step(vals, sl[:, w], stats[:, :, 5 * w : 5 * w + 5])
            ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg = vals
            # the kernel's output keeps the EXT extent on dims >= 1: slice
            # back to the owned block
            ext_tail = tuple(
                l + 2 * h for l, h in zip(local_shape[1:], halos[1:])
            )
            out = phi2_arr.reshape((c_local, local_shape[0]) + ext_tail)
            sel = (slice(None), slice(None)) + tuple(
                slice(h, h + l) for h, l in zip(halos[1:], local_shape[1:])
            )
            phi = out[sel]
            return (
                phi, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrg,
                step + Wx,
            )

        if backend in ("pallas_nd", "pallas_rdma"):
            pair_step = odd_tail = None  # chunk scan below
        elif backend == "pallas_step":
            def pair_step(carry, _):
                pair_base = carry[-1]
                carry = micro_step_pallas(carry, pair_base, 0)
                carry = micro_step_pallas(carry, pair_base, 1)
                return carry, None

            def odd_tail(carry):
                return micro_step_pallas(carry, carry[-1], 0)
        else:
            def pair_step(carry, _):
                e0, e1 = noise_pair(carry[-1])
                carry = micro_step(carry, e0.astype(dtype))
                carry = micro_step(carry, e1.astype(dtype))
                return carry, None

            def odd_tail(carry):
                e0, _ = noise_pair(carry[-1])
                return micro_step(carry, e0.astype(dtype))

        zc = jnp.zeros((c_local,), dtype)
        init = (
            state.phi, zc, zc, zc, zc, zc, zc, jnp.zeros_like(state.corr_mean),
            jnp.zeros((c_local,), bool), state.lrg_vl, state.step,
        )
        if backend in ("pallas_nd", "pallas_rdma"):
            carry, _ = lax.scan(
                lambda cr, _: (
                    chunk_step_md(cr, kstep_main, halos_main, W_main), None
                ),
                init, None, length=n_chunks,
            )
            if kstep_tail is not None:
                carry = chunk_step_md(carry, kstep_tail, halos_tail, W_tail)
        else:
            carry, _ = lax.scan(pair_step, init, None, length=cfg.loops // 2)
            if cfg.loops % 2:
                carry = odd_tail(carry)
        phi, ms, m2s, m4s, ams, p2s, acs, cs, unstable, lrgvl, step_end = carry

        accept = ~unstable
        au = accept.reshape((c_local,) + (1,) * ndim)
        phi = jnp.where(au, phi, state.phi)
        # merge frame sums into running means (integrators/accum.py)
        n_new = accum.runs_after(state.runs, cfg.loops).astype(dtype)
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
        lrgvl = sel(lrgvl, state.lrg_vl)
        runs = accum.bump_runs(state.runs, cfg.loops, accept)

        grow = accept & (state.stab_cnt >= cfg.grow_after)
        dtau = jnp.where(
            grow,
            state.dtau / cfg.shrink,
            jnp.where(accept, state.dtau, state.dtau * cfg.shrink),
        )
        if cfg.dtau_max is not None:
            dtau = jnp.minimum(dtau, jnp.asarray(cfg.dtau_max, dtype))
        stab_cnt = jnp.where(accept, jnp.where(grow, 0, state.stab_cnt + 1), 0)

        new_state = FieldState(
            phi=phi, mag_mean=mm, mag2_mean=m2m, mag4_mean=m4m,
            absmag_mean=amm,
            phi2_mean=p2m, act_mean=am, corr_mean=cm,
            runs=runs, dtau=dtau, stab_cnt=stab_cnt, lrg_vl=lrgvl, step=step_end,
        )
        metrics = {"stable": accept, "dtau": dtau, "max_phi": lrgvl}
        return new_state, metrics

    _cache = {}

    def _runner(n_frames: int):
        if n_frames not in _cache:
            sharded = shard_map(
                lambda s: lax.scan(lambda st, _: frame(st), s, None, length=n_frames),
                mesh=mesh,
                in_specs=(state_spec,),
                out_specs=(state_spec, metrics_spec),
                check_vma=False,
            )
            _cache[n_frames] = jax.jit(sharded)
        return _cache[n_frames]

    def run(state: FieldState, n_frames: int):
        return _runner(n_frames)(state)

    return run
