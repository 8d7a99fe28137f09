"""Full-state checkpointing.

The reference checkpoint drops the RNG state and ignores ω on resume
(tauhost.c:122-124 — flaw F4), so resumed runs are not statistically
continuous.  Here a checkpoint is the complete ``ChainState``/``FieldState``
pytree plus the serialized config: resume-then-run is *bitwise* identical to
an uninterrupted run (tests/test_checkpoint.py).

Format: a single ``.npz`` with one entry per state leaf plus the config
JSON; portable, mmap-friendly, no external deps.  Interop with the
reference's "%a" format lives in io/reference_fmt.py / the C++ codec.
"""

from __future__ import annotations

import json
from typing import Union

import jax
import numpy as np

from stochquant_tpu.config import ChainConfig, FieldConfig
from stochquant_tpu.integrators.complex_field import ComplexFieldConfig, ComplexFieldState
from stochquant_tpu.integrators.complex_langevin import (
    CLState,
    ComplexChainConfig,
    ComplexChainState,
    ComplexLangevinConfig,
)
from stochquant_tpu.integrators.field import FieldState
from stochquant_tpu.integrators.gauge import GaugeConfig, GaugeState
from stochquant_tpu.integrators.langevin import ChainState

# kind tag -> (state class, config class); tags are stable on-disk identifiers
_KIND = {
    "chain": (ChainState, ChainConfig),
    "field": (FieldState, FieldConfig),
    "complex0d": (CLState, ComplexLangevinConfig),
    "complex_chain": (ComplexChainState, ComplexChainConfig),
    "complex_field": (ComplexFieldState, ComplexFieldConfig),
    "gauge": (GaugeState, GaugeConfig),
}
_STATE_KIND = {cls: kind for kind, (cls, _) in _KIND.items()}


def _leaf_to_host(leaf) -> np.ndarray:
    """Device→host copy that never transfers a complex buffer: the TPU
    tunnel backend (PJRT 'axon' plugin) lacks complex d2h/h2d transfer, so
    complex leaves are split into real/imag *inside* a jitted program (real
    outputs transfer fine) and reassembled host-side."""
    import jax.numpy as jnp

    x = jnp.asarray(leaf)
    if not jnp.iscomplexobj(x):
        return np.asarray(x)
    r, i = jax.jit(lambda c: (jnp.real(c), jnp.imag(c)))(x)
    r = np.asarray(r)
    out = np.empty(r.shape, np.result_type(r.dtype, np.complex64))
    out.real = r
    out.imag = np.asarray(i)
    return out


def _leaf_to_device(a: np.ndarray):
    """Host→device: complex arrays enter as two real transfers combined
    on-device (see _leaf_to_host)."""
    import jax.numpy as jnp
    from jax import lax

    a = np.asarray(a)
    if not np.iscomplexobj(a):
        return jnp.asarray(a)
    return jax.jit(lax.complex)(jnp.asarray(a.real.copy()), jnp.asarray(a.imag.copy()))


def save(path, state: Union[ChainState, FieldState], cfg, *, frames_done=None) -> None:
    """Write the full state + config (and, when given, the completed-frame
    count — the authoritative resume progress: the step-counter heuristic
    cannot distinguish burn-in from measurement frames)."""
    kind = _STATE_KIND[type(state)]
    payload = {
        f"state_{name}": _leaf_to_host(leaf)
        for name, leaf in zip(state._fields, state)
    }
    meta = {"kind": kind, "config": cfg.to_json(), "version": 1}
    if frames_done is not None:
        meta["frames_done"] = int(frames_done)
    payload["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    with open(path, "wb") as fh:
        np.savez(fh, **payload)


def read_meta(path) -> dict:
    """Parse just the metadata record of a checkpoint (kind, config JSON,
    version, optional frames_done) without touching the arrays."""
    with np.load(path) as z:
        return json.loads(bytes(z["meta"].tobytes()).decode())


def load(path):
    """Returns (state, cfg)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        cls, cfg_cls = _KIND[meta["kind"]]
        leaves = [z[f"state_{name}"] for name in cls._fields]
    cfg = cfg_cls.from_json(meta["config"])
    state = cls(*[_leaf_to_device(a) for a in leaves])
    return state, cfg


def export_reference(path, state: ChainState, chain: int = 0) -> None:
    """Write one chain of a ChainState in the reference's "%a" schema so the
    original tauhost can resume from it (its reader re-randomizes ω and RNG
    anyway — flaw F4)."""
    from stochquant_tpu.io import reference_fmt
    from stochquant_tpu.integrators.langevin import connected_correlator

    corr = np.asarray(connected_correlator(state))[chain]
    reference_fmt.write(
        path,
        xavg=corr,
        xx0=np.asarray(state.xx0_mean)[chain],
        x=np.asarray(state.x_mean)[chain],
        f=np.asarray(state.f)[chain],
        omega=float(np.asarray(state.omega)[chain]),
        runs=int(np.asarray(state.runs)[chain]),
        dtau=float(np.asarray(state.dtau)[chain]),
    )


def import_reference(path, cfg: ChainConfig) -> ChainState:
    """Load a reference-format checkpoint into a (replicated) ChainState —
    the cross-validation entry point for data produced by the original code.
    Reference files carry no RNG state (flaw F4); the imported state starts a
    fresh counter stream at ``step=0``."""
    import jax.numpy as jnp

    from stochquant_tpu.io import reference_fmt

    d = reference_fmt.read(path, cfg.n_sites)
    C = cfg.n_chains
    rep = lambda a: jnp.broadcast_to(jnp.asarray(a, cfg.jdtype)[None, :], (C, cfg.n_sites))
    return ChainState(
        f=rep(d["f"]),
        omega=jnp.full((C,), d["omega"], cfg.jdtype),
        x_mean=rep(d["x"]),
        xx0_mean=rep(d["xx0"]),
        x2_mean=jnp.zeros((C, cfg.n_sites), cfg.jdtype),
        runs=jnp.full((C,), d["runs"], jnp.uint32),
        dtau=jnp.full((C,), min(d["dtau"], cfg.dtau), cfg.jdtype),  # tauhost.c:131-137 clamp
        stab_cnt=jnp.zeros((C,), jnp.int32),
        lrg_vl=jnp.max(jnp.abs(rep(d["f"])), axis=-1),
        spec_mean=jnp.zeros((C, cfg.n_sites // 2 + 1), cfg.jdtype),
        step=jnp.uint32(0),
    )
