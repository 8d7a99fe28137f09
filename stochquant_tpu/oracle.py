"""ctypes bindings for the native reference oracle (cc/oracle.cpp).

Provides the exact reference algorithm (serial, deterministic) for baseline
measurement and statistical cross-validation, plus the reference's "%a"
hex-float checkpoint codec.  The shared library is built on demand with the
in-tree Makefile (g++ only, no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple

import numpy as np

_CC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cc")
_LIB_PATH = os.path.join(_CC_DIR, "liboracle.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_CC_DIR, "oracle.cpp")
    ):
        subprocess.run(["make", "-s"], cwd=_CC_DIR, check=True)
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    u64p = ctypes.POINTER(ctypes.c_uint64)

    lib.sq_ref_frame.restype = ctypes.c_int
    lib.sq_ref_frame.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, dp, dp, dp, dp, u64p, ip, dp,
        ctypes.c_int, dp, dp, dp,
    ]
    lib.sq_ref_run.restype = ctypes.c_double
    lib.sq_ref_run.argtypes = [
        ctypes.c_int, ctypes.c_double, dp, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_uint64, dp, dp, dp, dp, dp, ip,
    ]
    lib.sq_ref_init.restype = None
    lib.sq_ref_init.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_uint64,
        dp, dp, dp, dp, dp,
    ]
    lib.sq_ckpt_write.restype = ctypes.c_int
    lib.sq_ckpt_write.argtypes = [
        ctypes.c_char_p, ctypes.c_int, dp, dp, dp, dp,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_int,
    ]
    lib.sq_ckpt_read.restype = ctypes.c_int
    lib.sq_ckpt_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int, dp, dp, dp, dp, dp, ip, dp,
    ]
    _lib = lib
    return lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class OracleResult(NamedTuple):
    f: np.ndarray
    x_mean: np.ndarray
    xx0_mean: np.ndarray
    xavg: np.ndarray       # connected correlator vs midpoint
    omega: float
    runs: int
    dtau: float
    updates_per_sec: float


def run_reference(
    n_sites: int,
    dt: float,
    dtau: float,
    frames: int,
    loops: int,
    pot_id: int = 3,
    noise_amp: float = 1.0,
    seed: int = 12345,
) -> OracleResult:
    """Cold-start + run the reference algorithm; returns final state,
    observables and the measured host throughput (site-updates/sec)."""
    lib = _load()
    N = n_sites
    f = np.zeros(N)
    x = np.zeros(N)
    xx0 = np.zeros(N)
    xavg = np.zeros(N)
    omega = np.zeros(1)
    runs = ctypes.c_int(0)
    dtau_io = np.array([dtau])
    lib.sq_ref_init(N, dt, dtau, seed, _dp(f), _dp(x), _dp(xx0), _dp(xavg), _dp(omega))
    ups = lib.sq_ref_run(
        N, dt, _dp(dtau_io), frames, loops, pot_id, noise_amp, seed,
        _dp(f), _dp(x), _dp(xx0), _dp(xavg), _dp(omega), ctypes.byref(runs),
    )
    return OracleResult(
        f=f, x_mean=x, xx0_mean=xx0, xavg=xavg, omega=float(omega[0]),
        runs=int(runs.value), dtau=float(dtau_io[0]), updates_per_sec=float(ups),
    )


def write_reference_checkpoint(path, xavg, xx0, x, f, omega, runs, dtau, width=40):
    lib = _load()
    arrs = [np.ascontiguousarray(a, np.float64) for a in (xavg, xx0, x, f)]
    r = lib.sq_ckpt_write(
        str(path).encode(), len(arrs[0]), *(_dp(a) for a in arrs),
        float(omega), int(runs), float(dtau), int(width),
    )
    if r:
        raise IOError(f"sq_ckpt_write failed: {r}")


def read_reference_checkpoint(path, n_sites):
    lib = _load()
    N = n_sites
    xavg, xx0, x, f = (np.zeros(N) for _ in range(4))
    omega = np.zeros(1)
    runs = ctypes.c_int(0)
    dtau = np.zeros(1)
    r = lib.sq_ckpt_read(
        str(path).encode(), N, _dp(xavg), _dp(xx0), _dp(x), _dp(f),
        _dp(omega), ctypes.byref(runs), _dp(dtau),
    )
    if r:
        raise IOError(f"sq_ckpt_read failed: {r}")
    return dict(
        xavg=xavg, xx0=xx0, x=x, f=f, omega=float(omega[0]),
        runs=int(runs.value), dtau=float(dtau[0]),
    )
