"""ctypes bindings for the native sampler-support library (csrc/peps_native.cpp).

Compiled on first use with g++; every entry point has a pure-numpy fallback so
the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import stat
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    # the native source ships inside the package (peps_tpu/csrc/) so
    # installed wheels carry it; fall back to the old repo-root layout
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [os.path.join(pkg, "csrc", "peps_native.cpp"),
                  os.path.join(pkg, "..", "csrc", "peps_native.cpp")]
    src = next((os.path.abspath(c) for c in candidates
                if os.path.exists(c)), None)
    if src is None:
        return None
    # per-user cache with owner-only permissions: a world-writable shared
    # temp dir would let another local user pre-plant a library that CDLL
    # loads into this process
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    cache_dir = os.path.join(base, "peps_tpu")
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    st = os.stat(cache_dir)
    if st.st_uid != os.getuid() or (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
        return None
    lib_path = os.path.join(cache_dir, "libpeps_native.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", lib_path],
                check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.count_sector_configs.restype = ctypes.c_longlong
    lib.enumerate_sector_configs.restype = ctypes.c_longlong
    lib.binned_stats.restype = None
    lib.integrated_autocorr_time.restype = ctypes.c_double
    _LIB = lib
    return lib


def sector_configs_native(ly: int, lx: int, occupancy: dict[int, int],
                          d: int | None = None) -> np.ndarray:
    """Enumerate fixed-occupancy configs [N, Ly, Lx] (native; numpy fallback
    via peps_tpu.algorithm.exact_sum.sector_configs)."""
    n_sites = ly * lx
    if d is None:
        d = max(occupancy) + 1
    counts = np.zeros(d, dtype=np.int32)
    for s, c in occupancy.items():
        counts[s] = c
    lib = _build_and_load()
    if lib is None:
        from peps_tpu.algorithm.exact_sum import sector_configs
        return sector_configs(ly, lx, occupancy)
    total = lib.count_sector_configs(
        n_sites, d, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if total < 0:
        raise ValueError("bad occupancy counts or too many configurations")
    out = np.empty((total, n_sites), dtype=np.int32)
    written = lib.enumerate_sector_configs(
        n_sites, d, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), total)
    assert written == total
    return out.reshape(total, ly, lx)


def binned_stats_native(samples: np.ndarray):
    """(mean, stderr) with sqrt(N) binning; samples [S] or [S, C]."""
    x = np.ascontiguousarray(np.asarray(samples, dtype=np.float64))
    if x.ndim == 1:
        x = x[:, None]
    lib = _build_and_load()
    if lib is None:
        from peps_tpu.montecarlo.statistics import mean_and_binned_error
        m, e = mean_and_binned_error(x)
        return float(m), float(e)
    mean = ctypes.c_double()
    err = ctypes.c_double()
    lib.binned_stats(x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     x.shape[0], x.shape[1], ctypes.byref(mean),
                     ctypes.byref(err))
    return mean.value, err.value


def autocorr_time_native(samples: np.ndarray, max_lag: int | None = None):
    x = np.ascontiguousarray(np.asarray(samples, dtype=np.float64))
    if x.ndim == 1:
        x = x[:, None]
    if max_lag is None:
        max_lag = min(x.shape[0] // 4, 100)
    lib = _build_and_load()
    if lib is None:
        from peps_tpu.montecarlo.statistics import \
            integrated_autocorrelation_time
        return integrated_autocorrelation_time(x)
    return float(lib.integrated_autocorr_time(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.shape[0], x.shape[1], max_lag))
