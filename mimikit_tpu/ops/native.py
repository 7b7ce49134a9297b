"""ctypes bindings for the native C++ kernels.

Builds ``libmmk_kernels.so`` lazily with ``make`` on first import (g++ with
OpenMP); callers catch ImportError/OSError and fall back to numpy paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libmmk_kernels.so")


def _build() -> None:
    subprocess.run(
        ["make", "-C", _DIR, "libmmk_kernels.so"],
        check=True,
        capture_output=True,
    )


# Always invoke make: the Makefile's kernels.cpp dependency makes this a
# cheap no-op when the .so is current, rebuilds after source edits, and —
# because the binary is compiled with -march=native and never committed —
# guarantees the loaded library matches THIS host's ISA (a foreign-ISA .so
# would load fine via CDLL and SIGILL at call time).
_build()

_lib = ctypes.CDLL(_SO)

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

_lib.mmk_derivative.argtypes = [_f32p, _f32p, _i64, _i64, _i64]
_lib.mmk_pwdk_cosine.argtypes = [_f64p, _f64p, _i64, _i64, _i64]
_lib.mmk_convolve_diagonals.argtypes = [_f64p, _f64p, _f64p, _i64, _i64]
_lib.mmk_attack_decay.restype = _i64
_lib.mmk_attack_decay.argtypes = [_f32p, _i64, _i64p, _i64p]
_lib.mmk_left_right_scores.argtypes = [
    _f32p, _i64p, _f32p, _i64p, _i64, _i64, _f32p, _f32p,
]
_lib.mmk_refine_cuts.argtypes = [
    _u8p, _i64p, _i64p, _i64p, _f32p, _f32p, _i64, _i64, _i64, _i64p,
]


def derivative(y: np.ndarray, max_lag: int) -> np.ndarray:
    y = np.ascontiguousarray(y, np.float32)
    flat = y.reshape(-1, y.shape[-1]) if y.ndim > 1 else y.reshape(1, -1)
    out = np.empty_like(flat)
    _lib.mmk_derivative(flat, out, flat.shape[0], flat.shape[1], max_lag)
    return out.reshape(y.shape)


def pwdk_cosine(X: np.ndarray, k: int) -> np.ndarray:
    X = np.ascontiguousarray(X, np.float64)
    T = X.shape[0]
    out = np.zeros((T, 2 * k - 1), np.float64)
    _lib.mmk_pwdk_cosine(X, out, T, X.shape[1], k)
    return out


def convolve_diagonals(diagonals: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    diagonals = np.ascontiguousarray(diagonals, np.float64)
    kernel = np.ascontiguousarray(kernel, np.float64)
    T, K = diagonals.shape[0], kernel.shape[0]
    out = np.zeros(T - K + 1, np.float64)
    _lib.mmk_convolve_diagonals(diagonals, kernel, out, T, K)
    return out


def attack_decay(y: np.ndarray):
    y = np.ascontiguousarray(y, np.float32)
    T = y.shape[0]
    att = np.zeros(T, np.int64)
    dec = np.zeros(T, np.int64)
    n = _lib.mmk_attack_decay(y, T, att, dec)
    return att[:n].copy(), dec[:n].copy()


def left_right_scores(fine_env, cuts, coarse_env, half_window):
    fine_env = np.ascontiguousarray(fine_env, np.float32)
    coarse_env = np.ascontiguousarray(coarse_env, np.float32)
    cuts = np.ascontiguousarray(cuts, np.int64)
    half_window = np.ascontiguousarray(half_window, np.int64)
    n = cuts.shape[0]
    left = np.zeros(n, np.float32)
    right = np.zeros(n, np.float32)
    _lib.mmk_left_right_scores(
        fine_env, cuts, coarse_env, half_window, coarse_env.shape[0], n,
        left, right,
    )
    return left, right


def refine_cuts(z_crossings, coarse_cuts, coarse_peaks, sides, envs, grads):
    z = np.ascontiguousarray(z_crossings, np.uint8)
    cc = np.ascontiguousarray(coarse_cuts, np.int64)
    cp = np.ascontiguousarray(coarse_peaks, np.int64)
    sd = np.ascontiguousarray(sides, np.int64)
    envs = np.ascontiguousarray(envs, np.float32)
    grads = np.ascontiguousarray(grads, np.float32)
    out = np.zeros_like(cc)
    _lib.mmk_refine_cuts(
        z, cc, cp, sd, envs, grads, envs.shape[0], z.shape[0], cc.shape[0], out
    )
    return out
