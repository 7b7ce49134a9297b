"""Novelty-based segmentation from the recurrence matrix.

Rebuild of ``/root/reference/mimikit/extract/segment.py``: banded cosine
recurrence (native C++ kernel, numpy fallback) -> checkerboard-kernel novelty
convolution -> globally-sorted peak picking.
"""
from __future__ import annotations

from typing import List

from functools import lru_cache

import numpy as np

__all__ = [
    "pwdk_cosine",
    "convolve_diagonals",
    "checker",
    "discontinuity_scores",
    "discontinuity_scores_jax",
    "pick_globally_sorted_maxes",
    "peak_pick",
    "from_recurrence_matrix",
    "CutsFromRecurrenceMatrix",
    "optimal_path",
    "dtw",
]


def _native():
    try:
        from ..ops import native

        return native
    except Exception:
        return None


def pwdk_cosine(X: np.ndarray, k: int) -> np.ndarray:
    """(T, D) -> (T, 2k-1) banded cosine distances (halfwidth k-1)."""
    nat = _native()
    if nat is not None:
        return nat.pwdk_cosine(X, k)
    T = X.shape[0]
    out = np.zeros((T, 2 * k - 1))
    norms = np.linalg.norm(X, axis=1)
    for off in range(-(k - 1), k):
        if off == 0:
            continue
        if off > 0:
            a, b = X[:-off], X[off:]
            na, nb = norms[:-off], norms[off:]
            rows = np.arange(T - off)
        else:
            a, b = X[-off:], X[:off]
            na, nb = norms[-off:], norms[:off]
            rows = np.arange(-off, T)
        denom = na * nb
        d = np.where(denom == 0, 1.0, 1.0 - (a * b).sum(axis=1) / np.where(denom == 0, 1, denom))
        out[rows, (k - 1) + off] = d
    return out


def convolve_diagonals(diagonals: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    nat = _native()
    if nat is not None:
        return nat.convolve_diagonals(diagonals, kernel)
    K = kernel.shape[0]
    N = diagonals.shape[0] - K + 1
    out = np.zeros(N)
    for i in range(N):
        s = 0.0
        for j in range(K):
            s += diagonals[i + j, K - j - 1 : 2 * K - j - 1] @ kernel[j]
        out[i] = s
    return out


def checker(N: int, normalize: bool = True) -> np.ndarray:
    """Checkerboard novelty kernel (reference ``segment.py:92-107``)."""
    k = np.arange(-N, N + 1)
    block = (-np.sign(k)[:, None] * np.sign(k)[None, :]).astype(np.float64)
    if normalize:
        block = block / np.abs(block).sum()
    return block


def discontinuity_scores(X: np.ndarray, kernel_sizes: List[int]) -> np.ndarray:
    kernel_sizes = [(k * 2) + 1 for k in kernel_sizes]
    max_kernel = max(kernel_sizes)
    X = np.ascontiguousarray(X, dtype=np.float64)
    N = X.shape[0]
    scores = np.zeros((len(kernel_sizes), N))
    diagonals = pwdk_cosine(X, max_kernel)
    for i, k in enumerate(kernel_sizes):
        kd2 = k // 2
        if k < max_kernel:
            extra = max_kernel - k
            dk = diagonals[:, extra:-extra]
        else:
            dk = diagonals.copy()
        dk = np.pad(dk, ((kd2, kd2), (0, 0)))
        kernel = checker(kd2, normalize=True)
        scr = convolve_diagonals(dk, kernel)
        scores[i, : len(scr)] = scr - scr.min()
    return scores


def _localmax(x: np.ndarray) -> np.ndarray:
    """librosa.util.localmax equivalent: strictly greater than the previous
    sample, >= the next."""
    out = np.zeros_like(x, dtype=bool)
    out[1:-1] = (x[1:-1] > x[:-2]) & (x[1:-1] >= x[2:])
    out[-1] = x[-1] > x[-2] if x.shape[0] > 1 else True
    return out


def peak_pick(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
    """librosa.util.peak_pick equivalent (sliding max/avg + wait)."""
    from scipy.ndimage import maximum_filter1d, uniform_filter1d

    pre_max, post_max = int(pre_max), int(post_max)
    pre_avg, post_avg = int(pre_avg), int(post_avg)
    mov_max = maximum_filter1d(
        x, pre_max + post_max + 1, origin=(post_max - pre_max) // 2 * -1
        if False
        else 0,
        mode="nearest",
    )
    mov_avg = uniform_filter1d(
        x, max(1, pre_avg + post_avg + 1), mode="nearest"
    )
    peaks = []
    last = -np.inf
    for i in range(x.shape[0]):
        if x[i] < mov_max[i]:
            continue
        if x[i] < mov_avg[i] + delta:
            continue
        if peaks and i - peaks[-1] < wait:
            continue
        peaks.append(i)
    return np.asarray(peaks, dtype=int)


def pick_globally_sorted_maxes(x, wait_before, wait_after, min_strength=0.02):
    from scipy.ndimage import minimum_filter1d

    mn = minimum_filter1d(
        x, wait_before + wait_after, mode="constant", cval=x.min()
    )
    glob_rg = x.max() - x.min()
    strength = (x - mn) / max(glob_rg, 1e-12)
    mx = _localmax(x) & (strength >= min_strength)
    mx_indices = mx.nonzero()[0][np.argsort(-x[mx])]
    final_maxes = np.zeros_like(x, dtype=bool)
    for m in mx_indices:
        i, j = max(0, m - wait_before), min(x.shape[0], m + wait_after)
        if np.any(final_maxes[i:j]):
            continue
        mu_l = x[i:m].mean() if m > i else -np.inf
        mu_r = x[m:j].mean() if j > m else -np.inf
        if x[m] > mu_l and x[m] > mu_r:
            final_maxes[m] = True
    return final_maxes.nonzero()[0]


def from_recurrence_matrix(X, kernel_sizes=(6,), min_dur=4, min_strength=0.03):
    N = X.shape[0]
    diagonals = discontinuity_scores(X, list(kernel_sizes))
    dg = diagonals.mean(axis=0)
    mx2 = peak_pick(
        dg, min_dur // 2, min_dur // 2, min_dur // 2, min_dur // 2, 0.0, min_dur
    )
    mx = pick_globally_sorted_maxes(dg, min_dur, min_dur, min_strength)
    mx = mx[(mx > min_dur) & (mx < (N - min_dur))]
    return mx, mx2, diagonals


class CutsFromRecurrenceMatrix:
    def __init__(
        self,
        kernel_size: int = 6,
        factors: List[float] = (1.0,),
        min_dur: int = 4,
        min_strength: float = 0.03,
    ):
        self.kernel_sizes = [int(f * kernel_size) for f in factors]
        self.min_dur = min_dur
        self.min_strength = min_strength

    def __call__(self, X):
        self.mx, self.mx2, self.diagonals = from_recurrence_matrix(
            X, self.kernel_sizes, self.min_dur, self.min_strength
        )
        return self.mx

    def plot_diagonals(self):
        import matplotlib.pyplot as plt

        dg = self.diagonals.mean(axis=0)
        plt.figure(figsize=(max(4, dg.size // 500), 10))
        for k, d in zip(self.kernel_sizes, self.diagonals):
            plt.plot(d, label=f"kernel_size={k}", linestyle="--", alpha=0.75)
        plt.plot(dg, label="mean diagonal")
        plt.vlines(
            self.mx, dg.min(), dg.max(), linestyles="-", alpha=0.5,
            colors="green",
        )
        plt.legend()
        plt.show()


# -- subsequence DTW (librosa.sequence.dtw replacement) ----------------------

def dtw(C: np.ndarray, subseq: bool = False):
    """Dynamic time warping over a cost matrix; returns (D, path).

    ``subseq=True`` allows the match to start/end anywhere along the second
    axis (librosa's subsequence mode used by NearestNextNeighbor).
    """
    N, M = C.shape
    D = np.full((N + 1, M + 1), np.inf)
    if subseq:
        D[0, :] = 0.0
    else:
        D[0, 0] = 0.0
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            D[i, j] = C[i - 1, j - 1] + min(
                D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
            )
    # backtrack from the best end position
    j = int(np.argmin(D[N])) if subseq else M
    i = N
    path = [(i - 1, j - 1)]
    while i > 1 or (not subseq and j > 1):
        moves = [
            (D[i - 1, j - 1], i - 1, j - 1),
            (D[i - 1, j], i - 1, j),
            (D[i, j - 1], i, j - 1),
        ]
        _, i, j = min(moves)
        if i == 0 or j == 0:
            break
        path.append((i - 1, j - 1))
    return D[1:, 1:], np.asarray(path[::-1])


def optimal_path(x, y):
    from sklearn.metrics import pairwise_distances as pwd

    C = pwd(np.abs(x), np.abs(y), metric="cosine")
    return dtw(C, subseq=True)[1]


@lru_cache(maxsize=None)
def _disc_scores_jit(N: int, D: int, kernel_sizes: tuple):
    import jax
    import jax.numpy as jnp

    ks = [(k * 2) + 1 for k in kernel_sizes]
    max_kernel = max(ks)

    def banded_cosine(X, k):
        norms = jnp.linalg.norm(X, axis=1, keepdims=True)
        Xn = jnp.where(norms == 0, 0.0, X / jnp.where(norms == 0, 1.0, norms))
        S = Xn @ Xn.T  # (N, N) — one MXU matmul instead of a banded loop
        Dm = 1.0 - S
        offs = jnp.arange(-(k - 1), k)
        rows = jnp.arange(N)[:, None]
        cols = rows + offs[None, :]
        valid = (cols >= 0) & (cols < N) & (offs[None, :] != 0)
        band = jnp.where(valid, Dm[rows, jnp.clip(cols, 0, N - 1)], 0.0)
        return band  # (N, 2k-1)

    def convolve(band, kernel):
        K = kernel.shape[0]
        n_out = band.shape[0] - K + 1
        out = jnp.zeros(n_out)
        for j in range(K):
            rows = band[j : j + n_out, K - j - 1 : 2 * K - j - 1]
            out = out + rows @ kernel[j]
        return out

    @jax.jit
    def run(X):
        band_full = banded_cosine(X.astype(jnp.float32), max_kernel)
        scores = []
        for k in ks:
            kd2 = k // 2
            extra = max_kernel - k
            bk = band_full[:, extra : band_full.shape[1] - extra] if extra else band_full
            bk = jnp.pad(bk, ((kd2, kd2), (0, 0)))
            kern = jnp.asarray(checker(kd2, normalize=True))
            scr = convolve(bk, kern)
            scr = scr - scr.min()
            scores.append(jnp.pad(scr, (0, N - scr.shape[0])))
        return jnp.stack(scores)

    return run


def discontinuity_scores_jax(X, kernel_sizes: List[int]):
    """On-device ``discontinuity_scores``: the banded cosine recurrence is
    computed as one dense (N, N) matmul on the MXU, then checker-kernel
    correlated — the whole pipeline is a single jitted dispatch."""
    X = np.asarray(X) if not hasattr(X, "devices") else X
    return _disc_scores_jit(X.shape[0], X.shape[1], tuple(kernel_sizes))(X)
