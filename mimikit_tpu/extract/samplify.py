"""Multi-resolution envelope segmentation ("samplify").

Rebuild of ``/root/reference/mimikit/extract/samplify.py``: parallel
envelope+gradient levels, coarse attack filtering via :class:`Periods`,
native-kernel cut refinement and zero-crossing snapping.
"""
from __future__ import annotations

import dataclasses as dtc
from concurrent.futures import ThreadPoolExecutor, as_completed
from typing import Dict, List

import numpy as np

from ..features.functionals import (
    Derivative,
    Envelop,
    Functional,
    Identity,
    Interpolate,
)
from ..loops.callbacks import tqdm

__all__ = ["Samplifyer", "Periods", "attack_decay"]


def _native():
    try:
        from ..ops import native

        return native
    except Exception:
        return None


def attack_decay(y: np.ndarray):
    """Pair upward zero-crossings (attacks) with their following peaks."""
    nat = _native()
    if nat is not None:
        return nat.attack_decay(np.asarray(y, np.float32))
    T = y.shape[-1]
    z_i = ((y[:-1] < 0) & (y[1:] > 0)).nonzero()[0] + 1
    dec_i = np.zeros_like(z_i)
    z_next = np.concatenate((z_i[1:], np.array([T - 1])))
    for n in range(len(z_i)):
        a, b = z_i[n], z_next[n]
        matches = (y[a : b - 1] > 0) & (y[a + 1 : b] < 0)
        dec_i[n] = (matches.nonzero()[0][0] + a) if np.any(matches) else T - 1
    return z_i, dec_i


@dtc.dataclass
class _EnvelopAndGrad:
    """compute an envelope and its gradient at one resolution"""

    n_fft: int
    overlap: int
    grad_max_lag: int
    window: str = "hann"
    interp_mode: str = "quadratic"

    def __post_init__(self):
        self.env_ex = Envelop(
            self.n_fft,
            self.n_fft // self.overlap,
            window=self.window,
            normalize=True,
            interp_to_time_domain=False,
        )
        self.interp = Interpolate(axis=-1, mode=self.interp_mode)
        self.dx = Derivative(self.grad_max_lag, normalize=True)
        self.grad = None
        self.env = None
        self.T = 0

    def fit(self, y):
        self.interp.length = self.T = y.shape[-1]
        self.env = self.env_ex(y)
        self.grad = self.dx(self.env[None, :])[0]
        self.env, self.grad = self.interp(self.env), self.interp(self.grad)
        return self


class Periods:
    """attack-begin / peak indices from a gradient signal"""

    def __init__(self):
        self.att_i = None
        self.dec_i = None

    def fit(self, y):
        self.att_i, self.dec_i = attack_decay(np.asarray(y, np.float32))
        return self


@dtc.dataclass
class Samplifyer(Functional):
    filter_level: int = 0
    sensitivity: float = 0.0
    levels_def: List[Dict] = dtc.field(default_factory=lambda: [{}])

    def __post_init__(self):
        self.y = None
        self.T = None
        if self.filter_level > 4 or self.filter_level < 0:
            raise ValueError("filter_level must be between 0 and 4")
        if self.levels_def and self.levels_def[0]:
            self.levels = [_EnvelopAndGrad(**ldef) for ldef in self.levels_def]
        else:
            self.levels = [
                _EnvelopAndGrad(n_fft=8192, overlap=32, grad_max_lag=9),
                _EnvelopAndGrad(n_fft=4096, overlap=64, grad_max_lag=33),
                _EnvelopAndGrad(n_fft=2048, overlap=32, grad_max_lag=17),
                _EnvelopAndGrad(n_fft=1024, overlap=16, grad_max_lag=9),
                _EnvelopAndGrad(n_fft=512, overlap=8, grad_max_lag=9),
                _EnvelopAndGrad(n_fft=256, overlap=8, grad_max_lag=9),
            ][self.filter_level:]
        self.coarse_env = self.coarse_grad = None
        self.coarse_cuts = self.coarse_peaks = None
        self.scores = self.cuts = self.sides = None
        self.fine_envs = self.windows = None

    def np_func(self, y):
        return self.label(y)

    def label(self, y):
        cuts = self.fit(y).cuts
        labels = np.zeros_like(y, dtype=int)
        labels[cuts] = 1
        return np.cumsum(labels)

    def fit(self, y):
        self.y = y = np.asarray(y, np.float32)
        self.T = y.shape[0]
        pool = ThreadPoolExecutor(max_workers=len(self.levels))
        for _ in tqdm(
            as_completed([pool.submit(d.fit, y) for d in self.levels]),
            total=len(self.levels),
            desc="Fitting levels...",
        ):
            continue

        coarse = self.levels[0]
        self.coarse_env, self.coarse_grad = coarse.env, coarse.grad

        # filter attacks at the coarse level by envelope rise above sensitivity
        per = Periods().fit(self.coarse_grad)
        scores = self.coarse_env[per.dec_i] - self.coarse_env[per.att_i]
        mask = scores > self.sensitivity
        self.scores = scores[mask]
        self.coarse_cuts = per.att_i[mask]
        self.coarse_peaks = per.dec_i[mask]

        fine_envs = np.stack([lvl.env for lvl in self.levels[1:]]).astype(np.float32)
        fine_grads = np.stack([lvl.grad for lvl in self.levels[1:]]).astype(np.float32)
        self.fine_envs = fine_envs
        self.windows = half_window = np.minimum(
            self.coarse_peaks - self.coarse_cuts, 2000
        )

        nat = _native()
        if nat is not None:
            left, right = nat.left_right_scores(
                fine_envs[-1], self.coarse_cuts,
                np.asarray(self.coarse_env, np.float32), half_window,
            )
        else:
            left = np.zeros(len(self.coarse_cuts), np.float32)
            right = np.zeros(len(self.coarse_cuts), np.float32)
            for i, (c, w) in enumerate(zip(self.coarse_cuts, half_window)):
                lo = max(c - w, 0)
                env = fine_envs[-1]
                left[i] = (
                    (self.coarse_env[lo:c] - env[lo:c]).max() if c > lo else 0.0
                )
                right[i] = (
                    (self.coarse_env[c : c + w] - env[c : c + w]).max()
                    if w > 0
                    else 0.0
                )
        self.sides = sides = np.stack((left, right)).argmax(axis=0)

        z_crossings = np.zeros(self.T, bool)
        z_crossings[1:] = np.sign(y[1:]) != np.sign(y[:-1])
        if nat is not None:
            self.cuts = nat.refine_cuts(
                z_crossings, self.coarse_cuts, self.coarse_peaks, sides,
                fine_envs, fine_grads,
            )
        else:
            self.cuts = self._refine_cuts_np(
                z_crossings, self.coarse_cuts, self.coarse_peaks, sides,
                fine_envs, fine_grads,
            )
        return self

    @staticmethod
    def _refine(start, stop, env, grad):
        if start == stop:
            return start, stop
        e = env[start:stop]
        g = grad[start:stop]
        new_start = int(np.argmin(0.9 * e + 0.1 * (1 - g)))
        new_start = int(new_start < stop - start - 1) * new_start
        return new_start + start, max(int(e.argmax()) + start, new_start + start)

    def _refine_cuts_np(
        self, z_crossings, coarse_cuts, coarse_peaks, sides, fine_envs, fine_grads
    ):
        cuts = np.zeros_like(coarse_cuts)
        for i, c in enumerate(coarse_cuts):
            d = coarse_peaks[i]
            if sides[i] == 0:
                d, c = c, max(c - (coarse_peaks[i] - c), 0)
            for env, grad in zip(fine_envs, fine_grads):
                c, d = self._refine(c, d, env, grad)
            before, after = c, c + 1
            N = z_crossings.shape[0]
            while (
                before >= 0
                and after < N
                and not z_crossings[before]
                and not z_crossings[after]
            ):
                before -= 1
                after += 1
            cuts[i] = before if before >= 0 and z_crossings[before] else after
        return cuts

    def plot_refined_cuts(self):
        import matplotlib.pyplot as plt

        for c, c_hat, w, side, score in zip(
            self.coarse_cuts, self.cuts, self.windows, self.sides, self.scores
        ):
            left = min(c - w, c_hat - w)
            right = max(c + w, c_hat + w)
            t = slice(int(left), int(right))
            plt.figure()
            plt.plot(self.y[t], label="signal", alpha=0.5)
            plt.plot(self.coarse_env[t], label=f"level {self.filter_level}")
            plt.scatter(c - left, 0, marker="X", color="red", s=200)
            plt.scatter(c_hat - left, 0, marker="X", color="green", s=200)
            plt.legend(loc="upper left")

    def export_with_silence(self, insert_sec=1.0, sr=44100):
        return np.concatenate(
            [np.r_[x, np.zeros(int(sr * insert_sec))] for x in self.export_as_list()]
        )

    def export_as_list(self):
        return np.split(self.y, self.cuts)

    @property
    def inv(self) -> "Functional":
        return Identity()
