"""Core DSP primitives: STFT / ISTFT / Griffin-Lim / mel, numpy + JAX.

The reference delegates these to librosa / torchaudio
(``/root/reference/mimikit/features/functionals.py:450-646``).  librosa is not
a dependency here; instead the exact framing/windowing conventions are
implemented from scratch, once, parameterized over the array namespace so the
same code runs as a numpy reference path (used at extraction time and as the
test oracle) and as a jit-compiled JAX path (used on TPU).

Conventions (librosa-compatible, pinned by ``tests/test_fft_alignment.py``):

* window: periodic ("fftbins") hann of length ``n_fft``;
* ``center=True`` pads ``n_fft // 2`` on both sides with ``pad_mode``;
* ``n_frames = 1 + (n_padded - n_fft) // hop``;
* istft overlap-adds ``window * irfft(frame)`` and divides by the summed
  squared window, then trims ``n_fft // 2`` per side when centered.

Spectrogram layout throughout the package is **(time, freq)** — the transpose
of librosa's layout — matching the reference's post-transpose convention.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

__all__ = [
    "hann_window",
    "frame_count",
    "stft_np",
    "istft_np",
    "griffinlim_np",
    "stft_jax",
    "istft_jax",
    "griffinlim_jax",
    "mel_filterbank",
    "dct_matrix",
    "resample_np",
    "mu_compress",
    "mu_expand",
    "phase_vocoder",
    "phase_vocoder_jax",
    "time_stretch_np",
    "time_stretch_jax",
]


# ---------------------------------------------------------------------------
# windows & shapes
# ---------------------------------------------------------------------------

def hann_window(n_fft: int, dtype=np.float32) -> np.ndarray:
    """Periodic hann window (what librosa/torch use for STFT)."""
    n = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(dtype)


def get_window(window: Optional[str], n_fft: int, dtype=np.float32) -> np.ndarray:
    if window is None or window == 1.0:
        return np.ones(n_fft, dtype=dtype)
    if window == "hann":
        return hann_window(n_fft, dtype)
    if window == "hamming":
        n = np.arange(n_fft)
        return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / n_fft)).astype(dtype)
    if window == "blackman":
        n = np.arange(n_fft)
        w = (
            0.42
            - 0.5 * np.cos(2.0 * np.pi * n / n_fft)
            + 0.08 * np.cos(4.0 * np.pi * n / n_fft)
        )
        return w.astype(dtype)
    raise ValueError(f"unknown window '{window}'")


def frame_count(n_samples: int, n_fft: int, hop: int, center: bool) -> int:
    n = n_samples + 2 * (n_fft // 2) * int(center)
    if n < n_fft:
        return 0
    return 1 + (n - n_fft) // hop


def expected_signal_length(n_frames: int, n_fft: int, hop: int, center: bool) -> int:
    n = n_fft + hop * (n_frames - 1)
    if center:
        n -= 2 * (n_fft // 2)
    return n


# ---------------------------------------------------------------------------
# shared implementation (runs under numpy or jax.numpy)
# ---------------------------------------------------------------------------

def _pad_centered(xp, y, n_fft: int, pad_mode: str):
    p = n_fft // 2
    pad_width = [(0, 0)] * (y.ndim - 1) + [(p, p)]
    if pad_mode == "constant":
        return xp.pad(y, pad_width, mode="constant")
    return xp.pad(y, pad_width, mode=pad_mode)


def _frame(xp, y, n_fft: int, hop: int):
    """(..., n) -> (..., n_frames, n_fft) via strided window extraction."""
    n = y.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    if xp is not np:
        # TPU path: a (n_frames, n_fft) gather lowers to a slow generic
        # gather on TPU.  Frame via hop-sized rows + k contiguous slices
        # instead — pure reshapes/slices, which XLA fuses for free.
        k = -(-n_fft // hop)  # ceil
        rows_needed = n_frames + k - 1
        pad_to = rows_needed * hop
        if pad_to > n:
            pad_width = [(0, 0)] * (y.ndim - 1) + [(0, pad_to - n)]
            y = xp.pad(y, pad_width, mode="constant")
        y_rows = y[..., :pad_to].reshape(*y.shape[:-1], rows_needed, hop)
        wide = xp.concatenate(
            [y_rows[..., s : s + n_frames, :] for s in range(k)], axis=-1
        )  # (..., n_frames, k*hop)
        return wide[..., :n_fft]
    idx = (
        np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    )  # (n_frames, n_fft) — static, built host-side
    return xp.take(y, xp.asarray(idx), axis=-1)


def _stft_impl(xp, y, n_fft, hop, center, window, pad_mode):
    w = xp.asarray(get_window(window, n_fft))
    if center:
        y = _pad_centered(xp, y, n_fft, pad_mode)
    frames = _frame(xp, y, n_fft, hop)  # (..., T, n_fft)
    return xp.fft.rfft(frames * w, axis=-1)  # (..., T, 1 + n_fft//2)


def _istft_impl(xp, S, n_fft, hop, center, window, length=None):
    """S: (..., T, 1 + n_fft//2) -> (..., n_samples).

    Works in the real dtype matching S (float64 for complex128 input) so the
    numpy path keeps full precision for the alignment round-trip tests.
    """
    real_dtype = xp.zeros(0, dtype=S.dtype).real.dtype
    w = xp.asarray(get_window(window, n_fft)).astype(real_dtype)
    frames = xp.fft.irfft(S, n=n_fft, axis=-1).astype(real_dtype) * w  # (..., T, n_fft)
    n_frames = S.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)

    if xp is np:
        # overlap-add via scatter-add on a static index map
        idx = (
            np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
        ).reshape(-1)
        flat = frames.reshape(*frames.shape[:-2], n_frames * n_fft)
        out = np.zeros((*frames.shape[:-2], out_len), dtype=real_dtype)
        np.add.at(out, (..., idx), flat)
        wss = np.zeros(out_len, dtype=real_dtype)
        np.add.at(wss, idx, np.tile(w * w, n_frames))
    else:
        # TPU path: scatter-add serializes on TPU (and GLA runs this 33x per
        # call).  Overlap-add densely instead: split each frame into k
        # hop-sized segments; segment s of frame j lands at row j+s of a
        # (n_frames + k - 1, hop) row grid, so the whole OLA is k shifted
        # pads summed together — all fusable elementwise work.
        k = -(-n_fft // hop)  # ceil
        if k * hop > n_fft:
            pad_width = [(0, 0)] * (frames.ndim - 1) + [(0, k * hop - n_fft)]
            frames = xp.pad(frames, pad_width, mode="constant")
        segs = frames.reshape(*frames.shape[:-1], k, hop)  # (..., T, k, hop)
        rows_total = n_frames + k - 1
        lead = [(0, 0)] * (frames.ndim - 2)
        out_rows = sum(
            xp.pad(
                segs[..., s, :], lead + [(s, k - 1 - s), (0, 0)], mode="constant"
            )
            for s in range(k)
        )  # (..., rows_total, hop)
        out = out_rows.reshape(*frames.shape[:-2], rows_total * hop)[..., :out_len]
        # squared-window overlap is static — build it host-side, embed as
        # a constant instead of a second in-graph scatter
        idx = (
            np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
        ).reshape(-1)
        w_np = get_window(window, n_fft).astype(np.dtype(str(real_dtype)))
        wss_np = np.zeros(out_len, dtype=np.dtype(str(real_dtype)))
        np.add.at(wss_np, idx, np.tile(w_np * w_np, n_frames))
        wss = xp.asarray(wss_np)
    # normalize by squared-window overlap where non-zero (threshold at the
    # dtype's tiny, like librosa — edge samples with minuscule but non-zero
    # window coverage must still be recovered exactly)
    tiny = np.finfo(np.dtype(str(real_dtype))).tiny
    wss_safe = xp.where(wss > tiny, wss, 1.0)
    out = out / wss_safe
    if center:
        p = n_fft // 2
        out = out[..., p : out_len - p]
    if length is not None:
        out = out[..., :length]
    return out


def _griffinlim_impl(xp, mag, n_fft, hop, center, window, n_iter, momentum, init_phase):
    """mag: (..., T, F) magnitude -> (..., n_samples) via Griffin-Lim with
    momentum (Perraudin et al.), matching librosa's update rule."""
    angles = xp.exp(1j * init_phase)
    t_prev = None
    eps = 1e-16
    for _ in range(n_iter):
        full = mag * angles
        inv = _istft_impl(xp, full, n_fft, hop, center, window)
        rebuilt = _stft_impl(xp, inv, n_fft, hop, center, window, "constant")
        if t_prev is not None:
            rebuilt = rebuilt - (momentum / (1 + momentum)) * t_prev
        t_prev = mag * angles  # previous projection
        angles = rebuilt / (xp.abs(rebuilt) + eps)
    return _istft_impl(xp, mag * angles, n_fft, hop, center, window)


# ---------------------------------------------------------------------------
# numpy entry points (reference path)
# ---------------------------------------------------------------------------

def stft_np(y, n_fft=2048, hop=512, center=True, window="hann", pad_mode="constant"):
    """(..., n) float -> (..., T, F) complex, time-major layout.

    Precision follows the input dtype (float64 in -> complex128 out), like
    librosa."""
    y = np.asarray(y)
    S = _stft_impl(np, y, n_fft, hop, center, window, pad_mode)
    if y.dtype == np.float32:
        return S.astype(np.complex64)
    return S


def istft_np(S, n_fft=2048, hop=512, center=True, window="hann", length=None):
    return _istft_impl(np, np.asarray(S), n_fft, hop, center, window, length)


def griffinlim_np(
    mag, n_fft=2048, hop=512, center=True, window="hann", n_iter=32,
    momentum=0.99, seed=0,
):
    rng = np.random.RandomState(seed)
    phase = (rng.rand(*mag.shape) * 2 * np.pi - np.pi).astype(np.float32)
    return _griffinlim_impl(
        np, np.asarray(mag), n_fft, hop, center, window, n_iter, momentum, phase
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# JAX entry points (device path; jitted on first use)
# ---------------------------------------------------------------------------

def _jnp():
    import jax.numpy as jnp

    return jnp


@lru_cache(maxsize=None)
def _stft_jax_jit(n_fft, hop, center, window, pad_mode):
    import jax
    import jax.numpy as jnp

    def f(y):
        return _stft_impl(jnp, y, n_fft, hop, center, window, pad_mode)

    return jax.jit(f)


def stft_jax(y, n_fft=2048, hop=512, center=True, window="hann", pad_mode="constant"):
    return _stft_jax_jit(n_fft, hop, center, window, pad_mode)(y)


@lru_cache(maxsize=None)
def _istft_jax_jit(n_fft, hop, center, window):
    import jax
    import jax.numpy as jnp

    def f(S):
        return _istft_impl(jnp, S, n_fft, hop, center, window)

    return jax.jit(f)


def istft_jax(S, n_fft=2048, hop=512, center=True, window="hann"):
    return _istft_jax_jit(n_fft, hop, center, window)(S)


@lru_cache(maxsize=None)
def _griffinlim_jax_jit(n_fft, hop, center, window, n_iter, momentum):
    import jax
    import jax.numpy as jnp

    def f(mag, phase):
        return _griffinlim_impl(
            jnp, mag, n_fft, hop, center, window, n_iter, momentum, phase
        )

    return jax.jit(f)


def griffinlim_jax(
    mag, n_fft=2048, hop=512, center=True, window="hann", n_iter=32,
    momentum=0.99, seed=0,
):
    import jax

    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(
        key, mag.shape, minval=-np.pi, maxval=np.pi, dtype=np.float32
    )
    return _griffinlim_jax_jit(n_fft, hop, center, window, n_iter, momentum)(
        mag, phase
    )


# ---------------------------------------------------------------------------
# mel / mfcc helpers
# ---------------------------------------------------------------------------

def _hz_to_mel(f, htk=False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m, htk=False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1 + n_fft//2)."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    # slaney normalization: equal energy per channel
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def dct_matrix(n_out: int, n_in: int, norm: Optional[str] = "ortho") -> np.ndarray:
    """DCT-II basis, shape (n_out, n_in): mfcc = basis @ log_mel."""
    n = np.arange(n_in)
    k = np.arange(n_out)[:, None]
    basis = 2.0 * np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    if norm == "ortho":
        basis[0] *= np.sqrt(1.0 / (4 * n_in))
        basis[1:] *= np.sqrt(1.0 / (2 * n_in))
    return basis.astype(np.float32)


# ---------------------------------------------------------------------------
# resampling & mu-law
# ---------------------------------------------------------------------------

def resample_np(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (scipy), kaiser-windowed — the CPU quality path."""
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    if up == down:
        return np.asarray(y)
    return resample_poly(np.asarray(y, dtype=np.float32), up, down, axis=-1).astype(
        np.float32
    )


def mu_compress(x, q_levels: int = 256, compression: float = 1.0, xp=np):
    """Centered mu-law companding + quantization to int class indices.

    Matches the reference's deliberately-centered variant
    (``functionals.py:322-328``), not librosa's.
    """
    mu = q_levels - 1.0
    x_mu = (
        xp.sign(x)
        * xp.log1p(mu * xp.abs(x) * compression)
        / np.log1p(mu * compression)
    )
    return ((x_mu + 1) / 2 * mu + 0.5).astype(xp.int64 if xp is np else "int32")


def mu_expand(x, q_levels: int = 256, compression: float = 1.0, xp=np):
    mu = q_levels - 1.0
    y = (x / mu) * 2 - 1.0
    return (
        xp.sign(y)
        * (xp.exp(xp.abs(y) * np.log1p(mu * compression)) - 1.0)
        / (mu * compression)
    )


def phase_vocoder(S: "np.ndarray", rate: float, hop: int) -> "np.ndarray":
    """Time-stretch a (frames, bins) complex STFT by ``rate`` (librosa's
    phase-vocoder recurrence: magnitudes linearly interpolated between
    frames, phases advanced by the accumulated instantaneous frequency).

    rate > 1 speeds up (fewer frames), rate < 1 slows down.
    """
    n_fft = 2 * (S.shape[-1] - 1)
    time_steps = np.arange(0, S.shape[0], rate)
    # expected per-hop phase advance per bin: 2*pi*hop*k/n_fft
    phi_advance = 2 * np.pi * hop * np.arange(S.shape[-1]) / n_fft

    S_pad = np.concatenate([S, np.zeros((2, S.shape[-1]), S.dtype)], axis=0)
    out = np.zeros((len(time_steps), S.shape[-1]), dtype=S.dtype)
    phase_acc = np.angle(S[0])
    for i, step in enumerate(time_steps):
        lo = int(np.floor(step))
        frac = step - lo
        a, b = S_pad[lo], S_pad[lo + 1]
        mag = (1.0 - frac) * np.abs(a) + frac * np.abs(b)
        out[i] = mag * np.exp(1j * phase_acc)
        dphase = np.angle(b) - np.angle(a) - phi_advance
        dphase -= 2.0 * np.pi * np.round(dphase / (2.0 * np.pi))
        phase_acc = phase_acc + phi_advance + dphase
    return out


def time_stretch_np(
    y: "np.ndarray", rate: float, n_fft: int = 2048, hop: int = 512
) -> "np.ndarray":
    """Phase-vocoder time stretch of a 1-D signal: len(out) ~= len(y)/rate."""
    S = stft_np(y.astype(np.float32), n_fft, hop, True, "hann")
    S2 = phase_vocoder(S, rate, hop)
    out = istft_np(S2, n_fft, hop, True, "hann")
    n_out = int(round(len(y) / rate))
    if len(out) < n_out:
        out = np.pad(out, (0, n_out - len(out)))
    return out[:n_out].astype(np.float32)


@lru_cache(maxsize=None)
def _pv_jit(rate: float, hop: int, n_frames: int, n_bins: int):
    import jax
    import jax.numpy as jnp

    n_fft = 2 * (n_bins - 1)
    time_steps = np.arange(0, n_frames, rate)
    phi_advance = jnp.asarray(2 * np.pi * hop * np.arange(n_bins) / n_fft)

    @jax.jit
    def pv(S):
        S_pad = jnp.concatenate(
            [S, jnp.zeros((2, n_bins), S.dtype)], axis=0
        )

        def body(phase_acc, step):
            lo = jnp.floor(step).astype(jnp.int32)
            frac = step - lo
            a = jax.lax.dynamic_index_in_dim(S_pad, lo, axis=0, keepdims=False)
            b = jax.lax.dynamic_index_in_dim(S_pad, lo + 1, axis=0, keepdims=False)
            mag = (1.0 - frac) * jnp.abs(a) + frac * jnp.abs(b)
            out = mag * jnp.exp(1j * phase_acc)
            dphase = jnp.angle(b) - jnp.angle(a) - phi_advance
            dphase -= 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
            return phase_acc + phi_advance + dphase, out

        _, frames = jax.lax.scan(
            body, jnp.angle(S[0]), jnp.asarray(time_steps, jnp.float32)
        )
        return frames

    return pv


def phase_vocoder_jax(S, rate: float, hop: int):
    """jitted phase vocoder over a (frames, bins) complex STFT."""
    return _pv_jit(float(rate), int(hop), S.shape[0], S.shape[-1])(S)


def time_stretch_jax(y, rate: float, n_fft: int = 2048, hop: int = 512):
    import jax.numpy as jnp

    S = stft_jax(y.astype(jnp.float32), n_fft, hop, True, "hann")
    out = istft_jax(phase_vocoder_jax(S, rate, hop), n_fft, hop, True, "hann")
    n_out = int(round(y.shape[-1] / rate))
    if out.shape[-1] < n_out:
        out = jnp.pad(out, (0, n_out - out.shape[-1]))
    return out[:n_out].astype(jnp.float32)


def resample_poly_filter(orig_sr: int, target_sr: int):
    """(up, down, h): the exact FIR scipy.signal.resample_poly builds for
    this rate pair (kaiser beta=5.0, cutoff 1/max_rate, scaled by up) —
    shared by the host path and the device conv so both produce the same
    samples."""
    from math import gcd

    from scipy.signal import firwin

    g = gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    if up == down:
        return up, down, np.ones(1, np.float32)
    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0))
    return up, down, (h * up).astype(np.float32)
