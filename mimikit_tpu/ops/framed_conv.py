"""Wide-kernel 1-D convolutions as framed matmuls / FFTs (TPU-first).

XLA lowers most convolutions well, but wide-kernel audio convs are the
exception on this class of backend: gradients of strided/transposed convs
introduce input-dilated convolution configs whose compiles blow up from
seconds to many minutes (measured here: WaveGAN's generator gradient —
ConvTranspose(k=25, s=4) stacks plus a 512-tap smoothing filter — did not
finish compiling in 10 minutes on either XLA:CPU or the TPU backend, while
each *forward* conv alone compiles in seconds).

So these ops re-express the convs in primitives whose derivatives stay in
the same cheap family, the same move `features/dsp.py` made for STFT/ISTFT:

- :func:`framed_conv1d` — frame the signal with the hop-rows trick
  (reshape + ``ceil(k/stride)`` contiguous slices, no gathers) and run ONE
  ``(B*To, k*Cin) @ (k*Cin, Cout)`` MXU matmul.  Backward = pads + the two
  transposed matmuls.
- :func:`fft_conv1d` — stride-1 correlation via ``rfft``/``irfft`` for
  kernels too wide to frame (the 512-tap post-proc filter).  Backward =
  more FFTs.
- :func:`framed_conv_transpose1d` — subpixel decomposition: one small
  framed correlation per output phase (sub-kernels are static slices of
  the weight), phases interleaved by a reshape.  Matches
  ``flax.linen.ConvTranspose(padding='SAME', transpose_kernel=False)``
  exactly (pinned in tests/test_framed_conv.py).

All three match their ``flax.linen`` counterparts to f32 round-off on
forward AND gradients; the flax modules :class:`FramedConv` /
:class:`FramedConvTranspose` are drop-in replacements with identical
parameter names/shapes ("kernel" (k, Cin, Cout), "bias" (Cout,)), so
checkpoints are interchangeable with the nn.Conv spelling.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "frame_signal",
    "framed_conv1d",
    "fft_conv1d",
    "framed_conv_transpose1d",
    "FramedConv",
    "FramedConvTranspose",
]


def frame_signal(x: jax.Array, k: int, stride: int, pad_l: int, pad_r: int):
    """(B, T, C) -> (B, To, k*C) sliding windows, gather-free.

    ``out[b, t] = x_pad[b, t*stride : t*stride + k, :].reshape(-1)``
    (time-major, channels fastest) — exactly the layout that lets a
    ``(k, Cin, Cout)`` kernel be used as one ``(k*Cin, Cout)`` matmul.
    Built from a hop-rows reshape plus ``ceil(k/stride)`` contiguous
    slices, so both the op and its transpose (the gradient) are cheap.
    """
    B, T, C = x.shape
    s = stride
    T_pad = T + pad_l + pad_r
    To = (T_pad - k) // s + 1
    k_rows = -(-k // s)  # ceil: rows covering one frame
    rows_needed = (To - 1) + k_rows
    extra = rows_needed * s - T_pad
    x_pad = jnp.pad(x, ((0, 0), (pad_l, pad_r + max(extra, 0)), (0, 0)))
    if extra < 0:
        x_pad = x_pad[:, : rows_needed * s, :]
    xr = x_pad.reshape(B, rows_needed, s * C)
    windows = jnp.concatenate(
        [xr[:, i : i + To, :] for i in range(k_rows)], axis=-1
    )  # (B, To, k_rows*s*C) — frame t = times [t*s, t*s + k_rows*s)
    return windows[..., : k * C]


def _same_pads(T: int, k: int, s: int) -> Tuple[int, int, int]:
    To = -(-T // s)  # ceil
    pt = max((To - 1) * s + k - T, 0)
    return To, pt // 2, pt - pt // 2


def framed_conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: Union[str, Tuple[int, int]] = "SAME",
):
    """Correlation conv1d (= ``nn.Conv`` semantics) as one framed matmul.

    x (B, T, Cin), w (k, Cin, Cout) -> (B, To, Cout).
    """
    k, Cin, Cout = w.shape
    if padding == "SAME":
        _, pad_l, pad_r = _same_pads(x.shape[1], k, stride)
    elif padding == "VALID":
        pad_l = pad_r = 0
    else:
        pad_l, pad_r = padding
    frames = frame_signal(x, k, stride, pad_l, pad_r)
    y = jnp.einsum(
        "btk,kf->btf",
        frames,
        w.reshape(k * Cin, Cout),
        preferred_element_type=jnp.float32,
    )
    return y if b is None else y + b


def fft_conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: Union[str, Tuple[int, int]] = "SAME",
):
    """Correlation conv1d via rfft — for kernels too wide to frame.

    Same contract as :func:`framed_conv1d`; the whole stride-1 correlation
    runs at the FFT size's n·log n cost and its gradient is again FFTs.
    ``stride > 1`` computes the full correlation and subsamples (the FFT
    already paid for every position).
    """
    B, T, Cin = x.shape
    k, _, Cout = w.shape
    if padding == "SAME":
        To, pad_l, pad_r = _same_pads(T, k, stride)
    elif padding == "VALID":
        pad_l = pad_r = 0
        To = (T - k) // stride + 1
    else:
        pad_l, pad_r = padding
        To = (T + pad_l + pad_r - k) // stride + 1
    T_pad = T + pad_l + pad_r
    n = 1 << int(np.ceil(np.log2(max(T_pad, k, 2))))
    x_pad = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    Xf = jnp.fft.rfft(x_pad, n=n, axis=1)  # (B, F, Cin)
    Wf = jnp.fft.rfft(w, n=n, axis=0)  # (F, Cin, Cout)
    # correlation: IFFT(X · conj(W))[t] = sum_j x[t+j] w[j] (t ≤ n-k: no wrap)
    Yf = jnp.einsum("bfc,fcd->bfd", Xf, jnp.conj(Wf))
    y = jnp.fft.irfft(Yf, n=n, axis=1)[:, : (To - 1) * stride + 1 : stride, :]
    return y if b is None else y + b


def framed_conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
):
    """``nn.ConvTranspose(strides, padding='SAME')`` as per-phase framed
    correlations (subpixel decomposition), output length ``T*stride``.

    flax/lax lower SAME conv-transpose to an input-dilated correlation
    ``y[n] = Σ_j xd[n + j - pad_a] w[j]`` with ``xd`` = x dilated by s and
    ``pad_a = k-1 if s > k-1 else ceil((k+s-2)/2)``.  Writing
    ``n = s·u + p`` collapses the zeros: each output phase p is a plain
    stride-1 correlation of x with the static sub-kernel
    ``w[pad_a - p + s·q]`` over the q where that index is in range —
    ~``ceil(k/s)`` taps.  Phases interleave back with one reshape.
    """
    B, T, Cin = x.shape
    k, _, Cout = w.shape
    s = stride
    if s == 1:
        pad_len = k - 1
        pad_a = 0 if k == 1 else int(np.ceil(pad_len / 2))
        return framed_conv1d(x, w, b, 1, (pad_a, pad_len - pad_a))
    pad_len = k + s - 2
    pad_a = k - 1 if s > k - 1 else int(np.ceil(pad_len / 2))

    # per-phase static tap index sets: j = pad_a - p + s·q ∈ [0, k)
    q_lo = min(-(-(p - pad_a) // s) for p in range(s))
    q_hi = max((k - 1 + p - pad_a) // s for p in range(s))
    n_q = q_hi - q_lo + 1
    # one shared zero-padding covers every phase's q range
    x_pad = jnp.pad(x, ((0, 0), (-q_lo, q_hi), (0, 0)))
    frames = frame_signal(x_pad, n_q, 1, 0, 0)  # (B, T, n_q*Cin)
    zero_row = jnp.zeros((Cin, Cout), w.dtype)
    outs = []
    for p in range(s):
        # pack the phase's taps into an (n_q, Cin, Cout) sub-kernel padded
        # with zero rows so every phase shares the frames above (static
        # row picks lower to slices — no gather/scatter anywhere)
        sub = jnp.stack(
            [
                w[pad_a - p + s * q]
                if 0 <= pad_a - p + s * q < k
                else zero_row
                for q in range(q_lo, q_hi + 1)
            ]
        )
        outs.append(
            jnp.einsum(
                "btk,kf->btf",
                frames,
                sub.reshape(n_q * Cin, Cout),
                preferred_element_type=jnp.float32,
            )
        )
    y = jnp.stack(outs, axis=2).reshape(B, T * s, Cout)
    return y if b is None else y + b


class FramedConv(nn.Module):
    """Drop-in ``nn.Conv`` (1-D, channel-last) over the framed/FFT paths.

    Same parameter names, shapes and default inits as ``nn.Conv``; kernels
    wider than ``fft_threshold`` take the FFT path (graph size of the
    framing is ~``ceil(k/stride)`` slices, fine for 25-tap blocks, not for
    a 512-tap filter).
    """

    features: int
    kernel_size: int
    strides: int = 1
    padding: Union[str, Tuple[int, int]] = "SAME"
    use_bias: bool = True
    fft_threshold: int = 64

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, Cin, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        op = (
            fft_conv1d
            if self.kernel_size > self.fft_threshold
            else framed_conv1d
        )
        return op(x, w, b, self.strides, self.padding)


class FramedConvTranspose(nn.Module):
    """Drop-in ``nn.ConvTranspose`` (1-D, SAME) via subpixel framing."""

    features: int
    kernel_size: int
    strides: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, Cin, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return framed_conv_transpose1d(x, w, b, self.strides)
