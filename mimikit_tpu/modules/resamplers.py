"""Time/feature resampling modules (reference ``mimikit/modules/resamplers.py``).

``LinearResampler`` is the SampleRNN tier upsampler: a Dense layer whose
output is reshaped to trade feature dim for time steps — a single MXU matmul
per tier, exactly how TPU likes it.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["LinearResampler", "Conv1dResampler", "LSTMResampler"]


class LinearResampler(nn.Module):
    in_dim: int
    t_factor: float
    d_factor: float
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        layer = nn.Dense(int(self.in_dim * self.t_factor * self.d_factor))
        if self.weight_norm:
            layer = nn.WeightNorm(layer)
        y = layer(x)
        return y.reshape(B, int(T * self.t_factor), int(D * self.d_factor))


class Conv1dResampler(nn.Module):
    """t_factor <= 1: collapse windows of ``1/t_factor`` steps via a conv;
    t_factor > 1: transposed-conv upsampling."""

    in_dim: int
    t_factor: float
    d_factor: float
    use_bias: bool = True
    weight_norm: bool = False
    ref_scramble: bool = False

    @nn.compact
    def __call__(self, x):
        if x.ndim > 3:
            x = x.reshape(x.shape[0], int(np.prod(x.shape[1:-1])), x.shape[-1])
        out_dim = int(self.in_dim * self.d_factor)
        wn = nn.WeightNorm if self.weight_norm else (lambda m: m)
        if self.t_factor <= 1:
            k = int(1 / self.t_factor)
            B, T, D = x.shape
            # (B, T/k, k, D) -> valid conv over the k window == dense on k*D
            y = x.reshape(B, T // k, k * D)
            y = wn(nn.Dense(out_dim, use_bias=self.use_bias))(y)
            if self.ref_scramble:
                # bug-compat mode for imported reference checkpoints: the
                # reference reshapes (B*n, out) memory as (B, out, n) and
                # transposes (resamplers.py:40-42), permuting time/feature
                # whenever n > 1 — reference JukeBox nets are TRAINED (and
                # generate) through this fixed permutation
                n = T // k
                y = y.reshape(B, n * out_dim).reshape(B, out_dim, n)
                y = jnp.swapaxes(y, 1, 2)
            return y
        k = int(self.t_factor)
        # transposed conv: each step expands to k steps
        y = wn(
            nn.ConvTranspose(
                out_dim, kernel_size=(k,), strides=(k,), use_bias=self.use_bias
            )
        )(x)
        return y


class LSTMResampler(nn.Module):
    in_dim: int
    t_factor: float
    d_factor: float
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, hidden=None):
        from .rnn import LSTMStack

        hidden_size = int(self.in_dim * self.t_factor * self.d_factor)
        y, h = LSTMStack(
            hidden_dim=hidden_size, n_layers=1, bidirectional=self.bidirectional
        )(x, hidden)
        B, T, D = x.shape
        return (
            y.reshape(
                B,
                int(T * self.t_factor),
                int(D * self.d_factor) * (1 + int(self.bidirectional)),
            ),
            h,
        )
