"""Recurrent stacks with explicit carried state.

The reference relies on cuDNN LSTM modules with hidden state stored on the
module (``sample_rnn_v2.py:92-116``).  TPU-native equivalent: stateless
flax cells scanned over time with ``lax.scan`` (XLA compiles one fused loop),
with the carry threaded explicitly — the train loop owns it (TBPTT), the
decode loop scans it one step at a time via :meth:`RNNStack.step`.

Carry layout: tuple over layers; LSTM carries are ``(c, h)`` tuples of
``(B, H)`` arrays, GRU/RNN carries are ``(B, H)`` arrays.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["RNNStack", "LSTMStack", "init_rnn_carry"]


def _make_cell(cell_type: str, hidden_dim: int, name: str):
    if cell_type == "lstm":
        return nn.OptimizedLSTMCell(features=hidden_dim, name=name)
    if cell_type == "gru":
        return nn.GRUCell(features=hidden_dim, name=name)
    if cell_type == "rnn":
        return nn.SimpleCell(features=hidden_dim, name=name)
    raise ValueError(f"unknown rnn cell type '{cell_type}'")


def init_rnn_carry(
    cell_type: str,
    n_layers: int,
    batch_size: int,
    hidden_dim: int,
    init: str = "zeros",
    rng: Optional[jax.Array] = None,
    dtype=jnp.float32,
):
    """Build an initial carry: 'zeros' | 'ones' | 'randn'
    (the reference's ``h0_init``, ``sample_rnn_v2.py:118-119``)."""

    def one(key):
        shape = (batch_size, hidden_dim)
        if init == "zeros":
            return jnp.zeros(shape, dtype)
        if init == "ones":
            return jnp.ones(shape, dtype)
        if init == "randn":
            assert rng is not None, "randn h0 needs an rng"
            return jax.random.normal(key, shape, dtype)
        raise ValueError(init)

    keys = (
        list(jax.random.split(rng, 2 * n_layers))
        if rng is not None
        else [None] * (2 * n_layers)
    )
    carries = []
    for i in range(n_layers):
        if cell_type == "lstm":
            carries.append((one(keys[2 * i]), one(keys[2 * i + 1])))
        else:
            carries.append(one(keys[2 * i]))
    return tuple(carries)


class RNNStack(nn.Module):
    """Stacked LSTM/GRU/RNN over (B, T, D) with explicit carry.

    ``__call__`` runs the whole sequence; ``step`` advances one timestep with
    the same parameters — the decode path's building block.  Parameters are
    created by a single-step trace at init so both paths share them.
    """

    hidden_dim: int
    n_layers: int = 1
    cell_type: str = "lstm"
    dropout: float = 0.0
    weight_norm: bool = False

    def setup(self):
        cells = [
            _make_cell(self.cell_type, self.hidden_dim, f"l{i}")
            for i in range(self.n_layers)
        ]
        if self.weight_norm:
            cells = [nn.WeightNorm(c) for c in cells]
        self.cells = cells

    def default_carry(self, batch_size, dtype=jnp.float32):
        return init_rnn_carry(
            self.cell_type, self.n_layers, batch_size, self.hidden_dim,
            "zeros", dtype=dtype,
        )

    def _use_fused_lstm(self, B: int, T: int) -> bool:
        """Fused whole-sequence Pallas LSTM (ops/pallas_lstm.py) replaces
        the lax.scan on TPU backends for plain (non-weight-norm) LSTM
        stacks; MMK_FUSED_LSTM=1 forces it (interpret mode on CPU — how
        the parity tests run), =0 disables.

        Size gate: the kernel wins when there is enough work to amortize
        its launch (measured on v5e: seq2seq TRAIN B=32 x T=8 — 4.5 vs
        5.0 ms/step fused-vs-scan; seq2seq block-AR DECODE B=1 x T=8 —
        fused 10% slower), so tiny single-stream calls keep the scan
        unless forced."""
        if str(self.cell_type) != "lstm" or self.weight_norm:
            return False
        import os

        from ..ops.pallas_lstm import fused_lstm_enabled

        if not fused_lstm_enabled():
            return False
        if os.environ.get("MMK_FUSED_LSTM") == "1":
            return True
        # auto-routing stays on shapes the kernel's tiling is known-good
        # for: H must slice at lane-tile boundaries (the kernel splits the
        # 4H gate block at multiples of H) and B must fill the 8-row
        # sublane tile — un-jittable Mosaic rejections here would raise
        # out of a user's TRAIN step with no runtime fallback (unlike the
        # decode paths' pallas_generate_or_fallback)
        if self.hidden_dim % 128 != 0 or B < 8:
            return False
        return B * T >= 64

    def step(self, x_t, carry):
        """x_t: (B, D) one timestep; returns (y_t, new_carry)."""
        new_carry = []
        y = x_t
        for i, cell in enumerate(self.cells):
            c, y = cell(carry[i], y)
            new_carry.append(c)
        return y, tuple(new_carry)

    def __call__(self, x, carry=None, train: bool = False):
        B, T, _ = x.shape
        if carry is None:
            carry = self.default_carry(B, x.dtype)
        if self.is_initializing():
            # create cell params with one step; shapes of the full output are
            # known statically so a dummy suffices during init
            _y, _c = self.step(x[:, 0], carry)
            return (
                jnp.zeros((B, T, self.hidden_dim), x.dtype),
                carry,
            )

        if self._use_fused_lstm(B, T):
            # whole-time-loop Pallas kernels with a hand-written backward
            # (ops/pallas_lstm.py): XLA's scan costs ~3-5 us/iteration
            # fwd+bwd in loop overhead alone on this TPU — the fused path
            # is what makes RNN training MXU-bound instead of latency-bound
            from ..ops.pallas_lstm import fused_lstm_layer

            params = self.variables["params"]
            ys = jnp.swapaxes(x, 0, 1)  # (T, B, D)
            new_carry = []
            for i in range(self.n_layers):
                p = params[f"l{i}"]
                Wi = jnp.concatenate(
                    [p[f"i{g}"]["kernel"] for g in "ifgo"], axis=1
                )
                Wh = jnp.concatenate(
                    [p[f"h{g}"]["kernel"] for g in "ifgo"], axis=1
                )
                b = jnp.concatenate([p[f"h{g}"]["bias"] for g in "ifgo"])
                c0, h0 = carry[i]  # flax LSTM carry order: (c, h)
                ys, h_T, c_T = fused_lstm_layer(ys, Wi, Wh, b, h0, c0)
                # the kernel computes (and returns) f32; under a bf16
                # mixed-precision policy the rest of the net must stay in
                # the input dtype or every downstream op re-promotes
                ys = ys.astype(x.dtype)
                new_carry.append((c_T.astype(x.dtype), h_T.astype(x.dtype)))
            final = tuple(new_carry)
            y = jnp.swapaxes(ys, 0, 1)
        else:
            def body(c, x_t):
                y_t, c2 = self.step(x_t, c)
                return c2, y_t

            xs = jnp.swapaxes(x, 0, 1)  # (T, B, D)
            final, ys = jax.lax.scan(body, tuple(carry), xs)
            y = jnp.swapaxes(ys, 0, 1)
        if train and self.dropout > 0:
            # functional dropout (submodules can't be created outside setup)
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout, y.shape
            )
            y = jnp.where(keep, y / (1.0 - self.dropout), 0.0)
        return y, final


class LSTMStack(nn.Module):
    """LSTM stack with optional bidirectionality (concat of directions)."""

    hidden_dim: int
    n_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0

    def setup(self):
        self.fwd = RNNStack(
            self.hidden_dim, self.n_layers, "lstm", self.dropout, name="fwd"
        )
        if self.bidirectional:
            self.bwd = RNNStack(
                self.hidden_dim, self.n_layers, "lstm", self.dropout, name="bwd"
            )

    def __call__(self, x, carry=None, train: bool = False):
        y_f, c_f = self.fwd(x, carry[0] if carry else None, train)
        if not self.bidirectional:
            return y_f, (c_f,)
        y_b, c_b = self.bwd(jnp.flip(x, axis=1), carry[1] if carry else None, train)
        y_b = jnp.flip(y_b, axis=1)
        return jnp.concatenate([y_f, y_b], axis=-1), (c_f, c_b)
