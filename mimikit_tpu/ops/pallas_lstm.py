"""Fused LSTM-over-time Pallas kernels with a custom VJP: the train path.

Why: XLA lowers ``lax.scan`` to a device loop whose per-iteration overhead
on this TPU is ~3-5 us fwd+bwd regardless of formulation (measured in
``benchmarks/exp_lstm_train.py``: hoisting the input projection or
unrolling does not break the floor, because the bound is loop/dispatch
latency, not matmul FLOPs).  SampleRNN's train step runs 384 sequential
tier-LSTM iterations (fwd) + as many in the backward pass, so the scan
floor alone is ~3 ms of its 4.6 ms step (VERDICT r2 weak #1: 6.3% MFU,
bf16 a no-op).  These kernels run the whole time loop INSIDE one Pallas
program per T-block — weights resident in VMEM, the time dimension
pipelined via the Pallas grid (xi/state blocks stream HBM<->VMEM while
the MXU works) — with a hand-written backward kernel wired through
``jax.custom_vjp``.

Semantics match ``flax.linen.OptimizedLSTMCell`` (gate order i|f|g|o,
sigmoid/tanh gating, biases on the hidden projections) — the same
contract the fused decode kernels pin (``ops/pallas_decode.py``).
Reference train forward being the hot loop: SURVEY §3.1
(``/root/reference/mimikit/networks/sample_rnn_v2.py:211-224``).

Layout: time-major ``x (T, B, D)``; the input projection
``xi = x @ Wi + b`` is one big MXU matmul OUTSIDE the kernel; the kernel
carries (h, c) in VMEM scratch across grid steps and stores h, c and the
post-activation gates for the backward pass (recomputation would add a
matmul per backward step; streaming them from HBM rides bandwidth the
step doesn't otherwise use).

Mixed precision: the layer is dtype-polymorphic on its inputs.  With
bfloat16 inputs (the ``param_dtype="bfloat16"`` train policy,
``mimikit_tpu/precision.py``) every HBM stream — xi in; h/c/gates out;
the backward's cotangent/replay streams — is bf16 (HALF the traffic the
f32 roofline in ``benchmarks/bench_train.py`` says binds this step),
while the carry scratch and all in-kernel arithmetic stay f32 (a bf16
carry would compound rounding over hundreds of steps).  Weight-grad
accumulators are f32 in scratch, cast once on the way out.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_lstm_layer", "fused_lstm_enabled"]


def fused_lstm_enabled() -> bool:
    """MMK_FUSED_LSTM: 'auto' (default — on for TPU backends),
    '1' (force, interpret-mode on CPU: how the parity tests run),
    '0' (off)."""
    flag = os.environ.get("MMK_FUSED_LSTM", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() not in ("cpu",)


def _pick_tc(T: int, B: int, H: int) -> int:
    """Largest divisor of T whose streamed blocks (xi in; h/c/gates out;
    double-buffered) stay well inside scoped VMEM."""
    budget = 6 * 2**20
    best = 1
    for tc in range(1, min(T, 64) + 1):
        if T % tc:
            continue
        if tc * B * (10 * H) * 4 * 2 <= budget:
            best = tc
    return best


@functools.lru_cache(maxsize=64)
def _make_fused_calls(T: int, B: int, H: int, interpret: bool, dtype_name: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.dtype(dtype_name)
    f32 = jnp.float32
    Tc = _pick_tc(T, B, H)
    nblk = T // Tc
    H4 = 4 * H

    # -- forward ------------------------------------------------------------
    def fwd_kernel(xi_ref, h0_ref, c0_ref, Wh_ref,
                   h_ref, c_ref, g_ref, h_scr, c_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = h0_ref[:].astype(f32)
            c_scr[:] = c0_ref[:].astype(f32)

        Wh = Wh_ref[:]
        for t in range(Tc):
            g = xi_ref[t].astype(f32) + jnp.dot(
                h_scr[:].astype(dt), Wh, preferred_element_type=f32
            )
            i = jax.nn.sigmoid(g[:, :H])
            f = jax.nn.sigmoid(g[:, H : 2 * H])
            gg = jnp.tanh(g[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(g[:, 3 * H :])
            c2 = f * c_scr[:] + i * gg
            h2 = o * jnp.tanh(c2)
            c_scr[:] = c2
            h_scr[:] = h2
            h_ref[t] = h2.astype(dt)
            c_ref[t] = c2.astype(dt)
            g_ref[t] = jnp.concatenate([i, f, gg, o], axis=1).astype(dt)

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((Tc, B, H4), lambda i: (i, 0, 0)),  # xi
            pl.BlockSpec((B, H), lambda i: (0, 0)),  # h0
            pl.BlockSpec((B, H), lambda i: (0, 0)),  # c0
            pl.BlockSpec((H, H4), lambda i: (0, 0)),  # Wh
        ],
        out_specs=[
            pl.BlockSpec((Tc, B, H), lambda i: (i, 0, 0)),  # h_all
            pl.BlockSpec((Tc, B, H), lambda i: (i, 0, 0)),  # c_all
            pl.BlockSpec((Tc, B, H4), lambda i: (i, 0, 0)),  # gates
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((T, B, H), dt),
            jax.ShapeDtypeStruct((T, B, H4), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), f32),
            pltpu.VMEM((B, H), f32),
        ],
        interpret=interpret,
    )

    # -- backward -----------------------------------------------------------
    # reversed grid: block j processes time block nblk-1-j; within a block
    # the unrolled loop walks t backwards.  Carries dh/dc live in scratch;
    # dWh accumulates in scratch and is written once at the final step.
    rev = lambda j: (nblk - 1 - j, 0, 0)  # noqa: E731

    def bwd_kernel(dh_all_ref, dhT_ref, dcT_ref, g_ref, c_ref,
                   cprev_ref, hprev_ref, Wh_ref,
                   dxi_ref, dWh_ref, dh0_ref, dc0_ref,
                   dh_scr, dc_scr, dWh_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dh_scr[:] = dhT_ref[:].astype(f32)
            dc_scr[:] = dcT_ref[:].astype(f32)
            dWh_scr[:] = jnp.zeros((H, H4), f32)

        Wh = Wh_ref[:]
        for t in range(Tc - 1, -1, -1):
            dh = dh_all_ref[t].astype(f32) + dh_scr[:]
            gate = g_ref[t].astype(f32)
            i = gate[:, :H]
            f = gate[:, H : 2 * H]
            gg = gate[:, 2 * H : 3 * H]
            o = gate[:, 3 * H :]
            tc = jnp.tanh(c_ref[t].astype(f32))
            do = dh * tc
            dc = dc_scr[:] + dh * o * (1.0 - tc * tc)
            di = dc * gg
            dgg = dc * i
            df = dc * cprev_ref[t].astype(f32)
            dg = jnp.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dgg * (1.0 - gg * gg),
                    do * o * (1.0 - o),
                ],
                axis=1,
            )  # (B, 4H) pre-activation grads
            dxi_ref[t] = dg.astype(dt)
            # dh_{t-1} = dg @ Wh^T — contract the 4H dim directly
            dh_scr[:] = jax.lax.dot_general(
                dg.astype(dt), Wh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            dc_scr[:] = dc * f
            # dWh += h_{t-1}^T @ dg — contract the batch dim directly
            dWh_scr[:] += jax.lax.dot_general(
                hprev_ref[t], dg.astype(dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

        @pl.when(pl.program_id(0) == nblk - 1)
        def _():
            dWh_ref[:] = dWh_scr[:].astype(dt)
            dh0_ref[:] = dh_scr[:].astype(dt)
            dc0_ref[:] = dc_scr[:].astype(dt)

    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((Tc, B, H), rev),  # dh_all
            pl.BlockSpec((B, H), lambda j: (0, 0)),  # dh_T
            pl.BlockSpec((B, H), lambda j: (0, 0)),  # dc_T
            pl.BlockSpec((Tc, B, H4), rev),  # gates
            pl.BlockSpec((Tc, B, H), rev),  # c_all
            pl.BlockSpec((Tc, B, H), rev),  # c_prev
            pl.BlockSpec((Tc, B, H), rev),  # h_prev
            pl.BlockSpec((H, H4), lambda j: (0, 0)),  # Wh
        ],
        out_specs=[
            pl.BlockSpec((Tc, B, H4), rev),  # dxi
            pl.BlockSpec((H, H4), lambda j: (0, 0)),  # dWh
            pl.BlockSpec((B, H), lambda j: (0, 0)),  # dh0
            pl.BlockSpec((B, H), lambda j: (0, 0)),  # dc0
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), dt),
            jax.ShapeDtypeStruct((H, H4), dt),
            jax.ShapeDtypeStruct((B, H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), f32),
            pltpu.VMEM((B, H), f32),
            pltpu.VMEM((H, H4), f32),
        ],
        interpret=interpret,
    )

    return fwd_call, bwd_call


@functools.lru_cache(maxsize=64)
def _make_layer(T: int, B: int, D: int, H: int, interpret: bool,
                dtype_name: str):
    fwd_call, bwd_call = _make_fused_calls(T, B, H, interpret, dtype_name)
    dt = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def layer(x, Wi, Wh, b, h0, c0):
        (h_all, _hT, cT), _ = _fwd(x, Wi, Wh, b, h0, c0)
        return h_all, h_all[T - 1], cT

    def _fwd(x, Wi, Wh, b, h0, c0):
        xi = (
            jnp.einsum(
                "tbd,dk->tbk", x, Wi, preferred_element_type=jnp.float32
            )
            + b
        ).astype(dt)
        h_all, c_all, gates = fwd_call(xi, h0, c0, Wh)
        return (
            (h_all, h_all[T - 1], c_all[T - 1]),
            (x, Wi, Wh, h0, c0, h_all, c_all, gates),
        )

    def _bwd(res, cts):
        x, Wi, Wh, h0, c0, h_all, c_all, gates = res
        dh_all, dh_T, dc_T = cts
        dh_all = _materialize(dh_all, (T, B, H), dt)
        dh_T = _materialize(dh_T, (B, H), dt)
        dc_T = _materialize(dc_T, (B, H), dt)
        hprev = jnp.concatenate([h0[None], h_all[:-1]], axis=0)
        cprev = jnp.concatenate([c0[None], c_all[:-1]], axis=0)
        dxi, dWh, dh0, dc0 = bwd_call(
            dh_all, dh_T, dc_T, gates, c_all, cprev, hprev, Wh
        )
        db = dxi.astype(jnp.float32).sum(axis=(0, 1)).astype(dt)
        # default matmul precision: matches flax's Dense (and is ~2x the
        # throughput of HIGHEST on the MXU — measured 169 vs ~70 us for
        # tier-1's dWi in the train-step trace)
        dWi = jnp.einsum(
            "tbd,tbk->dk", x, dxi, preferred_element_type=jnp.float32
        ).astype(dt)
        dx = jnp.einsum(
            "tbk,dk->tbd", dxi, Wi, preferred_element_type=jnp.float32
        ).astype(dt)
        return dx, dWi, dWh, db, dh0, dc0

    def _materialize(ct, shape, dtype):
        # symbolic zero cotangents arrive for unused primal outputs
        if ct is None or isinstance(
            ct, jax.custom_derivatives.SymbolicZero
        ):
            return jnp.zeros(shape, dtype)
        return ct.astype(dtype)

    layer.defvjp(_fwd, _bwd)
    return layer


def fused_lstm_layer(x, Wi, Wh, b, h0, c0, interpret=None):
    """One LSTM layer over time, fused.

    x: (T, B, D) time-major inputs; Wi (D, 4H), Wh (H, 4H), b (4H,)
    in flax gate order i|f|g|o; (h0, c0): (B, H) initial carry.
    Returns ``(h_all (T, B, H), h_T, c_T)``.  Differentiable in every
    argument (hand-written Pallas backward).

    Dtype follows ``x``: float32 runs the f32 kernels; bfloat16 runs the
    bf16-stream variants (f32 compute + carry in VMEM) — see module
    docstring.  All arguments are cast to the layer dtype.
    """
    T, B, D = x.shape
    H = Wh.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    layer = _make_layer(T, B, D, H, bool(interpret), jnp.dtype(dt).name)
    return layer(
        x.astype(dt),
        Wi.astype(dt),
        Wh.astype(dt),
        b.astype(dt),
        h0.astype(dt),
        c0.astype(dt),
    )
