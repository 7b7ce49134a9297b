"""Mixed-precision policy: bfloat16 compute with float32 master weights.

TPU-native training casts params + activations to ``bfloat16`` (half the
HBM traffic — the resource the train rooflines in ``benchmarks/
bench_train.py`` say binds the RNN families — and double the MXU rate
where compute binds) while the optimizer keeps float32 master params and
moments: the per-step update is ~1e-4 of the weight scale, far below
bf16's ~3 decimal digits, so updating bf16 weights in place would stall
learning.  bf16 shares float32's exponent range, so no loss scaling is
needed (unlike fp16 on CUDA — the reference has no mixed-precision path
at all; its torch modules run f32 end-to-end,
``/root/reference/mimikit/loops/train_loops.py:305-310``).

Wiring: ``TrainARMConfig.trainer_kwargs={"param_dtype": "bfloat16"}``.
The jitted step casts the f32 master tree to bf16 *inside* the traced
function (XLA fuses the casts into the producers/consumers; grads flow
back through ``convert_element_type`` whose transpose re-casts cotangents
to f32 at the boundary), runs forward+backward in bf16, computes the loss
in f32, and applies f32 grads to the f32 masters.

The handful of modules that create float tensors from *non-float* inputs
(class-index linearizers, positional-encoding tables, mix weights) cannot
follow an input dtype — they consult :func:`compute_dtype`, a trace-time
context the step sets around ``module.apply``.  Everything else follows
jnp dtype promotion from the cast params/inputs.

Stability: on real tasks the policy converges indistinguishably from f32
(``benchmarks/overfit_check.py`` with ``BENCH_DTYPE=bfloat16`` hits the
same 440 Hz / loss as f32 for samplernn, freqnet, wavenet and the
transformer).  Two margin-regime notes:

* *Infinite-margin memorization* (a fixed fully-memorized discrete
  target, no weight decay/clipping) drives the winning logits unboundedly
  in EITHER dtype; clip/weight decay bounds it if a real task ever
  resembles it.
* Once logits pass |x| >= 2**15, one bf16 ulp exceeds f32's exp
  underflow range — a fused loss whose ``max`` and ``exp(x - max)``
  consume two different rematerializations of a bf16 producer can then
  return -inf from finite logits.  ``modules/loss_functions.cross_entropy``
  pins a single materialization with ``jax.lax.optimization_barrier``
  (mechanism + v5e measurement in its docstring); wavenet's bf16 tone
  overfit NaN'd through exactly this before the barrier and passes with
  it.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

__all__ = [
    "compute_dtype",
    "compute",
    "cast_floats",
    "resolve_dtype",
    "loss_barrier",
    "loss_barrier_mode",
]

_COMPUTE_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "mmk_compute_dtype", default=None
)


def compute_dtype(default=jnp.float32):
    """The policy's compute dtype (trace-time), or ``default`` outside any
    policy.  Modules that must *create* float tensors (no input dtype to
    follow) call this so bf16 does not silently re-promote to f32
    downstream (f32 ⊕ bf16 → f32 under jnp promotion)."""
    d = _COMPUTE_DTYPE.get()
    return default if d is None else d


@contextlib.contextmanager
def compute(dtype):
    """Set the compute dtype for module code traced inside the block."""
    token = _COMPUTE_DTYPE.set(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(token)


_LOSS_BARRIER: contextvars.ContextVar = contextvars.ContextVar(
    "mmk_loss_barrier", default="f32"
)


def loss_barrier_mode():
    """How ``cross_entropy`` pins its logits against XLA's dual
    rematerialization (see its docstring): ``"f32"`` (default — barrier
    the full-precision logits: always safe, costs one logits round-trip
    through HBM, ~0.17 ms at the SampleRNN bench shape), ``"bf16"``
    (barrier a bfloat16 CAST of the logits — half the traffic, lossless
    exactly when the logits came out of a bf16 compute policy, which is
    the only case that NEEDS a barrier), or ``None`` (no barrier — safe
    for pure-f32 steps, whose rematerialized copies are bit-identical).
    The train loop selects the mode from its precision policy."""
    return _LOSS_BARRIER.get()


@contextlib.contextmanager
def loss_barrier(mode):
    """Set the loss-barrier mode (trace-time) for code in the block."""
    if mode not in (None, "f32", "bf16"):
        raise ValueError(f"loss_barrier mode must be None/'f32'/'bf16', got {mode!r}")
    token = _LOSS_BARRIER.set(mode)
    try:
        yield
    finally:
        _LOSS_BARRIER.reset(token)


def resolve_dtype(name):
    """trainer_kwargs value -> jnp dtype or None (f32 = no policy)."""
    if name is None:
        return None
    if isinstance(name, str):
        key = name.lower().replace("jnp.", "")
        if key in ("bfloat16", "bf16"):
            return jnp.bfloat16
        if key in ("float16", "fp16", "half"):
            # supported for experiments; bf16 is the TPU-native choice
            return jnp.float16
        if key in ("float32", "f32", "fp32"):
            return None
        raise ValueError(f"unknown param_dtype '{name}'")
    dt = jnp.dtype(name)
    return None if dt == jnp.float32 else dt


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype`` (ints, bools and
    PRNG keys pass through untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
