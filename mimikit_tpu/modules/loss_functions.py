"""Loss functions (reference ``mimikit/modules/loss_functions.py``).

Pure jnp callables — NaN guarding moves to the train loop (host-side check
on the realized loss; a jitted function cannot raise data-dependently).
"""
from __future__ import annotations

import dataclasses as dtc

import jax
import jax.numpy as jnp

__all__ = [
    "MeanL1Prop",
    "Mean2dDiff",
    "CosineSimilarity",
    "AngularDistance",
    "ElementWiseAngularDistance",
    "WeightedL1",
    "DiffOverTime",
    "DistanceOverTime",
    "MaximizeStd",
    "ScaledOutputsL1",
    "MaximizeMagnitude",
    "cross_entropy",
]


def cross_entropy(output, target):
    """Mean CE over all positions; output (..., C) logits, target (...) ints.

    Written gather-free: ``take_along_axis`` lowers to a serialized gather
    on TPU (and its BACKWARD to a scatter) — measured ~0.76 ms fwd alone
    on the SampleRNN train step's (65536, 256) logits.  The iota-compare
    select fuses into the elementwise pass over the logits instead, and
    its backward is the same fused mask (softmax - one_hot).

    The ``optimization_barrier`` pins ONE materialization of the logits.
    Without it, XLA may rematerialize the producer chain separately for
    the ``max`` and the ``exp(x - max)`` inside the fused loss — under a
    bf16 mixed-precision forward the two copies can disagree by one bf16
    ulp, and once logits reach |x| >= 2**15 that ulp (128+) exceeds f32's
    exp underflow range (~88): every element of a row underflows to 0 and
    ``logsumexp`` returns -inf from FINITE logits.  Measured on v5e
    (wavenet bf16 tone overfit): loss -inf at max|logit| 167k while the
    same realized logits give 8.9e-6 on the host; 84/16384 rows had
    sum(exp(x - max)) == 0.

    The barrier is NOT free: pinning blocks the loss from fusing into
    the producer, costing one logits round-trip through HBM (measured
    +0.17 ms/step at the SampleRNN bench shape's 67 MB of f32 logits).
    ``precision.loss_barrier_mode()`` picks the cheapest safe variant:
    pure-f32 steps skip it (rematerialized f32 copies are bit-identical
    — the train loop sets ``None`` when no bf16 policy is active), bf16
    steps barrier a bfloat16 CAST (half the traffic; lossless exactly
    because policy-produced logits are bf16-representable), and the
    default outside any scope is the always-safe full-precision barrier.
    """
    from .. import precision as _prec

    mode = _prec.loss_barrier_mode()
    if mode == "bf16":
        output = jax.lax.optimization_barrier(
            output.astype(jnp.bfloat16)
        ).astype(jnp.float32)
    elif mode is not None:
        output = jax.lax.optimization_barrier(output)
    logits = output.reshape(-1, output.shape[-1])
    labels = target.reshape(-1).astype(jnp.int32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    classes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    picked = jnp.sum(
        jnp.where(classes == labels[:, None], logits, 0.0), axis=-1
    )
    return (lse - picked).mean()


@dtc.dataclass
class MeanL1Prop:
    """L1 normalized by the target's magnitude per (time) slice
    (reference ``loss_functions.py:18-36``)."""

    raise_on_nan: bool = True  # enforced host-side by the loop
    eps: float = 1e-8

    def __call__(self, output, target):
        L = jnp.abs(output - target).sum(axis=(0, -1), keepdims=True)
        target_sums = jnp.abs(target).sum(axis=(0, -1), keepdims=True)
        prop = jnp.maximum(jax.lax.stop_gradient(L), self.eps)
        target_sums = target_sums + (target_sums < 1.0).astype(L.dtype) * prop
        return (L / target_sums).mean()


@dtc.dataclass
class WeightedL1:
    eps: float = 1e-18

    def __call__(self, output, target):
        L = jnp.abs(output - target)
        target_sums = jax.lax.stop_gradient(L).sum(axis=1, keepdims=True)
        prop = target_sums / jnp.maximum(
            target_sums.sum(axis=-1, keepdims=True), self.eps
        )
        return (L * prop).sum()


@dtc.dataclass
class DiffOverTime:
    threshold: float = 1e-4

    def __call__(self, output, target):
        return jnp.abs(
            jnp.diff(output, axis=1) - jnp.diff(target, axis=1)
        ).mean()


@dtc.dataclass
class DistanceOverTime:
    def __call__(self, output, target):
        d_o = jnp.linalg.norm(
            output[:, :, None, :] - output[:, None, :, :], axis=-1
        )
        d_t = jnp.linalg.norm(
            target[:, :, None, :] - target[:, None, :, :], axis=-1
        )
        return jnp.abs(d_o - d_t).mean()


@dtc.dataclass
class MaximizeStd:
    def __call__(self, output, target):
        return -output.std(axis=1, keepdims=True).mean()


@dtc.dataclass
class MaximizeMagnitude:
    def __call__(self, output, target):
        return -output.mean()


@dtc.dataclass
class ScaledOutputsL1:
    min_a: float = 0.95
    max_a: float = 1.05
    seed: int = 0

    def __call__(self, output, target):
        key = jax.random.PRNGKey(self.seed)
        scales = jax.random.uniform(
            key, (*target.shape[:-1], 1), minval=self.min_a, maxval=self.max_a
        )
        return MeanL1Prop()(output, scales * target)


@dtc.dataclass
class Mean2dDiff:
    raise_on_nan: bool = True
    eps: float = 1e-8

    def __call__(self, output, target):
        l1p = MeanL1Prop(self.raise_on_nan, self.eps)
        lw = l1p(
            output[:, :, 1:] - output[:, :, :-1],
            target[:, :, 1:] - target[:, :, :-1],
        )
        lh = l1p(output[:, 1:] - output[:, :-1], target[:, 1:] - target[:, :-1])
        return lw + lh


@dtc.dataclass
class CosineSimilarity:
    """Full (N, M) cosine-similarity matrix (reference ``:121-147``)."""

    eps: float = 1e-8

    def __call__(self, X, Y):
        dot = X @ jnp.swapaxes(Y, -2, -1)
        norms = (
            jnp.linalg.norm(X, axis=-1)[..., :, None]
            * jnp.linalg.norm(Y, axis=-1)[..., None, :]
        )
        return dot / jnp.maximum(norms, self.eps)


@dtc.dataclass
class AngularDistance:
    eps: float = 1e-8
    reduction: str = "mean"

    def _safe_acos(self, x):
        return jnp.arccos(
            jnp.clip(x, -1 + self.eps / 2, 1 - self.eps / 2)
        )

    def __call__(self, X, Y):
        have_negatives = jnp.any(X < 0) | jnp.any(Y < 0)
        cos_theta = CosineSimilarity(self.eps)(X, Y)
        scale = 2.0 - have_negatives.astype(cos_theta.dtype)
        d = scale * self._safe_acos(cos_theta) / jnp.pi
        if self.reduction != "none":
            return getattr(jnp, self.reduction)(d)
        return d


@dtc.dataclass
class ElementWiseAngularDistance(AngularDistance):
    def __call__(self, output, target):
        return super().__call__(output[..., None, :], target[..., None, :])
