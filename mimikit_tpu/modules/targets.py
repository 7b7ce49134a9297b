"""Output heads: train/infer switch + temperature sampling.

Rebuild of ``mimikit/modules/targets.py``: ``OutputWrapper`` returns raw
distribution parameters in training and sampled values at inference;
``CategoricalSampler`` does argmax (no temperature) or tempered
``jax.random.categorical`` sampling (rng via flax's 'sample' stream).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["OutputWrapper", "CategoricalSampler"]


def _as_array(temperature, logits):
    t = jnp.asarray(temperature, dtype=logits.dtype)
    while t.ndim < logits.ndim:
        t = t[..., None]
    return t


class CategoricalSampler(nn.Module):
    sampling_params = frozenset({"temperature"})

    @nn.compact
    def __call__(self, logits, *, temperature=None, train: bool = False):
        if train:
            return logits
        if temperature is None:
            return jnp.argmax(logits, axis=-1)
        t = _as_array(temperature, logits)
        rng = self.make_rng("sample")
        # categorical over the last axis; batch dims kept
        return jax.random.categorical(rng, logits / t, axis=-1)


class OutputWrapper(nn.Module):
    """estimator -> params (train) | sampler(params) (eval)
    (the reference's train/infer switch, ``targets.py:10-24``)."""

    estimator: nn.Module
    sampler: Optional[nn.Module]

    @nn.compact
    def __call__(self, *inputs, train: bool = False, tied_kernel=None,
                 **sampler_kwargs):
        if tied_kernel is not None:
            params = self.estimator(*inputs, train=train, tied_kernel=tied_kernel)
        else:
            params = self.estimator(*inputs, train=train)
        if not train and self.sampler is not None:
            return self.sampler(params, train=train, **sampler_kwargs)
        return params

    @property
    def sampling_params(self):
        return getattr(self.sampler, "sampling_params", frozenset())
