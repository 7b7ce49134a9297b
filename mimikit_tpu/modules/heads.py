"""MLP head with learned temperature (reference ``mimikit/networks/mlp.py``).

The last logit parameterizes a per-position temperature (sigmoid, floored at
``min_temperature``) dividing the remaining logits — the reference's
learned-temperature trick (``mlp.py:58-63``).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MLP", "ParametrizedGaussian", "ParametrizedLinear", "ParametrizedLogistic"]


class MLP(nn.Module):
    in_dim: int
    hidden_dim: int
    out_dim: int
    n_hidden_layers: int = 0
    activation: Optional[nn.Module] = None
    use_bias: bool = True
    dropout: float = 0.0
    dropout1d: float = 0.0
    min_temperature: Optional[float] = 1e-4
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = (
            self.activation
            if self.activation is not None
            else (lambda v: v * jnp.tanh(nn.softplus(v)))  # mish
        )
        learn_temperature = self.min_temperature is not None
        out_dim = self.out_dim + int(learn_temperature)

        def dense(features):
            layer = nn.Dense(features, use_bias=self.use_bias)
            return nn.WeightNorm(layer) if self.weight_norm else layer

        h = dense(self.hidden_dim)(x)
        h = act(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for _ in range(self.n_hidden_layers):
            h = dense(self.hidden_dim)(h)
            h = act(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        logits = dense(out_dim)(h)
        if learn_temperature:
            temp = nn.sigmoid(logits[..., -1:])
            logits = logits[..., :-1] / jnp.maximum(temp, self.min_temperature)
        return logits



class ParametrizedGaussian(nn.Module):
    input_dim: int
    z_dim: int
    use_bias: bool = False
    min_std: float = 1e-4
    return_params: bool = True

    @nn.compact
    def __call__(self, h, train: bool = False, **_):
        mu, logvar = jnp.split(
            nn.Dense(self.z_dim * 2, use_bias=self.use_bias)(h), 2, axis=-1
        )
        std = jnp.maximum(jnp.exp(0.5 * logvar), self.min_std)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        z = mu + std * eps
        if self.return_params:
            return z, mu, std
        return z


class ParametrizedLinear(nn.Module):
    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        x_hat, a, b = jnp.split(
            nn.Dense(self.out_dim * 3, use_bias=self.use_bias)(x), 3, axis=-1
        )
        return x_hat * a + b


class ParametrizedLogistic(nn.Module):
    in_dim: int
    out_dim: int
    use_bias: bool = True
    min_std: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        mu, std = jnp.split(
            nn.Dense(self.out_dim * 2, use_bias=self.use_bias)(x), 2, axis=-1
        )
        y = jax.random.uniform(self.make_rng("sample"), mu.shape, mu.dtype)
        finfo = jnp.finfo(y.dtype)
        y = jnp.clip(y, finfo.tiny, 1.0 - finfo.eps)
        y = jnp.log(y) - jnp.log1p(-y)
        return mu + y * std
