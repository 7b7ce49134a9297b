"""Shape-manipulation modules (reference ``mimikit/modules/misc.py:19-112``)."""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Chunk",
    "Flatten",
    "Transpose",
    "CausalPad",
    "Unsqueeze",
    "Unfold",
    "ShapeWrap",
    "causal_pad",
    "unfold",
]


def causal_pad(x, pad: Tuple[int, ...], **kwargs):
    """Pad the listed trailing dims; positive = left pad, negative = right.

    ``pad`` entries map to the last ``len(pad)`` axes in order (unlike
    torch's reversed convention which the reference has to undo,
    ``misc.py:37-40``).
    """
    widths = [(0, 0)] * (x.ndim - len(pad))
    for p in pad:
        widths.append((p, 0) if p >= 0 else (0, -p))
    return jnp.pad(x, widths, **kwargs)


def unfold(x, dim: int, size: int, step: int):
    """torch.unfold equivalent: extract sliding windows of ``size`` every
    ``step`` along ``dim``; the window axis is appended last."""
    dim = dim % x.ndim
    n = (x.shape[dim] - size) // step + 1
    idx = np.arange(size)[None, :] + step * np.arange(n)[:, None]  # (n, size)
    out = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=dim)
    new_shape = x.shape[:dim] + (n, size) + x.shape[dim + 1:]
    out = out.reshape(new_shape)
    # move the window axis to the end (torch semantics)
    return jnp.moveaxis(out, dim + 1, -1)


class Transpose(nn.Module):
    dim1: int
    dim2: int

    @nn.compact
    def __call__(self, *args):
        out = tuple(
            jnp.swapaxes(x, self.dim1, self.dim2) if x is not None else None
            for x in args
        )
        return out if len(out) > 1 else out[0]


class CausalPad(nn.Module):
    pad: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        return causal_pad(x, self.pad)


class Chunk(nn.Module):
    chunks: int
    dim: int = -1
    sum_outputs: bool = False

    @nn.compact
    def __call__(self, x):
        parts = jnp.split(x, self.chunks, axis=self.dim)
        if self.sum_outputs:
            return sum(parts)
        return tuple(parts)


class Flatten(nn.Module):
    """flatten `n_dims` dimensions (firsts n if n_dims > 0, else n lasts)"""

    n_dims: int

    @nn.compact
    def __call__(self, x):
        if self.n_dims < 0:
            return x.reshape(*x.shape[: self.n_dims], -1)
        return x.reshape(-1, *x.shape[self.n_dims:])


class Unsqueeze(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return jnp.expand_dims(x, self.dim)


class Unfold(nn.Module):
    dim: int = -1
    size: int = 1
    step: int = 1

    @nn.compact
    def __call__(self, x):
        return unfold(x, self.dim, self.size, self.step)


class ShapeWrap(nn.Module):
    m: nn.Module
    in_view: Tuple[int, ...]
    out_view: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        y = self.m(x.reshape(*self.in_view))
        y = jnp.squeeze(y)
        return y.reshape(B, *self.out_view)
