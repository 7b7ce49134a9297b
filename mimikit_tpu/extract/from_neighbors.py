"""Neighbor-based output scoring (reference ``extract/from_neighbors.py``)."""
from __future__ import annotations

import numpy as np

from ..modules.loss_functions import AngularDistance

__all__ = ["nearest_neighbor", "cum_entropy", "repeat_rate", "frame"]


def nearest_neighbor(X, Y):
    """nearest neighbor by angular distance; returns (dists, indices)."""
    import jax.numpy as jnp

    D_xy = AngularDistance(reduction="none")(jnp.asarray(X), jnp.asarray(Y))
    nn = jnp.argmin(D_xy, axis=-1)
    dists = jnp.min(D_xy, axis=-1)
    return np.asarray(dists), np.asarray(nn)


def frame(x: np.ndarray, frame_size: int, hop_length: int) -> np.ndarray:
    """reshape the last axis into overlapping frames"""
    x = np.asarray(x)
    n = 1 + (x.shape[-1] - frame_size) // hop_length
    idx = np.arange(frame_size)[None, :] + hop_length * np.arange(n)[:, None]
    return x[..., idx]


def repeat_rate(x, frame_size, hop_length):
    """frames x and computes repeat-rate per frame"""
    framed = frame(np.asarray(x), frame_size, hop_length)
    flat = framed.reshape(-1, framed.shape[-1])
    uniques = np.asarray([len(np.unique(row)) for row in flat])
    return (1 - (uniques - 1) / (frame_size - 1)).reshape(framed.shape[:-1])


def cum_entropy(neighbors, reduce="sum", neg_diff=True):
    """Cumulative-entropy score of a (Time,) index sequence — used to rank
    generated outputs (reference ``demos/checkpoint_k_bests.py:137-141``)."""
    neighbors = np.asarray(neighbors)
    items, idx = np.unique(neighbors, return_inverse=True)
    T = neighbors.shape[0]
    cum_probs = np.zeros((items.shape[0], T))
    cum_probs[idx, np.arange(T)] = 1
    cum_probs = np.cumsum(cum_probs, axis=1)
    cum_probs = cum_probs / cum_probs.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        log_p = np.where(cum_probs > 0, np.log(cum_probs), 0.0)
    e_wrt_t = (-cum_probs * log_p).sum(axis=0)
    if neg_diff:
        diff = np.diff(e_wrt_t, append=0.0)
        e_wrt_t = np.sign(diff) * e_wrt_t
    return e_wrt_t.sum() if reduce == "sum" else e_wrt_t
