"""Device-mesh scaling: data-parallel + tensor-parallel sharding helpers.

The reference is strictly single-device (SURVEY.md §2.15) — its only
multi-device touchpoint is pytorch-lightning's implicit DDP.  The TPU-native
equivalent is explicit: a ``jax.sharding.Mesh`` with a ``data`` axis (batch
sharded, gradients all-reduced over ICI by XLA) and an optional ``model``
axis (large Dense/Embed kernels sharded over their output features, the
classic Megatron column split — XLA inserts the all-gathers/reduce-scatters).

These helpers keep the training loop's hot path a single ``jax.jit`` with
sharding annotations: no custom collectives, no per-device Python.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharding",
    "param_shardings",
    "shard_params",
    "data_parallel_step",
]


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis."""
    return NamedSharding(mesh, P("data"))


def _leaf_spec(path: str, leaf, min_size: int, model_axis_size: int):
    """Column-split large kernels over 'model' when the feature dim divides."""
    if (
        leaf.ndim >= 2
        and leaf.size >= min_size
        and leaf.shape[-1] % model_axis_size == 0
        and ("kernel" in path or "embedding" in path)
    ):
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def _fsdp_axis(spec: P, leaf, data_axis_size: int):
    """Add a 'data' split on the largest still-unsharded dim (ZeRO-3 style:
    params live sharded over the data axis; XLA all-gathers them at use and
    reduce-scatters the gradients)."""
    dims = list(spec) + [None] * (leaf.ndim - len(spec))
    order = sorted(
        range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True
    )
    for d in order:
        if dims[d] is None and leaf.shape[d] % data_axis_size == 0:
            dims[d] = "data"
            return P(*dims)
    return spec


def param_shardings(mesh: Mesh, params, min_size: int = 4096, fsdp: bool = False):
    """PartitionSpec tree: tensor-parallel column split for big kernels,
    replication for everything else.  With ``fsdp=True``, big leaves are
    additionally sharded over 'data' (fully-sharded data parallel)."""
    model_n = mesh.shape["model"]
    data_n = mesh.shape["data"]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        spec = _leaf_spec(pstr, leaf, min_size, model_n) if model_n > 1 else P()
        if fsdp and data_n > 1 and leaf.size >= min_size and leaf.ndim >= 1:
            spec = _fsdp_axis(spec, leaf, data_n)
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_shardings(mesh, params))


def data_parallel_step(step_fn, mesh: Mesh, params_sharding=None):
    """jit ``step_fn(params, opt_state, hidden, inputs, targets, rng)`` with
    the batch split over 'data' and params/opt-state placed per
    ``params_sharding`` (default: replicated)."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    p_sh = params_sharding if params_sharding is not None else repl
    return jax.jit(
        step_fn,
        in_shardings=(p_sh, repl, repl, data, data, repl),
        out_shardings=(p_sh, repl, repl, repl),
    )
