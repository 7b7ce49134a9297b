"""On-device batch serving: gather training windows on the TPU.

The reference feeds training through multi-process torch DataLoaders reading
h5 slices on the host (``train_loops.py:114-123``).  TPU-native equivalent:
upload each extractor array to device memory once, then produce batches with
a jitted vmapped ``dynamic_slice`` gather + the transform's ``jax_func`` —
no host↔device transfer in the steady state, no worker processes.  Index
selection (shuffling, TBPTT chunk walking) stays host-side and cheap.

Requires every leaf transform to have a jax path (mu-law & friends do); the
host loader remains the fallback for host-only transforms.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.batch import AsSlice, Input, process_batch
from ..data.samplers import TBPTTSampler

__all__ = ["DeviceBatcher", "supports_device_batching"]


def _leaves(batch) -> list:
    leaves = []
    process_batch(
        batch, lambda x: isinstance(x, Input), lambda x: leaves.append(x) or x
    )
    return leaves


def supports_device_batching(batch) -> bool:
    """True when every Input leaf is an AsSlice read with a jax-able transform."""
    for leaf in _leaves(batch):
        if leaf.data is None or not isinstance(leaf.getter, AsSlice):
            return False
        t = leaf.transform
        if t is not None:
            fn = getattr(type(t), "jax_func", None)
            base = getattr(
                __import__("mimikit_tpu.features.functionals", fromlist=["Functional"]),
                "Functional",
            )
            if fn is None or fn is base.jax_func:
                return False
    return True


class DeviceBatcher:
    """Iterable of on-device batches over a nested Input tree."""

    def __init__(
        self,
        db,
        batch,
        batch_size: int = 16,
        shuffle: bool = True,
        batch_sampler=None,
        seed: Optional[int] = None,
        limit_batches: Optional[int] = None,
        sampling_jitter: int = 0,
    ):
        import jax
        import jax.numpy as jnp

        self.batch = batch
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.batch_sampler = batch_sampler
        self.limit_batches = limit_batches
        self.sampling_jitter = sampling_jitter
        self._rng = np.random.RandomState(seed)
        self.leaves = _leaves(batch)

        # upload each referenced array once
        self._arrays = {}
        for leaf in self.leaves:
            if leaf.data not in self._arrays:
                self._arrays[leaf.data] = jnp.asarray(db.get_array(leaf.data)[:])
        ns = [
            leaf.getter.n_items(self._arrays[leaf.data].shape[0])
            for leaf in self.leaves
        ]
        self.n_items = max(0, min(ns))

        leaves = self.leaves
        arrays = self._arrays

        def gather(idx):
            outs = []
            for leaf in leaves:
                arr = arrays[leaf.data]
                g: AsSlice = leaf.getter
                span = g.length * g.downsampling

                def one(i, arr=arr, g=g, span=span):
                    w = jax.lax.dynamic_slice_in_dim(arr, i + g.shift, span, axis=0)
                    if g.downsampling > 1:
                        w = w[:: g.downsampling]
                    return w

                win = jax.vmap(one)(idx)
                if leaf.transform is not None:
                    win = leaf.transform.jax_func(win)
                outs.append(win)
            return tuple(outs)

        self.gather_raw = gather  # unjitted: the train loop fuses it
        self._gather = jax.jit(gather)

    def _index_batches(self):
        for idx in self._raw_index_batches():
            if self.sampling_jitter:
                # jitter window starts host-side, mirroring the host loader's
                # serve(sampling_jitter=...) semantics (data/store.py)
                j = self._rng.randint(
                    -self.sampling_jitter, self.sampling_jitter + 1, len(idx)
                )
                idx = np.clip(
                    np.asarray(idx, np.int64) + j, 0, max(0, self.n_items - 1)
                )
            yield idx

    def _raw_index_batches(self):
        if self.batch_sampler is not None:
            yield from self.batch_sampler
            return
        order = np.arange(self.n_items)
        if self.shuffle:
            self._rng.shuffle(order)
        for k in range(0, len(order) - self.batch_size + 1, self.batch_size):
            yield order[k : k + self.batch_size]

    def __iter__(self):
        import jax.numpy as jnp

        count = 0
        for idx in self._index_batches():
            if self.limit_batches is not None and count >= self.limit_batches:
                return
            flat = self._gather(jnp.asarray(np.asarray(idx, np.int32)))
            it = iter(flat)
            yield process_batch(
                self.batch, lambda x: isinstance(x, Input), lambda x: next(it)
            )
            count += 1

    def __len__(self):
        if self.batch_sampler is not None and hasattr(self.batch_sampler, "__len__"):
            n = len(self.batch_sampler)
        else:
            n = self.n_items // self.batch_size
        if self.limit_batches is not None:
            n = min(n, self.limit_batches)
        return n


def make_train_loader(dataset, net, cfg, prefer_device: bool = True):
    """Build the training loader: device batcher when possible, host fallback
    (mirrors ``TrainARMLoop.get_dataloader``)."""
    from ..features.item_spec import ItemSpec

    user_spec = ItemSpec(
        shift=0,
        length=cfg.batch_length,
        stride=cfg.downsampling,
        unit=net.config.io_spec.unit,
    )
    batch = net.train_batch(user_spec)
    batch_sampler = None
    if cfg.tbptt_chunk_length is not None:
        N = dataset.signal.shape[0]
        batch_sampler = TBPTTSampler(
            N,
            batch_size=cfg.batch_size,
            chunk_length=cfg.tbptt_chunk_length,
            seq_len=cfg.batch_length,
            oversampling=cfg.oversampling,
        )
    if prefer_device and supports_device_batching(batch):
        return DeviceBatcher(
            dataset,
            batch,
            batch_size=cfg.batch_size,
            shuffle=batch_sampler is None,
            batch_sampler=batch_sampler,
            sampling_jitter=cfg.sampling_jitter,
        )
    if batch_sampler is not None:
        return dataset.serve(
            batch,
            batch_sampler=batch_sampler,
            sampling_jitter=cfg.sampling_jitter,
        )
    return dataset.serve(
        batch,
        batch_size=cfg.batch_size,
        shuffle=True,
        sampling_jitter=cfg.sampling_jitter,
    )
