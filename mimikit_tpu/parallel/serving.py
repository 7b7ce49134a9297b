"""Zoo-generic multi-device serving: shard decode batches across chips.

Every decoder in the zoo is batch-row-independent (streams never interact),
so multi-device serving needs no collectives at all: pin the params and a
batch slice to each device and let the per-device jitted decoders dispatch
asynchronously — the devices run concurrently and the host pays one
round of dispatches.  This complements the two mesh-aware fast paths that
live on the networks themselves (`SampleRNN.generate(mesh=...)`: sharded
scan, or the fused Pallas kernel per shard via ``jax.shard_map``): it
works with ANY net's ``generate`` — WaveNet's rolling-window decode, the
transformers' window scans and fused kernels, seq2seq's block-AR scan —
because it composes at the call boundary instead of inside the jit.

Per-slice outputs are exact per stream (argmax slices equal the unsharded
call's rows; sampled streams draw per-slice rng streams).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

__all__ = ["sharded_generate", "sharded_stream_tokens"]


def _device_copies(net, params, devices):
    """Replicate ``params`` onto each device once, cached on the net.

    The cache holds a STRONG reference to the exact params pytree the
    copies were made from and validates with ``is`` — an id()-keyed cache
    would give false hits when CPython reuses the id of a freed tree
    (silently serving stale weights after further training)."""
    cache = getattr(net, "_params_by_device", None)
    if (
        cache is not None
        and cache[0] is params
        and all(d in cache[1] for d in devices)
    ):
        return cache[1]
    copies = {d: jax.device_put(params, d) for d in devices}
    net._params_by_device = (params, copies)
    return copies


def sharded_generate(
    net,
    prompts: Tuple,
    n_steps: int,
    temperature=None,
    rng=None,
    mesh=None,
    devices=None,
):
    """Decode ``prompts`` with the stream batch sharded across devices.

    ``devices`` (or ``mesh``'s device list) each receive an equal batch
    slice; ``B`` must divide evenly.  Dispatches are issued back-to-back
    (async), so wall time is one slice's decode plus dispatch overhead —
    aggregate throughput scales with the device count.  Returns the same
    tuple-of-(B, T) buffers as ``net.generate``.

    .. note:: the net's ``params`` attribute is temporarily rebound to
       each device copy while its slice dispatches (restored on return):
       ``sharded_generate`` must not run concurrently with other uses of
       the same net object (e.g. an active ``stream_tokens`` generator
       being advanced from another thread).
    """
    if devices is None:
        devices = (
            list(mesh.devices.flat) if mesh is not None else jax.devices()
        )
    devices = list(devices)
    B = np.shape(prompts[0])[0]
    n = len(devices)
    if n < 2 or B % n:
        return net.generate(
            prompts, n_steps, temperature=temperature, rng=rng
        )
    if rng is None:
        rng = net.next_rng()
    keys = jax.random.split(rng, n)
    sl = B // n
    orig_params = net.params
    # all device copies are derived from the ORIGINAL params before the
    # dispatch loop mutates net.params (deriving inside the loop would key
    # copy i on the device copy from iteration i-1, defeating the cache)
    copies = _device_copies(net, orig_params, devices)
    outs = []
    try:
        for i, (dev, key) in enumerate(zip(devices, keys)):
            # pin params + slice to the device; the net's cached jitted
            # decoder (scan or fused kernel) then executes THERE, and the
            # loop moves on without waiting (async dispatch)
            net.params = copies[dev]
            slice_prompts = tuple(
                jax.device_put(np.asarray(p)[i * sl : (i + 1) * sl], dev)
                for p in prompts
            )
            outs.append(
                net.generate(
                    slice_prompts, n_steps, temperature=temperature, rng=key
                )
            )
    finally:
        net.params = orig_params
    return tuple(
        np.concatenate([np.asarray(o[v]) for o in outs], axis=0)
        for v in range(len(outs[0]))
    )


def sharded_stream_tokens(
    net,
    prompts: Tuple,
    chunk_steps: int,
    temperature=None,
    rng=None,
    mesh=None,
    devices=None,
):
    """Multi-device streaming serving: ``stream_tokens`` with the stream
    batch sharded across devices, yielding concatenated ``(B,
    chunk_steps)`` chunks forever.

    Each device gets an equal batch slice, its own params copy (cached,
    see :func:`_device_copies`) and its own per-slice stream — the net's
    fused state-carrying path where eligible, window re-feed otherwise.
    Every per-slice stream rides the read-behind pipeline
    (``loops/streaming.py``): advancing slice *i* dispatches its NEXT
    chunk before reading its current one, so while the host reads slice
    *i*'s chunk the other devices keep computing — aggregate throughput
    scales with the device count and the per-round host cost is the n
    slice reads.  Per-stream rows are exact (argmax rows equal the
    unsharded stream's; sampled slices draw per-slice rng streams).

    .. note:: like :func:`sharded_generate`, the net's ``params`` are
       temporarily rebound to the device copy around each slice advance:
       do not advance other generators of the same net concurrently.
    """
    if devices is None:
        devices = (
            list(mesh.devices.flat) if mesh is not None else jax.devices()
        )
    devices = list(devices)
    B = np.shape(prompts[0])[0]
    n = len(devices)
    if n < 2 or B % n:
        from ..loops.streaming import stream_tokens

        yield from stream_tokens(
            net, prompts, chunk_steps, temperature=temperature, rng=rng
        )
        return
    if rng is None:
        rng = net.next_rng()
    keys = jax.random.split(rng, n)
    sl = B // n
    orig_params = net.params
    copies = _device_copies(net, orig_params, devices)

    def slice_stream(dev, key, i):
        slice_prompts = tuple(
            jax.device_put(np.asarray(p)[i * sl : (i + 1) * sl], dev)
            for p in prompts
        )
        from ..loops.streaming import stream_tokens

        inner = stream_tokens(
            net, slice_prompts, chunk_steps, temperature=temperature,
            rng=key,
        )
        while True:
            # bind the device copy only around the advance: the inner
            # generator reads ``net.params`` at each dispatch
            saved = net.params
            net.params = copies[dev]
            try:
                chunk = next(inner)
            finally:
                net.params = saved
            yield chunk

    streams = [
        slice_stream(dev, key, i)
        for i, (dev, key) in enumerate(zip(devices, keys))
    ]
    while True:
        yield np.concatenate([next(s) for s in streams], axis=0)
