"""Unbounded streaming generation in bounded-latency chunks.

The reference's long-form path (``generate_chunks.py``, reference
``loops/generate_chunks.py:39-57``) loops whole ``GenerateLoopV2`` runs,
re-feeding the tail of each chunk as the next prompt.  Here streaming is a
first-class serving surface:

* ``stream_tokens(net, prompts, chunk_steps)`` yields ``(B, chunk_steps)``
  token/frame arrays forever (the caller breaks out).  Networks that expose
  a fused state-carrying decoder (``SampleRNN.stream``) continue EXACTLY —
  the concatenated stream is token-identical to one long decode, because
  hidden state and sample windows are carried across kernel calls on-chip.
* Other ``generate``-capable networks fall back to receptive-field window
  re-feeding: exact for nets whose decode state is fully
  window-determined — WaveNet, transformers, and seq2seq (whose hidden is
  per-block; exact when ``chunk_steps`` is a multiple of its ``hop`` so
  chunk boundaries align with block boundaries).  Models without a batch
  ``generate`` (autoencoders) are rejected with a clear error — they run
  under ``EncodeDecodeLoop``.
* ``stream_audio(...)`` additionally applies the IOSpec target's inverse
  transform per chunk (mu-law expand; GLA for frame-domain nets like the
  magspec WaveNet), yielding float audio.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["stream_tokens", "stream_audio"]


def _pipeline_on() -> bool:
    return os.environ.get("MMK_STREAM_PIPELINE", "1") != "0"


def _host_async(x) -> None:
    """Enqueue ``x``'s device->host copy NOW, before anything else is
    dispatched.  Through the TPU tunnel a value read waits for everything
    dispatched before it (the read drains the dispatch queue), so the
    read-behind pipeline only hides the tunnel round-trip if chunk k's
    copy is ordered BEFORE chunk k+1's dispatch."""
    try:
        x.copy_to_host_async()
    except Exception:  # CPU arrays / interpret mode: reads are free
        pass


def _refeed_stream(net, prompt, chunk_steps: int, temperature, rng):
    import jax
    import jax.numpy as jnp

    if not callable(getattr(net, "generate", None)):
        raise TypeError(
            f"{type(net).__name__} has no batch `generate` — streaming "
            "needs one (autoencoder models run under EncodeDecodeLoop "
            "instead)"
        )
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # block-AR nets (seq2seq: hidden is per-block, decode emits whole
    # hop-sized blocks) are only exact when chunk boundaries fall on block
    # boundaries — a mid-block truncation misaligns every later window and
    # the stream silently diverges from one long decode, so refuse it
    hop = getattr(getattr(net, "config", None), "hop", None)
    if hop and hop > 1 and chunk_steps % hop:
        raise ValueError(
            f"{type(net).__name__} decodes in blocks of hop={hop}: "
            f"chunk_steps={chunk_steps} must be a multiple of hop for the "
            "stream to match one long decode (round chunk_steps up to "
            f"{-(-chunk_steps // hop) * hop})"
        )
    # re-feed the span the net's decoder actually conditions on: nets whose
    # sliding-window decode rounds rf up to a framing-friendly window
    # (JukeBox: a multiple of frame_sizes[0]) look past rf — re-feeding
    # only rf+1 outputs would zero-pad that extra history and diverge from
    # one long decode (pinned in tests/test_streaming.py)
    if callable(getattr(net, "_window_len", None)):
        window = int(net._window_len())
    else:
        window = int(net.rf) + 1
    buf = jnp.asarray(prompt)
    # read-behind pipeline (MMK_STREAM_PIPELINE=0 opts out): chunk k+1 is
    # dispatched from the DEVICE window before chunk k's host read, so the
    # tunnel round-trip and host conversion overlap k+1's device compute.
    # Tokens are identical — the dispatch order is unchanged, only the
    # read moves one chunk behind.  Each yielded array is real host data
    # (arrival == completion of THAT chunk).
    pipelined = _pipeline_on()
    pending = None
    while True:
        rng, sub = jax.random.split(rng)
        out = net.generate(
            (buf,), n_steps=chunk_steps, temperature=temperature, rng=sub
        )[0]
        new = out[:, buf.shape[1] :]
        _host_async(new)
        buf = out[:, -window:]
        if not pipelined:
            yield np.asarray(new)
            continue
        if pending is not None:
            yield np.asarray(pending)
        pending = new


def _read_behind_chunks(dev_chunks, chunk_steps: int) -> Iterator[np.ndarray]:
    """Shared tail for the fused state-carrying streams.

    ``dev_chunks`` yields ``(out_T_device, drop)`` pairs where advancing
    the generator DISPATCHES the next device chunk (``out_T`` is a lazy
    ``(C, B)`` device array) and ``drop`` counts prompt-echo warm-up rows
    to discard.  This helper enqueues each chunk's host copy immediately
    (before the next dispatch — see :func:`_host_async`), reads one chunk
    behind the dispatch front (``MMK_STREAM_PIPELINE=0`` opts out), and
    re-chunks the read rows into exact ``(B, chunk_steps)`` yields.
    Tokens are identical to the unpipelined stream — only the host read
    moves one chunk behind, so the tunnel round-trip and numpy conversion
    overlap the NEXT chunk's device compute."""
    pipelined = _pipeline_on()
    buf = None

    def emit(dev, drop):
        nonlocal buf
        new = np.asarray(dev).T
        if drop:
            new = new[:, drop:]
        if buf is None:
            buf = np.zeros((new.shape[0], 0), new.dtype)
        if new.shape[1]:
            buf = np.concatenate([buf, new], axis=1)
        while buf.shape[1] >= chunk_steps:
            out, buf = buf[:, :chunk_steps], buf[:, chunk_steps:]
            yield out

    pending = None
    for dev, drop in dev_chunks:
        _host_async(dev)
        if not pipelined:
            yield from emit(dev, drop)
            continue
        if pending is not None:
            yield from emit(*pending)
        pending = (dev, drop)


def stream_tokens(
    net,
    prompts: Tuple,
    chunk_steps: int,
    temperature=None,
    rng=None,
) -> Iterator:
    """Yield ``(B, chunk_steps)`` generated items forever.

    Dispatches to ``net.stream`` when the network implements an exact
    state-carrying stream (SampleRNN's fused chunked decoder); otherwise
    re-feeds the last ``rf + 1`` outputs as the next prompt — identical
    to the reference's chunked generation semantics.
    """
    if hasattr(net, "stream"):
        yield from net.stream(
            prompts, chunk_steps, temperature=temperature, rng=rng
        )
        return
    yield from _refeed_stream(net, prompts[0], chunk_steps, temperature, rng)


def stream_audio(
    net,
    prompts: Tuple,
    chunk_steps: int,
    temperature=None,
    rng=None,
    inv=None,
) -> Iterator[np.ndarray]:
    """Like :func:`stream_tokens` but each chunk is inverse-transformed to
    float audio (host numpy) with the IOSpec target's ``inv`` —
    MuLawExpand for discrete-audio models, GLA for magspec models."""
    if inv is None:
        inv = net.config.io_spec.targets[0].inv
    for chunk in stream_tokens(
        net, prompts, chunk_steps, temperature=temperature, rng=rng
    ):
        yield np.asarray(inv(np.asarray(chunk)))
