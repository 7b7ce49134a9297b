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

from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["stream_tokens", "stream_audio"]


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
    while True:
        rng, sub = jax.random.split(rng)
        out = net.generate(
            (buf,), n_steps=chunk_steps, temperature=temperature, rng=sub
        )[0]
        # host numpy so chunk arrival == completion for every path (a lazy
        # device array would make downstream latency accounting dishonest)
        new = np.asarray(out[:, buf.shape[1] :])
        yield new
        buf = out[:, -window:]


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
