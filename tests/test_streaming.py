"""Streaming generation: bounded-latency chunks, exact continuation.

The fused SampleRNN stream carries decode state across kernel calls, so the
concatenated chunks must be token-identical to one long decode.  WaveNet's
window-refeed fallback is also exact because its decode state is fully
determined by the last rf samples.
"""
import itertools
import os

import numpy as np
import pytest

import mimikit_tpu as mmk


def _mulaw_io(q=64, mlp=16, emb=False):
    kw = dict(sr=16000, q_levels=q, mlp_dim=mlp)
    if emb:
        kw["input_module_type"] = "embedding"
    return mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(**kw))


def test_samplernn_stream_matches_long_decode_exactly(monkeypatch):
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")  # interpret-mode kernel
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=_mulaw_io()
        )
    )
    net.seed(0)
    B, prior_t, chunk = 2, 8, 16
    n_chunks = 3
    prompt = np.random.RandomState(0).randint(
        0, 64, (B, prior_t)
    ).astype(np.int32)
    net.init_params(batch_size=B, batch_length=32)

    import jax

    rng = jax.random.PRNGKey(7)
    chunks = list(
        itertools.islice(
            net.stream((prompt,), chunk, temperature=None, rng=rng), n_chunks
        )
    )
    assert all(c.shape == (B, chunk) for c in chunks)
    streamed = np.concatenate(chunks, axis=1)

    long = np.asarray(
        net.generate(
            (prompt,), n_steps=n_chunks * chunk, temperature=None, rng=rng
        )[0]
    )[:, prior_t:]
    np.testing.assert_array_equal(streamed, long)


def test_wavenet_chunked_stream_matches_long_decode_exactly(monkeypatch):
    """The fused chunked WaveNet stream carries the dilation rings
    on-device across yields: argmax chunks must equal one long decode
    token-for-token (incl. HBM-ring layers and chunk sizes that do not
    divide the yield size)."""
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")  # interpret-mode kernel
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io, blocks=(4,), dims_dilated=(16,), skips_dim=16,
            residuals_dim=16, pad_side=0,
        )
    )
    net.seed(0)
    B, chunk, n_chunks = 4, 10, 3
    prior_t = net.rf + 2
    monkeypatch.setattr(
        mmk.WaveNet, "_CHUNK_VMEM_RING_BUDGET", 4 * B * 16 * 3 + 1
    )
    monkeypatch.setattr(mmk.WaveNet, "_PALLAS_CHUNK", 16)
    monkeypatch.setattr(mmk.WaveNet, "_PALLAS_CHUNK_MIN", 8)
    monkeypatch.setattr(mmk.WaveNet, "_PALLAS_CHUNKED_MIN_B", 2)
    prompt = np.random.RandomState(0).randint(
        0, 32, (B, prior_t)
    ).astype(np.int32)
    net.init_params(batch_size=B, batch_length=32)
    assert net._pallas_mode(B, prior_t, chunk) == "chunked"

    import jax

    rng = jax.random.PRNGKey(7)
    chunks = list(
        itertools.islice(
            net.stream((prompt,), chunk, temperature=None, rng=rng), n_chunks
        )
    )
    assert all(c.shape == (B, chunk) for c in chunks)
    streamed = np.concatenate(chunks, axis=1)
    long = np.asarray(
        net.generate(
            (prompt,), n_steps=n_chunks * chunk, temperature=None, rng=rng
        )[0]
    )[:, prior_t:]
    np.testing.assert_array_equal(streamed, long)


def test_wavenet_refeed_stream_matches_long_decode_exactly():
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=_mulaw_io(emb=True), blocks=(3,), dims_dilated=(16,),
            skips_dim=None, residuals_dim=None, pad_side=0,
        )
    )
    net.seed(0)
    B, chunk, n_chunks = 2, 12, 3
    prior_t = net.rf + 1
    prompt = np.random.RandomState(1).randint(
        0, 64, (B, prior_t)
    ).astype(np.int32)
    net.init_params(batch_size=B, batch_length=net.rf + 4)

    chunks = list(
        itertools.islice(
            mmk.stream_tokens(net, (prompt,), chunk, temperature=None),
            n_chunks,
        )
    )
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    long = np.asarray(
        net.generate((prompt,), n_steps=n_chunks * chunk, temperature=None)[0]
    )[:, prior_t:]
    np.testing.assert_array_equal(streamed, long)


def test_transformer_kv_ring_stream(monkeypatch):
    """MMK_DECODE_KV=1 streams via the O(1)-per-step KV-ring decoder
    (PARITY #10).  Pins: (a) the FIRST prediction from an rf-length prompt
    equals the window decoder's exactly (same attention set, same PE);
    (b) the stream is chunk-size invariant (the carried ring state is
    exact across yields)."""
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=io, model_dim=32, n_heads=4, feedforward_dim=64,
            num_layers=2, rf=16, input_dropout=0.0,
        )
    )
    net.seed(0)
    B, rf = 2, 16
    prompt = np.random.RandomState(3).randint(0, 32, (B, rf)).astype(np.int32)
    net.init_params(batch_size=B, batch_length=rf)

    win_first = np.asarray(
        net.generate((prompt,), n_steps=1, temperature=None)[0]
    )[:, rf]

    import jax

    monkeypatch.setenv("MMK_DECODE_KV", "1")
    rng = jax.random.PRNGKey(5)
    s1 = net.stream((prompt,), 5, temperature=None, rng=rng)
    chunks5 = [next(s1) for _ in range(4)]
    assert all(c.shape == (B, 5) for c in chunks5)
    seq5 = np.concatenate(chunks5, axis=1)
    np.testing.assert_array_equal(seq5[:, 0], win_first)  # anchor (a)

    s2 = net.stream((prompt,), 8, temperature=None, rng=rng)
    seq8 = np.concatenate([next(s2) for _ in range(3)], axis=1)
    n = min(seq5.shape[1], seq8.shape[1])
    np.testing.assert_array_equal(seq5[:, :n], seq8[:, :n])  # invariance (b)


def test_stream_audio_yields_float_audio():
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=_mulaw_io()
        )
    )
    net.seed(0)
    B, prior_t, chunk = 2, 8, 10
    prompt = np.random.RandomState(2).randint(
        0, 64, (B, prior_t)
    ).astype(np.int32)
    net.init_params(batch_size=B, batch_length=16)
    first = next(
        iter(mmk.stream_audio(net, (prompt,), chunk, temperature=0.9))
    )
    assert first.shape == (B, chunk)
    assert first.dtype.kind == "f"
    assert np.all(np.abs(first) <= 1.0 + 1e-6)


def test_seq2seq_refeed_stream_matches_long_decode_exactly():
    """Seq2seq decode state is window-determined (hidden is per-block), so
    the re-feed stream continues exactly when chunks align to hop blocks."""
    io = mmk.IOSpec.magspec_io(
        mmk.IOSpec.MagSpecIOConfig(sr=16000, n_fft=256, hop_length=64)
    )
    s2s = mmk.Seq2SeqLSTMNetwork.from_config(
        mmk.Seq2SeqLSTMNetwork.Config(io_spec=io, model_dim=16, hop=4)
    )
    B, chunk, n_chunks = 2, 8, 3  # chunk % hop == 0 -> block-aligned
    prior_t = 6
    frames = np.abs(np.random.RandomState(3).randn(B, prior_t, 129)).astype(
        np.float32
    )
    s2s.init_params(batch_size=B)
    chunks = list(
        itertools.islice(
            mmk.stream_tokens(s2s, (frames,), chunk, temperature=None),
            n_chunks,
        )
    )
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    long = np.asarray(
        s2s.generate((frames,), n_steps=n_chunks * chunk, temperature=None)[0]
    )[:, prior_t:]
    np.testing.assert_allclose(streamed, long, rtol=1e-5, atol=1e-6)


def test_jukebox_refeed_stream_matches_long_decode_exactly():
    """JukeBox's sliding-window decode rounds rf (12) up to a framing
    window (16): the stream must re-feed that whole window, not rf+1 —
    zero-padding the extra history diverges from one long decode."""
    io = _mulaw_io(mlp=32)
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=io, frame_sizes=(8, 4, 2), model_dim=32, n_heads=4,
            feedforward_dim=64, num_layers=1, rf=12, input_dropout=0.0,
        )
    )
    jb.seed(0)
    assert jb._window_len() > jb.rf  # the case under test
    B, chunk, n_chunks = 2, 8, 4
    prompt = np.random.RandomState(0).randint(0, 64, (B, 24)).astype(np.int32)
    jb._ensure_params((prompt,))
    chunks = list(
        itertools.islice(
            mmk.stream_tokens(jb, (prompt,), chunk, temperature=None),
            n_chunks,
        )
    )
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    long = np.asarray(
        jb.generate((prompt,), n_steps=n_chunks * chunk, temperature=None)[0]
    )[:, 24:]
    np.testing.assert_array_equal(streamed, long)


@pytest.mark.parametrize("B", [1, 2])
def test_jukebox_fused_stream_matches_long_decode_exactly(monkeypatch, B):
    """The fused JukeBox stream carries the (B, W) token window across
    kernel calls on-device (carry_window=True): the concatenated argmax
    chunks must equal one long fused decode token-for-token."""
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")  # interpret-mode kernel
    io = _mulaw_io(mlp=32)
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=io, frame_sizes=(8, 4, 2), model_dim=32, n_heads=4,
            feedforward_dim=64, num_layers=1, rf=16, input_dropout=0.0,
        )
    )
    jb.seed(0)
    W = jb._window_len()
    chunk, n_chunks = 8, 3
    prompt = np.random.RandomState(4).randint(0, 64, (B, W)).astype(np.int32)
    jb._ensure_params((prompt,))

    import jax

    rng = jax.random.PRNGKey(11)
    assert jb._use_pallas_decode(B, W, chunk, argmax=True)
    chunks = list(
        itertools.islice(
            jb.stream((prompt,), chunk, temperature=None, rng=rng), n_chunks
        )
    )
    assert all(c.shape == (B, chunk) for c in chunks)
    streamed = np.concatenate(chunks, axis=1)

    long = np.asarray(
        jb.generate(
            (prompt,), n_steps=n_chunks * chunk, temperature=None, rng=rng
        )[0]
    )[:, W:]
    np.testing.assert_array_equal(streamed, long)


def test_stream_auto_initializes_params(monkeypatch):
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=_mulaw_io()
        )
    )
    net.seed(0)
    assert net.params is None
    prompt = np.random.RandomState(3).randint(0, 64, (2, 8)).astype(np.int32)
    chunk = next(iter(net.stream((prompt,), 8, temperature=None)))
    assert chunk.shape == (2, 8)
    assert net.params is not None


def test_samplernn_batch_split_stream_matches_long_decode(monkeypatch):
    """A stream batch past the fused kernel's VMEM envelope zips per-slice
    fused streams, each carrying exact on-chip state — the concatenation
    must still be token-identical to one long decode."""
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=_mulaw_io()
        )
    )
    net.seed(0)
    B, prior_t, chunk, n_chunks = 4, 8, 16, 2
    prompt = np.random.RandomState(5).randint(0, 64, (B, prior_t)).astype(
        np.int32
    )
    net.init_params(batch_size=B, batch_length=32)

    real_mode = type(net)._pallas_mode
    monkeypatch.setattr(
        type(net),
        "_pallas_mode",
        lambda self, b, p, n: None if b > 2 else real_mode(self, b, p, n),
    )
    monkeypatch.setattr(type(net), "_PALLAS_CHUNKED_MIN_B", 1)
    chunks = list(
        itertools.islice(
            net.stream((prompt,), chunk, temperature=None), n_chunks
        )
    )
    assert all(c.shape == (B, chunk) for c in chunks)
    streamed = np.concatenate(chunks, axis=1)

    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    long = np.asarray(
        net.generate(
            (prompt,), n_steps=n_chunks * chunk, temperature=None
        )[0]
    )[:, prior_t:]
    np.testing.assert_array_equal(streamed, long)


def test_jukebox_stream_falls_back_exactly_on_kernel_failure(monkeypatch):
    """An ungated Mosaic failure in the fused stream path (construction or
    first chunk) must degrade to the exact window re-feed, not crash the
    serving loop (same contract as generate's pallas_generate_or_fallback).
    Simulated by making the kernel factory raise."""
    io = _mulaw_io(mlp=32)
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=io, frame_sizes=(8, 4, 2), model_dim=32, n_heads=4,
            feedforward_dim=64, num_layers=1, rf=16, input_dropout=0.0,
        )
    )
    jb.seed(0)
    W = jb._window_len()
    B, chunk, n_chunks = 1, 8, 3
    prompt = np.random.RandomState(4).randint(0, 64, (B, W)).astype(np.int32)
    jb._ensure_params((prompt,))

    import jax

    from mimikit_tpu.ops import pallas_decode

    def boom(*a, **k):
        raise RuntimeError("simulated Mosaic failure")

    # route the stream ONTO the fused path, then blow up its kernel factory
    # (MMK_PALLAS_DECODE=1 would re-raise by design — tests must see real
    # kernel bugs — so force routing via the instance gate instead)
    monkeypatch.setattr(jb, "_use_pallas_decode", lambda *a, **k: True)
    monkeypatch.setattr(pallas_decode, "make_jukebox_pallas_decoder", boom)

    rng = jax.random.PRNGKey(11)
    with pytest.warns(UserWarning, match="falling back to window re-feeding"):
        chunks = list(
            itertools.islice(
                jb.stream((prompt,), chunk, temperature=None, rng=rng),
                n_chunks,
            )
        )
    assert jb._pallas_disabled
    streamed = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    long = np.asarray(
        jb.generate((prompt,), n_steps=n_chunks * chunk, temperature=None)[0]
    )[:, W:]
    np.testing.assert_array_equal(streamed, long)


@pytest.mark.parametrize("B", [1, 2, 8])
def test_transformer_kv_fused_kernel_matches_oracle(monkeypatch, B):
    """The fused KV-ring Pallas kernel (interpret mode on CPU) is
    token-identical to the pure-jax KV-ring scan under argmax, at two
    chunk sizes (the carried ring state is exact across kernel calls).
    B=8 exercises the SLOT-MAJOR ring layout (B % 8 == 0 and power-of-2
    rf: one B-row ring store per layer + tree-reduction softmax —
    ops/pallas_decode.py round-5 wide-batch path)."""
    import jax

    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=io, model_dim=128, n_heads=4, feedforward_dim=64,
            num_layers=2, rf=16, input_dropout=0.0,
        )
    )
    net.seed(0)
    rf = 16
    prompt = np.random.RandomState(3).randint(
        0, 32, (B, rf)
    ).astype(np.int32)
    net.init_params(batch_size=B, batch_length=rf)

    monkeypatch.setenv("MMK_DECODE_KV", "1")
    rng = jax.random.PRNGKey(5)

    # 10 x 7 = 70 tokens > C=64 -> the SECOND kernel call runs too, so
    # the ring state carried across kernel calls is exercised
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    assert not net._use_pallas_kv(B, True)
    s0 = net.stream((prompt,), 7, temperature=None, rng=rng)
    ref = np.concatenate([next(s0) for _ in range(10)], axis=1)

    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")
    assert net._use_pallas_kv(B, True)
    s1 = net.stream((prompt,), 7, temperature=None, rng=rng)
    got = np.concatenate([next(s1) for _ in range(10)], axis=1)
    np.testing.assert_array_equal(got, ref)

    # chunk-size invariance of the fused stream
    s2 = net.stream((prompt,), 9, temperature=None, rng=rng)
    got9 = np.concatenate([next(s2) for _ in range(2)], axis=1)
    n = min(got.shape[1], got9.shape[1])
    np.testing.assert_array_equal(got9[:, :n], got[:, :n])


def test_transformer_kv_fused_bf16_stream(monkeypatch):
    """MMK_DECODE_BF16=1 on the fused KV stream stores the weights in
    bfloat16 (f32 ring + accumulation — Mosaic rejects 1-row dynamic
    bf16 ring stores).  Tokens may drift from the f32 kernel (documented
    divergence, as on the window refeed) but the path must yield valid
    deterministic chunks, carry EXACT state across kernel calls
    (chunk-size invariance), and cache under a distinct decoder key."""
    import jax

    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=io, model_dim=128, n_heads=4, feedforward_dim=64,
            num_layers=2, rf=16, input_dropout=0.0,
        )
    )
    net.seed(0)
    B, rf = 2, 16
    prompt = np.random.RandomState(3).randint(
        0, 32, (B, rf)
    ).astype(np.int32)
    net.init_params(batch_size=B, batch_length=rf)

    monkeypatch.setenv("MMK_DECODE_KV", "1")
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")
    monkeypatch.setenv("MMK_DECODE_BF16", "1")
    rng = jax.random.PRNGKey(5)
    s1 = net.stream((prompt,), 7, temperature=None, rng=rng)
    # 10 x 7 = 70 > C=64 -> the second kernel call carries bf16 state
    got = np.concatenate([next(s1) for _ in range(10)], axis=1)
    assert got.shape == (B, 70)
    assert got.min() >= 0 and got.max() < 32

    # deterministic + chunk-size invariant (exact bf16 state carry)
    s2 = net.stream((prompt,), 9, temperature=None, rng=rng)
    got9 = np.concatenate([next(s2) for _ in range(8)], axis=1)
    n = min(got.shape[1], got9.shape[1])
    np.testing.assert_array_equal(got9[:, :n], got[:, :n])

    # cached under a bf16-keyed decoder; the carried ring stays f32
    bf16_keys = [
        k for k in net._decoders
        if isinstance(k, tuple) and k[0] == "kvstream" and k[-1] is True
    ]
    assert bf16_keys
    import jax.numpy as jnp

    _, init_state = net._decoders[bf16_keys[0]]
    assert init_state()[1].dtype == jnp.float32


def test_stream_pipeline_opt_out_identical(monkeypatch):
    """The r5 read-behind pipeline (chunk k+1 dispatched before chunk
    k's host read) must be a pure latency optimization: the yielded
    chunks are identical with MMK_STREAM_PIPELINE=0, on both the fused
    state-carrying stream and the window-refeed fallback."""
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=_mulaw_io()
        )
    )
    net.seed(0)
    B, prior_t, chunk = 2, 8, 16
    prompt = np.random.RandomState(3).randint(
        0, 64, (B, prior_t)
    ).astype(np.int32)
    net.init_params(batch_size=B, batch_length=32)
    import jax

    def take(n):
        it = mmk.stream_tokens(
            net, (prompt,), chunk, temperature=None,
            rng=jax.random.PRNGKey(1),
        )
        return np.concatenate([next(it) for _ in range(n)], axis=1)

    on = take(4)
    monkeypatch.setenv("MMK_STREAM_PIPELINE", "0")
    off = take(4)
    np.testing.assert_array_equal(on, off)

    # refeed fallback (WaveNet path): same contract
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    monkeypatch.delenv("MMK_STREAM_PIPELINE")
    wn = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=_mulaw_io(emb=True), blocks=(3,), dims_dilated=(16,),
            skips_dim=16, residuals_dim=16, pad_side=0,
        )
    )
    wn.seed(0)
    wprompt = np.random.RandomState(4).randint(
        0, 64, (B, wn.rf + 1)
    ).astype(np.int32)
    wn.init_params(batch_size=B, batch_length=wn.rf + 2)

    def take_wn(n):
        it = mmk.stream_tokens(
            wn, (wprompt,), 8, temperature=None,
            rng=jax.random.PRNGKey(2),
        )
        return np.concatenate([next(it) for _ in range(n)], axis=1)

    on = take_wn(3)
    monkeypatch.setenv("MMK_STREAM_PIPELINE", "0")
    off = take_wn(3)
    np.testing.assert_array_equal(on, off)
