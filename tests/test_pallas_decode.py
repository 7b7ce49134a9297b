"""Fused Pallas SampleRNN decode vs the lax.scan decoder.

The kernel runs in interpreter mode on the CPU backend, where its argmax
path must produce token-for-token identical output to the scan decoder
(same weights, same prompt).  On a real TPU the two lowerings differ only
by MXU rounding (near-tie argmax flips in adjacent mu-law bins); the
sampled path additionally uses the on-chip PRNG and is TPU-only.
"""
import os

import numpy as np
import pytest

import mimikit_tpu as mmk


def _net(frame_sizes=(8, 4, 2), hidden=16, q=32):
    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=q, mlp_dim=hidden))
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=frame_sizes, hidden_dim=hidden, io_spec=io)
    )
    net.seed(0)
    return net


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")


@pytest.mark.parametrize("frame_sizes", [(8, 4, 2), (4, 4), (16, 4, 4)])
def test_pallas_argmax_matches_scan_exactly(force_pallas, monkeypatch, frame_sizes):
    net = _net(frame_sizes=frame_sizes)
    q = 32
    prompts = (
        np.random.randint(0, q, (2, 2 * frame_sizes[0])).astype(np.int32),
    )
    net._ensure_params(prompts)
    assert net._use_pallas_decode(
        2, prompts[0].shape[1], 60, argmax=True
    ), "pallas gate refused a supported config"
    a = np.asarray(net.generate(prompts, n_steps=60, temperature=None)[0])
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    b = np.asarray(net.generate(prompts, n_steps=60, temperature=None)[0])
    assert np.array_equal(a, b)


def test_pallas_gate_rejects_unsupported_configs(force_pallas):
    # embedding input modules are not in the fused kernel's scope
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    )
    from mimikit_tpu.ops.pallas_decode import supports_pallas_decode

    assert not supports_pallas_decode(net)

    # GRU tiers fall back too
    io2 = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net2 = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(8, 4, 2), hidden_dim=16, rnn_class="gru", io_spec=io2
        )
    )
    assert not supports_pallas_decode(net2)


def test_pallas_gate_respects_vmem_budget(force_pallas):
    net = _net()
    prompts = (np.random.randint(0, 32, (1, 16)).astype(np.int32),)
    net._ensure_params(prompts)
    # large generations chunk instead of falling back...
    assert net._pallas_mode(512, 16, 1 << 20) == "chunked"
    # ...but a stream batch whose STATE outgrows VMEM must fall back
    assert net._use_pallas_decode(1 << 20, 16, 64, argmax=True) is False


def test_pallas_sampled_path_is_tpu_only(force_pallas):
    """On the CPU backend the sampled (PRNG) path must route to the scan
    decoder even when the flag forces pallas."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend-specific gate")
    net = _net()
    assert not net._use_pallas_decode(2, 16, 60, argmax=False)
    prompts = (np.random.randint(0, 32, (2, 16)).astype(np.int32),)
    out = net.generate(prompts, n_steps=20, temperature=0.9)
    assert np.asarray(out[0]).shape == (2, 36)


@pytest.mark.parametrize("blocks", [(3,), (2, 2)])
def test_pallas_wavenet_argmax_matches_scan_exactly(
    force_pallas, monkeypatch, blocks
):
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io, blocks=blocks, dims_dilated=(16,), skips_dim=16,
            residuals_dim=16, pad_side=0,
        )
    )
    net.seed(0)
    rf = net.rf
    prompts = (np.random.randint(0, 32, (2, rf + 4)).astype(np.int32),)
    net._ensure_params(prompts)
    assert net._use_pallas_decode(2, rf + 4, 30, argmax=True)
    a = np.asarray(net.generate(prompts, n_steps=30, temperature=None)[0])
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    b = np.asarray(net.generate(prompts, n_steps=30, temperature=None)[0])
    assert np.array_equal(a, b)


def test_pallas_wavenet_gate_rejects_unsupported(force_pallas):
    from mimikit_tpu.ops.pallas_decode import supports_pallas_wavenet

    # tied io weights are out of scope
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io, blocks=(3,), dims_dilated=(16,), skips_dim=16,
            residuals_dim=16, tie_io_weights=True,
        )
    )
    assert not supports_pallas_wavenet(net)

    # no skips -> head reads the dilated path, unsupported
    io2 = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net2 = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(io_spec=io2, blocks=(3,), dims_dilated=(16,))
    )
    assert not supports_pallas_wavenet(net2)


def test_pallas_wavenet_chunked_matches_scan_exactly(
    force_pallas, monkeypatch
):
    """The state-carrying WaveNet kernel (large-dilation rings in HBM,
    DMA-streamed one row per step) must agree with the scan decoder
    token-for-token across chunk boundaries AND a partial last chunk."""
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
    rf = net.rf
    B, n_steps = 4, 50
    prompts = (np.random.randint(0, 32, (B, rf + 3)).astype(np.int32),)
    net._ensure_params(prompts)
    # force the chunked mode with the d=4,8 rings in HBM and several
    # chunks (incl. a partial one) over the 50 generated steps
    monkeypatch.setattr(
        mmk.WaveNet, "_CHUNK_VMEM_RING_BUDGET", 4 * B * 16 * 3 + 1
    )
    monkeypatch.setattr(mmk.WaveNet, "_PALLAS_CHUNK", 16)
    monkeypatch.setattr(mmk.WaveNet, "_PALLAS_CHUNK_MIN", 2)
    monkeypatch.setattr(mmk.WaveNet, "_PALLAS_CHUNKED_MIN_B", 2)
    assert net._pallas_mode(B, rf + 3, n_steps) == "chunked"
    assert net._chunked_ring_split(B) == (False, False, True, True)
    a = np.asarray(net.generate(prompts, n_steps=n_steps, temperature=None)[0])
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    b = np.asarray(net.generate(prompts, n_steps=n_steps, temperature=None)[0])
    assert np.array_equal(a, b)


def test_pallas_wavenet_chunked_ring_split_guards(force_pallas, monkeypatch):
    """A budget too small for the d<4 rings must reject the chunked plan
    (the kernel's DMA hazard window needs d >= 4 for HBM rings)."""
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io, blocks=(3,), dims_dilated=(16,), skips_dim=16,
            residuals_dim=16, pad_side=0,
        )
    )
    prompts = (np.random.randint(0, 32, (2, net.rf + 2)).astype(np.int32),)
    net._ensure_params(prompts)
    monkeypatch.setattr(mmk.WaveNet, "_CHUNK_VMEM_RING_BUDGET", 0)
    assert net._chunked_ring_split(4) is None


def test_pallas_chunked_matches_scan_exactly(force_pallas, monkeypatch):
    """The state-carrying chunked kernel (large-batch path) must agree with
    the scan decoder across chunk boundaries."""
    net = _net()
    net._PALLAS_CHUNK = 16  # force several chunks over 50 steps
    monkeypatch.setattr(
        type(net), "_pallas_mode", lambda self, B, p, n: "chunked"
    )
    prompts = (np.random.randint(0, 32, (2, 16)).astype(np.int32),)
    net._ensure_params(prompts)
    a = np.asarray(net.generate(prompts, n_steps=50, temperature=None)[0])
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    b = np.asarray(net.generate(prompts, n_steps=50, temperature=None)[0])
    assert np.array_equal(a, b)


# -- SimpleTransformer --------------------------------------------------------

def _transformer(fln=True, n_heads=4, q=32):
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=q, mlp_dim=16, n_mlp_layers=1,
            input_module_type="embedding",
        )
    )
    tr = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=io, model_dim=32, n_heads=n_heads, feedforward_dim=64,
            num_layers=2, rf=16, with_layer_norm=fln,
        )
    )
    tr.seed(0)
    return tr


def _jitter_params(tr, scale=0.5):
    """Random-init transformers collapse to one argmax token; jittering the
    weights makes the generated sequence non-degenerate so token equality
    actually exercises attention/LN/FFN parity."""
    import jax

    leaves, tree = jax.tree_util.tree_flatten(tr.params)
    ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    tr.params = jax.tree_util.tree_unflatten(
        tree,
        [l + jax.random.normal(k, l.shape) * scale for l, k in zip(leaves, ks)],
    )


@pytest.mark.parametrize("fln,n_heads,B", [(True, 4, 2), (False, 2, 1)])
def test_pallas_transformer_argmax_matches_scan_exactly(
    force_pallas, monkeypatch, fln, n_heads, B
):
    import jax

    tr = _transformer(fln=fln, n_heads=n_heads)
    prompts = (np.random.randint(0, 32, (B, 16)).astype(np.int32),)
    tr._ensure_params(prompts)
    _jitter_params(tr)
    if B == 1:
        assert tr._use_pallas_decode(B, 16, 40, argmax=True), (
            "pallas gate refused a supported transformer config"
        )
        a = np.asarray(
            tr.generate(prompts, n_steps=40, temperature=None,
                        rng=jax.random.PRNGKey(1))[0]
        )
    else:
        # B>1 routes to the scan in production (the kernel's per-stream
        # loop loses there) — still pin the kernel's multi-stream parity
        a = np.asarray(
            tr._pallas_generate(prompts, 40, None, jax.random.PRNGKey(1))[0]
        )
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    tr._decoders.clear()
    b = np.asarray(
        tr.generate(prompts, n_steps=40, temperature=None,
                    rng=jax.random.PRNGKey(1))[0]
    )
    assert len(set(a[0, 16:].tolist())) > 1 or fln is False
    assert np.array_equal(a, b)


def test_pallas_transformer_gate(force_pallas):
    from mimikit_tpu.ops.pallas_decode import supports_pallas_transformer

    tr = _transformer()
    assert supports_pallas_transformer(tr)
    # framed-linear input (JukeBox-style conv IO) is out of kernel scope
    io2 = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    srnn = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io2)
    )
    assert not supports_pallas_transformer(srnn)
    # sub-window prompts route to the KV-cache decoder, not the kernel
    prompts = (np.random.randint(0, 32, (1, 16)).astype(np.int32),)
    tr._ensure_params(prompts)
    assert not tr._use_pallas_decode(1, 8, 40, argmax=True)
    # an activation working set past scoped VMEM falls back to the scan
    assert not tr._use_pallas_decode(1 << 16, 16, 40, argmax=True)


def test_pallas_runtime_failure_falls_back_to_scan(monkeypatch):
    """A kernel that fails at compile/run time on device must disable the
    fused path for that net and route the SAME call to the scan decoder."""
    monkeypatch.setenv("MMK_PALLAS_DECODE", "auto")
    net = _net()
    prompts = (np.random.randint(0, 32, (2, 16)).astype(np.int32),)
    net._ensure_params(prompts)

    def boom(*a, **k):
        raise RuntimeError("mosaic said no")

    monkeypatch.setattr(type(net), "_pallas_generate", boom)
    # force the router into the pallas branch despite the CPU backend
    monkeypatch.setattr(
        type(net), "_use_pallas_decode",
        lambda self, *a, **k: not getattr(self, "_pallas_disabled", False),
    )
    with pytest.warns(UserWarning, match="falling back to the scan"):
        out = net.generate(prompts, n_steps=20, temperature=None)
    assert np.asarray(out[0]).shape == (2, 36)
    assert net._pallas_disabled

    # forced interpret mode (how the parity tests run) re-raises instead
    net2 = _net()
    net2._ensure_params(prompts)
    monkeypatch.setenv("MMK_PALLAS_DECODE", "1")
    monkeypatch.setattr(type(net2), "_pallas_generate", boom)
    monkeypatch.setattr(
        type(net2), "_use_pallas_decode", lambda self, *a, **k: True
    )
    with pytest.raises(RuntimeError, match="mosaic said no"):
        net2.generate(prompts, n_steps=20, temperature=None)


def test_pallas_bf16_weight_mode_decodes(force_pallas, monkeypatch):
    """MMK_PALLAS_BF16=1 packs the weights bf16 and runs MXU-native bf16
    dots; the argmax path must still produce valid tokens that agree with
    the f32 kernel away from bf16-rounding near-ties."""
    monkeypatch.setenv("MMK_PALLAS_BF16", "1")
    net = _net()
    prompts = (np.random.randint(0, 32, (2, 16)).astype(np.int32),)
    net._ensure_params(prompts)
    a = np.asarray(net.generate(prompts, n_steps=40, temperature=None)[0])
    assert a.shape == (2, 56)
    assert a.min() >= 0 and a.max() < 32
    monkeypatch.setenv("MMK_PALLAS_BF16", "0")
    b = np.asarray(net.generate(prompts, n_steps=40, temperature=None)[0])
    agree = float((a == b).mean())
    assert agree > 0.5, f"bf16 tokens diverged wholesale: {agree}"


def test_batch_split_pallas_matches_scan_exactly(force_pallas, monkeypatch):
    """A batch wider than the kernel's VMEM envelope decodes as pipelined
    sub-batch kernel dispatches (streams are independent) — argmax tokens
    must equal the scan decoder's for the whole batch."""
    net = _net()
    B, prior_t, n_steps = 8, 16, 40
    prompts = (np.random.randint(0, 32, (B, prior_t)).astype(np.int32),)
    net._ensure_params(prompts)

    real_mode = type(net)._pallas_mode
    monkeypatch.setattr(
        type(net),
        "_pallas_mode",
        lambda self, b, p, n: None if b > 2 else real_mode(self, b, p, n),
    )
    monkeypatch.setattr(type(net), "_PALLAS_CHUNKED_MIN_B", 1)
    assert not net._use_pallas_decode(B, prior_t, n_steps, argmax=True)
    assert net._pallas_batch_split(B, prior_t, n_steps, argmax=True) == 2
    a = np.asarray(net.generate(prompts, n_steps=n_steps, temperature=None)[0])

    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    b = np.asarray(net.generate(prompts, n_steps=n_steps, temperature=None)[0])
    assert a.shape == b.shape == (B, prior_t + n_steps)
    assert np.array_equal(a, b)


def test_wavenet_batch_split_pallas_matches_scan_exactly(
    force_pallas, monkeypatch
):
    """A WaveNet batch past the kernel's dilation-ring VMEM envelope
    decodes as pipelined per-slice fused dispatches — argmax tokens must
    equal the scan decoder's for the whole batch."""
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io, blocks=(3,), dims_dilated=(16,), skips_dim=16,
            residuals_dim=16, pad_side=0,
        )
    )
    net.seed(0)
    rf = net.rf
    B, prior_t, n_steps = 8, rf + 4, 30
    prompts = (np.random.randint(0, 32, (B, prior_t)).astype(np.int32),)
    net._ensure_params(prompts)

    real_gate = type(net)._use_pallas_decode
    monkeypatch.setattr(
        type(net),
        "_use_pallas_decode",
        lambda self, b, p, n, argmax=True: (
            b <= 2 and real_gate(self, b, p, n, argmax=argmax)
        ),
    )
    monkeypatch.setattr(type(net), "_PALLAS_SPLIT_MIN_B", 1)
    assert net._pallas_batch_split(B, prior_t, n_steps, argmax=True) == 2
    a = np.asarray(net.generate(prompts, n_steps=n_steps, temperature=None)[0])

    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    b = np.asarray(net.generate(prompts, n_steps=n_steps, temperature=None)[0])
    assert a.shape == b.shape == (B, prior_t + n_steps)
    assert np.array_equal(a, b)


def _jukebox(q=32, frame_sizes=(8, 4, 2), rf=16):
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=q, mlp_dim=16, n_mlp_layers=1)
    )
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=io, frame_sizes=frame_sizes, model_dim=32, n_heads=4,
            feedforward_dim=64, num_layers=2, rf=rf, input_dropout=0.0,
        )
    )
    jb.seed(0)
    return jb


@pytest.mark.parametrize(
    "frame_sizes,B", [((8, 4, 2), 1), ((8, 2), 1), ((8, 4, 2), 2), ((8, 4, 2), 4)]
)
def test_pallas_jukebox_argmax_matches_window_scan_exactly(
    force_pallas, monkeypatch, frame_sizes, B
):
    import jax

    jb = _jukebox(frame_sizes=frame_sizes)
    W = jb._window_len()
    prompts = (np.random.randint(0, 32, (B, W)).astype(np.int32),)
    jb._ensure_params(prompts)
    _jitter_params(jb, scale=0.3)
    # batched streams run the fused kernel too (frame-major rows +
    # stream×head block-diagonal attention) — the gate accepts them
    assert jb._use_pallas_decode(B, W, 40, argmax=True), (
        "pallas gate refused a supported jukebox config"
    )
    a = np.asarray(
        jb.generate(prompts, n_steps=40, temperature=None,
                    rng=jax.random.PRNGKey(1))[0]
    )
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    jb._decoders.clear()
    b = np.asarray(
        jb.generate(prompts, n_steps=40, temperature=None,
                    rng=jax.random.PRNGKey(1))[0]
    )
    assert a.shape == b.shape == (B, W + 40)
    assert np.array_equal(a, b)
    if len(frame_sizes) > 2:
        # the 3-tier config must be non-degenerate for the equality to
        # actually exercise the tier pyramid (a 2-tier 1-frame toy can
        # legitimately collapse to a constant argmax token)
        assert len(set(a[0, W:].tolist())) > 1


def test_pallas_jukebox_short_prompt_pads_like_the_scan(
    force_pallas, monkeypatch
):
    import jax

    jb = _jukebox()
    W = jb._window_len()
    prompts = (np.random.randint(0, 32, (1, W // 2)).astype(np.int32),)
    jb._ensure_params(prompts)
    _jitter_params(jb, scale=0.3)
    a = np.asarray(
        jb.generate(prompts, n_steps=24, temperature=None,
                    rng=jax.random.PRNGKey(3))[0]
    )
    monkeypatch.setenv("MMK_PALLAS_DECODE", "0")
    jb._decoders.clear()
    b = np.asarray(
        jb.generate(prompts, n_steps=24, temperature=None,
                    rng=jax.random.PRNGKey(3))[0]
    )
    assert a.shape == b.shape == (1, W // 2 + 24)
    assert np.array_equal(a, b)


def test_pallas_jukebox_gate(force_pallas):
    from mimikit_tpu.ops.pallas_decode import supports_pallas_jukebox

    jb = _jukebox()
    assert supports_pallas_jukebox(jb)
    # ref_compat scrambles the bottom resampler — out of kernel scope
    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    jb_rc = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=io, frame_sizes=(8, 4, 2), model_dim=32, n_heads=4,
            feedforward_dim=64, num_layers=1, rf=16, ref_compat=True,
        )
    )
    assert not supports_pallas_jukebox(jb_rc)
    prompts = (np.random.randint(0, 32, (1, 16)).astype(np.int32),)
    jb._ensure_params(prompts)
    # moderate stream batches run the fused kernel; a batch whose
    # block-diagonal attention working set outgrows scoped VMEM must
    # fall back to the window scan
    assert jb._use_pallas_decode(4, 16, 40, argmax=True)
    assert not jb._use_pallas_decode(1 << 14, 16, 40, argmax=True)
