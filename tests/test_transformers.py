"""SimpleTransformer + JukeBox shapes and generation."""
import numpy as np
import pytest

import mimikit_tpu as mmk


def small_io(q=32):
    return mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=q, mlp_dim=16, input_module_type="embedding"
        )
    )


def test_simple_transformer_shapes():
    cfg = mmk.SimpleTransformer.Config(
        io_spec=small_io(), model_dim=32, n_heads=4, feedforward_dim=64,
        num_layers=2, rf=16,
    )
    tr = mmk.SimpleTransformer.from_config(cfg)
    x = np.random.randint(0, 32, (2, 16))
    out = tr.forward((x,))
    assert out[0].shape == (2, 16, 32)
    tr.eval()
    out_e = tr.forward((x,), temperature=0.7)
    assert out_e[0].shape == (2, 1)


def test_transformer_train_batch_shift():
    cfg = mmk.SimpleTransformer.Config(io_spec=small_io(), rf=16)
    tr = mmk.SimpleTransformer.from_config(cfg)
    inputs, targets = tr.train_batch(
        mmk.ItemSpec(0, 32, unit=mmk.Sample(16000))
    )
    assert targets[0].getter.shift == inputs[0].getter.shift + 1


def test_jukebox_shapes():
    cfg = mmk.JukeBox.Config(
        io_spec=mmk.IOSpec.mulaw_io(
            mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16)
        ),
        frame_sizes=(16, 8, 4),
        model_dim=32,
        n_heads=4,
        feedforward_dim=64,
        num_layers=1,
        rf=32,
    )
    jb = mmk.JukeBox.from_config(cfg)
    x = np.random.randint(0, 32, (2, 16 + 32))
    out = jb.forward((x,))
    assert out[0].shape == (2, 32, 32)
    jb.eval()
    out_e = jb.forward((x,), temperature=0.5)
    assert out_e[0].shape[0] == 2


def test_transformer_generate_loop(tmp_path):
    from .test_utils import make_db_config

    db = make_db_config(tmp_path, filename="tr-gen.h5").create(mode="w")
    tr = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=small_io(), model_dim=32, n_heads=4, feedforward_dim=64,
            num_layers=1, rf=16,
        )
    )
    loop = mmk.GenerateLoopV2.from_config(
        mmk.GenerateLoopV2.Config(
            prompts_length_sec=32 / 16000,
            output_duration_sec=16 / 16000,
            prompts_position_sec=(None,),
            batch_size=1,
            parameters=dict(temperature=1.0),
            display_waveform=False,
        ),
        db,
        tr,
    )
    ran = False
    for outputs in loop.run():
        ran = True
        assert outputs[0].shape[1] == 48
    assert ran


def jb_io():
    # JukeBox frames its inputs per tier: needs a framed input module,
    # not the plain per-sample embedding
    return mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))


def test_jukebox_weight_norm_reaches_every_site():
    """weight_norm must wrap tier inputs, up-samplers and output heads
    (reference transformers.py:222-231,349-354) — and init_params' default
    length must frame evenly at every tier."""
    import jax.tree_util as jtu

    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=jb_io(), frame_sizes=(8, 4, 2), model_dim=16,
            n_heads=2, feedforward_dim=32, num_layers=1, weight_norm=True,
            rf=16,
        )
    )
    params = jb.init_params(batch_size=1)
    paths = [
        "/".join(str(k.key) for k in kp)
        for kp, _ in jtu.tree_flatten_with_path(params)[0]
    ]
    scales = [p for p in paths if p.endswith("kernel/scale")]
    for site in ("tiers_0", "tiers_2", "up_sampler", "output_modules"):
        assert any(site in p for p in scales), f"no weight norm under {site}"

    # flag off -> no scale params anywhere
    jb2 = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=jb_io(), frame_sizes=(8, 4, 2), model_dim=16,
            n_heads=2, feedforward_dim=32, num_layers=1, weight_norm=False,
            rf=16,
        )
    )
    p2 = jb2.init_params(batch_size=1)
    paths2 = [
        "/".join(str(k.key) for k in kp)
        for kp, _ in jtu.tree_flatten_with_path(p2)[0]
    ]
    assert not [p for p in paths2 if p.endswith("kernel/scale")]


def test_jukebox_default_init_len_snaps_to_pyramid():
    # rf=17 is not a valid tier length; the default must round up to a
    # multiple of frame_sizes[0]
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=jb_io(), frame_sizes=(8, 4, 2), model_dim=16,
            n_heads=2, feedforward_dim=32, num_layers=1, rf=17,
        )
    )
    assert jb._default_init_len() == 24
    jb.init_params()  # must not raise


def test_simple_transformer_cached_decode_matches_stepwise():
    """The KV-cached scan decode must produce exactly the tokens the
    stepwise full-context argmax path would (history kept under rf so the
    stepwise window covers the same context)."""
    tr = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=small_io(), model_dim=32, n_heads=4, feedforward_dim=64,
            num_layers=2, rf=64,
        )
    )
    tr.seed(0)
    prompts = (np.random.randint(0, 32, (2, 16)).astype(np.int32),)
    out = tr.generate(prompts, n_steps=10, temperature=None)
    seq = np.asarray(out[0])
    assert seq.shape == (2, 26)
    assert np.array_equal(seq[:, :16], prompts[0])

    tr.eval()
    for t in range(16, 26):
        o = np.asarray(tr.forward((seq[:, :t],), temperature=None))
        step_tok = o[..., 0] if o.ndim > 2 else o[0]
        step_tok = np.asarray(step_tok).reshape(2)
        assert np.array_equal(step_tok.astype(seq.dtype), seq[:, t]), t


def test_simple_transformer_window_decode_matches_stepwise():
    """Prompts >= rf take the sliding-window scan decoder; its tokens must
    equal the stepwise rf-window argmax path position by position."""
    tr = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=small_io(), model_dim=32, n_heads=4, feedforward_dim=64,
            num_layers=2, rf=16,
        )
    )
    tr.seed(0)
    prompts = (np.random.randint(0, 32, (2, 24)).astype(np.int32),)
    out = tr.generate(prompts, n_steps=10, temperature=None)
    seq = np.asarray(out[0])
    assert seq.shape == (2, 34)
    assert np.array_equal(seq[:, :24], prompts[0])

    tr.eval()
    for t in range(24, 34):
        o = np.asarray(tr.forward((seq[:, t - 16 : t],), temperature=None))
        tok = (o[..., 0] if o.ndim > 2 else o[0]).reshape(2)
        assert np.array_equal(tok.astype(seq.dtype), seq[:, t]), t


def test_window_decode_bf16_knob(monkeypatch):
    """MMK_DECODE_BF16=1 runs the window refeed in bfloat16 (2x MXU rate
    on TPU).  Tokens may drift from f32 (documented divergence) but the
    path must produce a valid sequence that echoes the prompt, and the
    decoder cache must keep the two dtypes apart."""
    tr = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=small_io(), model_dim=32, n_heads=4, feedforward_dim=64,
            num_layers=2, rf=16,
        )
    )
    tr.seed(0)
    prompts = (np.random.randint(0, 32, (2, 24)).astype(np.int32),)
    tr.generate(prompts, n_steps=4, temperature=None)
    n_f32 = len(tr._decoders)
    monkeypatch.setenv("MMK_DECODE_BF16", "1")
    out = tr.generate(prompts, n_steps=10, temperature=None)
    seq = np.asarray(out[0])
    assert seq.shape == (2, 34)
    assert np.array_equal(seq[:, :24], prompts[0])
    assert seq.max() < 32 and seq.min() >= 0
    assert len(tr._decoders) > n_f32  # cached under a distinct key


def test_jukebox_window_decode_matches_stepwise():
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=jb_io(), frame_sizes=(8, 4, 2), model_dim=16, n_heads=2,
            feedforward_dim=32, num_layers=1, rf=16,
        )
    )
    jb.seed(0)
    prompts = (np.random.randint(0, 32, (2, 24)).astype(np.int32),)
    out = jb.generate(prompts, n_steps=8, temperature=None)
    seq = np.asarray(out[0])
    assert seq.shape == (2, 32)
    assert np.array_equal(seq[:, :24], prompts[0])

    jb.eval()
    # the decode window LEADS the write position by one: the core never
    # reads the final window token (every tier slices it away — it is the
    # training target), so the stepwise window for predicting token t is
    # seq[t-rf+1 : t+1] and its last READ token is t-1
    for t in range(24, 32):
        o = np.asarray(jb.forward((seq[:, t - 15 : t + 1],), temperature=None))
        tok = (o[..., 0] if o.ndim > 2 else o[0]).reshape(2)
        assert np.array_equal(tok.astype(seq.dtype), seq[:, t]), t

    # shorter-than-window prompts are zero-padded then stripped
    out2 = jb.generate((prompts[0][:, :6],), n_steps=4, temperature=0.9)
    assert np.asarray(out2[0]).shape == (2, 10)
    assert np.array_equal(np.asarray(out2[0])[:, :6], prompts[0][:, :6])


def test_jukebox_stepwise_generate_step_matches_fast_decode():
    """The stepwise contract (GenerateLoopV2._stepwise, VotingEnsemble):
    ``generate_step`` receives the lead-0 window ``[t-rf, t)`` and its
    output is written at ``t``.  JukeBox's override must apply the same
    one-token lead as the fast decoder so both paths emit identical
    sequences (regression: only generate() was fixed at first, leaving
    every stepwise caller on the lagged, DC-collapsing path)."""
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=jb_io(), frame_sizes=(8, 4, 2), model_dim=16, n_heads=2,
            feedforward_dim=32, num_layers=1, rf=16,
        )
    )
    jb.seed(0)
    prompts = (np.random.randint(0, 32, (2, 24)).astype(np.int32),)
    seq = np.asarray(jb.generate(prompts, n_steps=8, temperature=None)[0])
    jb.eval()
    rf = jb._window_len()
    for t in range(24, 32):
        o = np.asarray(
            jb.generate_step((seq[:, t - rf: t],), t=t, temperature=None)[0]
        )
        tok = o.reshape(2)
        assert np.array_equal(tok.astype(seq.dtype), seq[:, t]), t


def test_jukebox_decode_predicts_the_next_token():
    """The eval forward must be a function of tokens[:-1] ONLY (the final
    input token is the train-mode target and must never be read), and the
    decode refeed must therefore lead the write position by one — the
    reference reuses its train slicing in generate_step, which makes every
    generated token an estimate of the PREVIOUS position (reference
    ``transformers.py:363-364``); that lag collapses free-running audio
    to DC (measured on a trained tone model)."""
    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=jb_io(), frame_sizes=(8, 4, 2), model_dim=16, n_heads=2,
            feedforward_dim=32, num_layers=1, rf=16,
        )
    )
    jb.seed(0)
    jb.eval()
    win = np.random.randint(0, 32, (2, 16)).astype(np.int32)
    base = np.asarray(jb.forward((win,), temperature=None))
    # changing the LAST window token must not change the prediction...
    w2 = win.copy()
    w2[:, -1] = (w2[:, -1] + 7) % 32
    assert np.array_equal(
        np.asarray(jb.forward((w2,), temperature=None)), base
    )
    # ...while changing the second-to-last (the newest token actually
    # read) generally must
    w3 = win.copy()
    w3[:, -2] = (w3[:, -2] + 7) % 32
    assert not np.array_equal(
        np.asarray(jb.forward((w3,), temperature=None)), base
    )
