"""Seq2Seq LSTM encoder/decoder shapes + integration
(reference ``tests/test_seq2seq.py``; the parameter grid is thinned because
each unique shape is a fresh XLA compile, unlike torch eager)."""
import os

import numpy as np
import pytest

import mimikit_tpu as mmk
from mimikit_tpu import GenerateLoopV2, IOSpec, Seq2SeqLSTMNetwork, TrainARMConfig, TrainARMLoop
from mimikit_tpu.networks.s2s_lstm import DecoderLSTM, EncoderLSTM

from .test_utils import make_db_config


def inputs_(b=8, t=32, d=16):
    return np.random.randn(b, t, d).astype(np.float32)


def _run(module, *args):
    import jax

    variables = module.init(jax.random.PRNGKey(0), *args)
    return module.apply(variables, *args)


@pytest.mark.parametrize(
    "downsampling", ["edge_sum", "edge_mean", "sum", "mean", "linear_resample"]
)
@pytest.mark.parametrize("num_layers", [1, 2])
@pytest.mark.parametrize("apply_residuals", [True, False])
@pytest.mark.parametrize("hop", [2, 4])
def test_encoder_forward(hop, apply_residuals, num_layers, downsampling):
    input_dim = output_dim = 16
    given_input = inputs_(2, hop, input_dim)
    under_test = EncoderLSTM(
        downsampling=downsampling,
        input_dim=input_dim,
        output_dim=output_dim,
        num_layers=num_layers,
        apply_residuals=apply_residuals,
        hop=hop,
    )
    y, (hidden, cell) = _run(under_test, given_input)
    assert y.shape == (given_input.shape[0], 1, output_dim)
    assert hidden.shape == (2, given_input.shape[0], output_dim)


@pytest.mark.parametrize("upsampling", ["repeat", "interp", "linear_resample"])
@pytest.mark.parametrize("num_layers", [1, 2])
@pytest.mark.parametrize("apply_residuals", [True, False])
@pytest.mark.parametrize("hop", [2, 4])
def test_decoder_forward(hop, apply_residuals, num_layers, upsampling):
    B, model_dim = 2, 16
    x = inputs_(B, 1, model_dim)
    hidden = (
        np.random.randn(2, B, model_dim).astype(np.float32),
        np.random.randn(2, B, model_dim).astype(np.float32),
    )
    under_test = DecoderLSTM(
        upsampling=upsampling,
        model_dim=model_dim,
        num_layers=num_layers,
        apply_residuals=apply_residuals,
        hop=hop,
    )
    y = _run(under_test, x, hidden)
    assert y.shape == (B, hop, model_dim)


def small_magspec_io():
    return IOSpec.magspec_io(IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64))


def test_seq2seq_forward():
    under_test = Seq2SeqLSTMNetwork.from_config(
        Seq2SeqLSTMNetwork.Config(io_spec=small_magspec_io(), model_dim=32)
    )
    given_inputs = (
        inputs_(
            2,
            under_test.config.hop,
            under_test.config.io_spec.inputs[0].elem_type.size,
        ),
    )
    outputs = under_test.forward(given_inputs)
    assert outputs[0].shape == given_inputs[0].shape


def test_should_generate(tmp_path):
    db = make_db_config(tmp_path, filename="gen.h5").create(mode="w")
    s2s = Seq2SeqLSTMNetwork.from_config(
        Seq2SeqLSTMNetwork.Config(io_spec=small_magspec_io(), model_dim=32, hop=2)
    )
    loop = GenerateLoopV2.from_config(
        GenerateLoopV2.Config(
            prompts_position_sec=(None,),
            batch_size=1,
            prompts_length_sec=0.05,
            output_duration_sec=0.02,
            display_waveform=False,
        ),
        db,
        s2s,
    )
    ran = False
    for outputs in loop.run():
        ran = True
        assert len(outputs) == 1
        assert np.any(outputs[0][:, -loop.n_steps :] != 0)
    assert ran


@pytest.mark.parametrize("n_steps", [8, 10])
def test_fast_generate_matches_stepwise(n_steps):
    """The scan-based ``generate`` must emit the same frames as the
    reference-semantics stepwise loop (deterministic head -> exact)."""
    s2s = Seq2SeqLSTMNetwork.from_config(
        Seq2SeqLSTMNetwork.Config(io_spec=small_magspec_io(), model_dim=32, hop=4)
    )
    s2s.eval()
    d = s2s.config.io_spec.inputs[0].elem_type.size
    prompt = (np.abs(inputs_(2, 8, d)),)
    s2s.init_params(batch_size=2)
    fast = np.asarray(s2s.generate(prompt, n_steps)[0])
    loop = GenerateLoopV2(GenerateLoopV2.Config(), s2s, n_steps, dataloader=None)
    step = np.asarray(loop._stepwise(prompt, np.array([0, 1]), {})[0])
    assert fast.shape == step.shape == (2, 8 + n_steps, d)
    np.testing.assert_allclose(fast, step, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "given_io",
    [
        IOSpec.magspec_io(IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64)),
        IOSpec.mulaw_io(
            IOSpec.MuLawIOConfig(
                q_levels=32, mlp_dim=16, input_module_type="embedding"
            )
        ),
    ],
)
def test_should_train(tmp_path, given_io):
    s2s = Seq2SeqLSTMNetwork.from_config(
        Seq2SeqLSTMNetwork.Config(io_spec=given_io, model_dim=32, hop=2)
    )
    db = make_db_config(tmp_path, filename="train-loop.h5").create(mode="w")
    config = TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        batch_size=2,
        batch_length=s2s.config.hop,
        downsampling=64,
        max_epochs=2,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="wav",
        prompt_length_sec=0.05,
        outputs_duration_sec=0.02,
        n_examples=1,
    )
    loop = TrainARMLoop.from_config(config, dataset=db, network=s2s)
    loop.run()
    content = os.listdir(os.path.join(str(tmp_path), loop.hash_))
    for expected in ("hp.yaml", "outputs", "epoch=1.ckpt"):
        assert expected in content
    outputs = os.listdir(os.path.join(str(tmp_path), loop.hash_, "outputs"))
    assert ".wav" in {os.path.splitext(o)[-1] for o in outputs}
