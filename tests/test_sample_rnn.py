"""SampleRNN unit + integration suite (reference ``tests/test_sample_rnn.py``)."""
import os

import numpy as np
import pytest

import mimikit_tpu as mmk
from mimikit_tpu import GenerateLoopV2, IOSpec, SampleRNN, TrainARMConfig, TrainARMLoop

from .test_utils import make_db_config


def small_io(q_levels=256, mlp_dim=32):
    return IOSpec.mulaw_io(
        IOSpec.MuLawIOConfig(q_levels=q_levels, mlp_dim=mlp_dim)
    )


def test_should_instantiate_from_default_config():
    given_config = SampleRNN.Config(io_spec=small_io(), hidden_dim=32)
    under_test = SampleRNN.from_config(given_config)
    assert type(under_test) is SampleRNN
    assert len(under_test.module.tier_inputs) == len(given_config.frame_sizes)


def test_should_take_n_unfolded_inputs():
    given_frame_sizes = (16, 4, 2)
    given_config = SampleRNN.Config(
        frame_sizes=given_frame_sizes,
        io_spec=small_io(),
        hidden_dim=32,
        inputs_mode="sum",
    )
    given_inputs = (np.arange(128).reshape(2, 64),)
    under_test = SampleRNN.from_config(given_config)
    outputs = under_test.forward(given_inputs)

    assert type(outputs) is tuple
    assert outputs[0].shape == (
        2,
        given_inputs[0].shape[1] - given_frame_sizes[0],
        given_config.io_spec.inputs[0].elem_type.size,
    )


def test_should_load_when_saved(tmp_path_factory):
    given_config = SampleRNN.Config(io_spec=small_io(), hidden_dim=32)
    root = str(tmp_path_factory.mktemp("ckpt"))
    srnn = SampleRNN.from_config(given_config)
    srnn.init_params()
    ckpt = mmk.Checkpoint(id="123", epoch=1, root_dir=root)

    ckpt.create(network=srnn)
    loaded = ckpt.network

    assert type(loaded) is SampleRNN
    # weights must round-trip exactly
    import jax

    orig = jax.tree_util.tree_leaves(srnn.params)
    new = jax.tree_util.tree_leaves(loaded.params)
    assert all(np.allclose(a, b) for a, b in zip(orig, new))


@pytest.mark.parametrize("given_temp", [None, 0.5, (1.0,)])
def test_generate(given_temp):
    given_config = SampleRNN.Config(io_spec=small_io(), hidden_dim=32)
    q_levels = given_config.io_spec.inputs[0].elem_type.size
    srnn = SampleRNN.from_config(given_config)
    given_prompt = (np.random.randint(0, q_levels, (1, 32)),)
    srnn.eval()
    srnn.before_generate(given_prompt, batch_index=0)
    output = srnn.generate_step(
        tuple(p[:, -srnn.rf :] for p in given_prompt),
        t=given_prompt[0].shape[1],
        temperature=given_temp,
    )
    srnn.after_generate(output, batch_index=0)

    assert type(output) is tuple
    assert output[0].shape[0] == given_prompt[0].shape[0]
    assert np.asarray(output[0]).ndim == np.asarray(given_prompt[0]).ndim


def test_generate_loop_integration(tmp_path):
    given_config = SampleRNN.Config(io_spec=small_io(), hidden_dim=32)
    srnn = SampleRNN.from_config(given_config)
    db = make_db_config(tmp_path, filename="gen-test.h5").create(mode="w")

    loop = GenerateLoopV2.from_config(
        GenerateLoopV2.Config(
            prompts_length_sec=512 / 16000,
            output_duration_sec=512 / 16000,
            prompts_position_sec=(None, None),
            batch_size=2,
            parameters=dict(temperature=(1.0,)),
            display_waveform=False,
        ),
        db,
        srnn,
    )

    ran = False
    for outputs in loop.run():
        ran = True
        assert outputs is not None
        assert outputs[0].shape == (2, 1024)
        assert outputs[0].dtype in (np.float32, np.float64)
    assert ran


def test_should_train(tmp_path):
    given_config = SampleRNN.Config(
        io_spec=small_io(), frame_sizes=(4, 2, 2), hidden_dim=32
    )
    srnn = SampleRNN.from_config(given_config)
    db = make_db_config(tmp_path, filename="train-loop.h5").create(mode="w")
    config = TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        batch_size=2,
        batch_length=8,
        tbptt_chunk_length=128,
        max_epochs=2,
        every_n_epochs=1,
        oversampling=4,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="wav",
        prompt_length_sec=0.01,
        outputs_duration_sec=0.01,
        n_examples=1,
    )
    loop = TrainARMLoop.from_config(config, dataset=db, network=srnn)
    loop.run()

    content = os.listdir(os.path.join(str(tmp_path), loop.hash_))
    for expected in ("hp.yaml", "outputs", "epoch=1.ckpt"):
        assert expected in content
    outputs = os.listdir(os.path.join(str(tmp_path), loop.hash_, "outputs"))
    assert ".wav" in {os.path.splitext(o)[-1] for o in outputs}


def test_fast_decode_matches_stepwise():
    """The jitted scan decoder must equal the step-wise parity API (argmax)."""
    given_config = SampleRNN.Config(
        frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=small_io(32, 16)
    )
    net = SampleRNN.from_config(given_config)
    B, P, N = 2, 32, 12  # prompt length a multiple of rf
    prompts = (np.random.randint(0, 32, (B, P)),)
    fast = np.asarray(net.generate(prompts, n_steps=N, temperature=None)[0][:, P:])

    buf = np.concatenate([prompts[0], np.zeros((B, N), prompts[0].dtype)], axis=1)
    net.eval()
    net.before_generate(prompts, 0)
    for t in range(P, P + N):
        out = net.generate_step((buf[:, t - net.rf : t],), t=t, temperature=None)
        buf[:, t] = np.asarray(out[0][:, 0])
    net.after_generate((), 0)
    assert np.array_equal(buf[:, P:], fast)


def test_decode_unroll_is_bit_identical(monkeypatch):
    """Scan unrolling is a scheduling knob: any MMK_DECODE_UNROLL value
    must produce the same samples."""
    import os

    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    )
    net.seed(0)
    prompts = (np.random.randint(0, 32, (2, 16)).astype(np.int32),)

    monkeypatch.setenv("MMK_DECODE_UNROLL", "1")
    a = np.asarray(net.generate(prompts, n_steps=11, temperature=None)[0])
    net._decoders.clear()  # force a rebuild under the new unroll
    monkeypatch.setenv("MMK_DECODE_UNROLL", "4")
    b = np.asarray(net.generate(prompts, n_steps=11, temperature=None)[0])
    assert np.array_equal(a, b)
