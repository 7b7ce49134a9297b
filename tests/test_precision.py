"""Mixed-precision (bf16 compute / f32 master) policy tests.

Pins two things:
1. dtype PROPAGATION — with bf16 params + inputs under the policy context,
   every float output of each zoo core is bf16.  A single hard-coded f32
   constant on the activation path re-promotes everything downstream
   (f32 + bf16 -> f32 under jnp promotion), silently voiding the policy's
   HBM/MXU gains — this test is what catches such leaks.
2. the TRAIN LOOP contract — trainer_kwargs={"param_dtype": "bfloat16"}
   trains, keeps f32 master params, and lands near the f32 loss.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mimikit_tpu as mmk
from mimikit_tpu import precision

from .test_utils import TestARM, make_db_config


def _mulaw_io(mlp_dim=32):
    return mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=256, mlp_dim=mlp_dim)
    )


def _magspec_io():
    return mmk.IOSpec.magspec_io(
        mmk.IOSpec.MagSpecIOConfig(
            sr=16000, n_fft=128, hop_length=32, activation="Identity"
        )
    )


def _float_leaves(tree):
    return [
        x
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]


def _assert_bf16_forward(net, inputs, train=True):
    net.init_params(batch_size=inputs[0].shape[0])
    p16 = precision.cast_floats(net.params, jnp.bfloat16)
    in16 = precision.cast_floats(inputs, jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    def apply(p, xs):
        with precision.compute(jnp.bfloat16):
            return net.module.apply(
                {"params": p}, xs, None, train,
                rngs={"dropout": rng, "sample": rng},
            )

    outputs, _hidden = jax.jit(apply)(p16, in16)
    leaves = _float_leaves(outputs)
    assert leaves, "net produced no float outputs"
    for leaf in leaves:
        assert leaf.dtype == jnp.bfloat16, (
            f"promotion leak: output came back {leaf.dtype}"
        )


def test_samplernn_bf16_propagation():
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(8, 4, 2), hidden_dim=32, io_spec=_mulaw_io()
        )
    )
    x = jnp.asarray(np.random.randint(0, 256, (2, 8 + 16)), jnp.int32)
    _assert_bf16_forward(net, (x,))


def test_samplernn_bf16_propagation_fused_lstm(monkeypatch):
    # the fused Pallas LSTM computes f32 internally; RNNStack must cast its
    # outputs back so the rest of the net stays bf16
    monkeypatch.setenv("MMK_FUSED_LSTM", "1")
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(8, 4, 2), hidden_dim=32, io_spec=_mulaw_io()
        )
    )
    x = jnp.asarray(np.random.randint(0, 256, (2, 8 + 16)), jnp.int32)
    _assert_bf16_forward(net, (x,))


def test_wavenet_bf16_propagation():
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=256, mlp_dim=32, input_module_type="embedding"
        )
    )
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io, blocks=(3,), dims_dilated=(32,), skips_dim=32,
            residuals_dim=32, pad_side=0,
        )
    )
    x = jnp.asarray(np.random.randint(0, 256, (2, net.rf + 16)), jnp.int32)
    _assert_bf16_forward(net, (x,))


def test_transformer_bf16_propagation():
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=256, mlp_dim=32, input_module_type="embedding"
        )
    )
    net = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=io, model_dim=32, n_heads=4, feedforward_dim=64,
            num_layers=2, rf=16,
        )
    )
    x = jnp.asarray(np.random.randint(0, 256, (2, 16)), jnp.int32)
    _assert_bf16_forward(net, (x,))


def test_seq2seq_bf16_propagation():
    net = mmk.Seq2SeqLSTMNetwork.from_config(
        mmk.Seq2SeqLSTMNetwork.Config(
            io_spec=_magspec_io(), model_dim=32, hop=4
        )
    )
    F = net.config.io_spec.inputs[0].elem_type.size
    x = jnp.asarray(np.random.uniform(0, 1, (2, 4, F)), jnp.float32)
    _assert_bf16_forward(net, (x,))


def test_resolve_dtype():
    assert precision.resolve_dtype(None) is None
    assert precision.resolve_dtype("float32") is None
    assert precision.resolve_dtype("bfloat16") == jnp.bfloat16
    assert precision.resolve_dtype("bf16") == jnp.bfloat16
    with pytest.raises(ValueError):
        precision.resolve_dtype("int8")


def test_cast_floats_leaves_ints_alone():
    tree = {"a": jnp.zeros((2,), jnp.float32), "b": jnp.zeros((2,), jnp.int32)}
    out = precision.cast_floats(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


def _train_loop(tmp_path, param_dtype=None, seed=42):
    ds_cfg = make_db_config(tmp_path, filename=f"prec-{param_dtype}.h5")
    db = ds_cfg.create(mode="w")
    extractor = ds_cfg.extractors[0]
    net = TestARM(
        TestARM.Config(
            io_spec=mmk.IOSpec(
                inputs=(
                    mmk.InputSpec(
                        extractor_name=extractor.name,
                        transform=mmk.Normalize(),
                        module=mmk.LinearIO(),
                    ).bind_to(extractor),
                ),
                targets=(
                    mmk.TargetSpec(
                        extractor_name=extractor.name,
                        transform=mmk.Normalize(),
                        module=mmk.LinearIO(),
                        objective=mmk.Objective("reconstruction"),
                    ).bind_to(extractor),
                ),
            )
        )
    )
    kwargs = {"data_seed": seed}
    if param_dtype is not None:
        kwargs["param_dtype"] = param_dtype
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=4,
        max_epochs=2,
        CHECKPOINT_TRAINING=False,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs=kwargs,
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    loop.run()
    return loop


def test_train_loop_bf16_matches_f32(tmp_path):
    loop32 = _train_loop(tmp_path, None)
    loop16 = _train_loop(tmp_path, "bfloat16")
    # master params stay f32 under the policy
    for leaf in _float_leaves(loop16.net.params):
        assert leaf.dtype == jnp.float32
    # after run(), EpochMetrics still holds the LAST epoch's sums
    l32 = loop32.metrics.averages()["loss"]
    l16 = loop16.metrics.averages()["loss"]
    assert np.isfinite(l16)
    # same data order (data_seed); bf16 rounding moves the trajectory but
    # must land in the same neighbourhood
    assert abs(l16 - l32) <= max(0.1 * abs(l32), 5e-3)


def test_data_seed_warns_without_seedable_sampler(tmp_path):
    import warnings

    class Plain:
        pass

    cfg = mmk.TrainARMConfig(trainer_kwargs={"data_seed": 1})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        mmk.TrainARMLoop._apply_data_seed(Plain(), cfg)
    assert any("data_seed" in str(w.message) for w in rec)
