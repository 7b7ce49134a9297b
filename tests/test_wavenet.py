"""WaveNet layer-graph permutations, rf exactness, decode parity, training
(reference ``tests/test_wavenet.py``; layout here is feature-last (B, T, D))."""
import os

import numpy as np
import pytest

import mimikit_tpu as mmk
from mimikit_tpu import IOSpec, TrainARMConfig, TrainARMLoop, WaveNet
from mimikit_tpu.networks.wavenet import WNLayer

from .test_utils import make_db_config


def inputs_(b=8, t=32, d=16):
    return np.random.randn(b, t, d).astype(np.float32)


def _init_and_run(layer, *args):
    import jax

    variables = layer.init(jax.random.PRNGKey(0), *args)
    return layer.apply(variables, *args)


@pytest.mark.parametrize("with_gate", [True, False])
@pytest.mark.parametrize("feed_skips", [True, False])
@pytest.mark.parametrize("given_input_dim", [None, 7])
@pytest.mark.parametrize("given_pad", [0, 1])
@pytest.mark.parametrize("given_residuals", [None, 5, 7])
@pytest.mark.parametrize("given_skips", [None, 34])
@pytest.mark.parametrize("given_1x1", [(), (8, 2)])
@pytest.mark.parametrize("given_dil", [(16,)])
def test_layer_should_support_various_graphs(
    given_dil, given_1x1, given_skips, given_residuals, given_pad,
    given_input_dim, feed_skips, with_gate,
):
    under_test = WNLayer(
        input_dim=given_input_dim,
        dims_dilated=given_dil,
        dims_1x1=given_1x1,
        skips_dim=given_skips,
        residuals_dim=given_residuals,
        pad_side=given_pad,
        act_g="Sigmoid" if with_gate else None,
    )
    B, T = 1, 8
    if given_input_dim is None:
        input_dim = given_dil[0] if given_residuals is None else given_residuals
    else:
        input_dim = given_input_dim

    skips = (
        None
        if not feed_skips or given_skips is None
        else inputs_(B, T, given_skips)
    )
    given_inputs = (
        (inputs_(B, T, input_dim),),
        tuple(inputs_(B, T, d) for d in given_1x1),
        skips,
    )
    if given_residuals is not None:
        if given_input_dim is not None and given_input_dim != given_residuals:
            expected_out_dim = given_dil[0]  # residuals skipped
        else:
            expected_out_dim = given_residuals
    else:
        expected_out_dim = given_dil[0]

    outputs = _init_and_run(under_test, *given_inputs)

    assert type(outputs) is tuple and len(outputs) == 2
    assert outputs[0].shape[-1] == expected_out_dim
    if given_skips is not None:
        assert outputs[1].shape[-1] == given_skips
    if bool(given_pad):
        assert outputs[0].shape[1] == T
        if given_skips is not None:
            assert outputs[1].shape[1] == T
    else:
        assert outputs[0].shape[1] < T
        if given_skips is not None:
            assert outputs[1].shape[1] == outputs[0].shape[1]


def embedding_io(q_levels=64, mlp_dim=16):
    return IOSpec.mulaw_io(
        IOSpec.MuLawIOConfig(
            q_levels=q_levels, mlp_dim=mlp_dim, input_module_type="embedding"
        )
    )


def test_should_instantiate_from_default_config():
    given_config = WaveNet.Config(io_spec=embedding_io(), dims_dilated=(32,))
    under_test = WaveNet.from_config(given_config)
    assert type(under_test) is WaveNet
    assert len(under_test.module.layers_cfg) == given_config.blocks[0]


def test_should_load_when_saved(tmp_path_factory):
    given_config = WaveNet.Config(io_spec=embedding_io(), dims_dilated=(32,))
    root = str(tmp_path_factory.mktemp("ckpt"))
    wn = WaveNet.from_config(given_config)
    wn.init_params()
    ckpt = mmk.Checkpoint(id="123", epoch=1, root_dir=root)
    ckpt.create(network=wn)
    loaded = ckpt.network
    assert type(loaded) is WaveNet


@pytest.mark.parametrize("given_temp", [None, 0.5, (1.0,)])
def test_generate(given_temp):
    given_config = WaveNet.Config(io_spec=embedding_io(), dims_dilated=(32,))
    q_levels = given_config.io_spec.inputs[0].elem_type.size
    wn = WaveNet.from_config(given_config)
    given_prompt = np.random.randint(0, q_levels, (1, 128))
    wn.eval()
    wn.before_generate((given_prompt,), batch_index=0)
    output = wn.generate_step(
        (given_prompt[:, -wn.rf :],),
        t=given_prompt.shape[1],
        temperature=given_temp,
    )
    wn.after_generate(output, batch_index=0)
    assert type(output) is tuple
    assert output[0].shape[0] == given_prompt.shape[0]
    assert np.asarray(output[0]).ndim == given_prompt.ndim


def test_fast_decode_matches_naive_ar():
    """The scan decoder must be sample-exact vs a full forward per step."""
    given_config = WaveNet.Config(
        io_spec=embedding_io(), blocks=(3,), dims_dilated=(32,),
        skips_dim=24, residuals_dim=32,
    )
    wn = WaveNet.from_config(given_config)
    B = 2
    prompts = (np.random.randint(0, 64, (B, 32)),)
    fast = np.asarray(wn.generate(prompts, n_steps=12, temperature=None)[0][:, 32:])

    buf = np.concatenate(
        [prompts[0], np.zeros((B, 12), prompts[0].dtype)], axis=1
    )
    wn.eval()
    for t in range(32, 44):
        o = wn.forward((buf[:, t - wn.rf : t],))
        buf[:, t] = np.asarray(o[0][:, 0])
    assert np.array_equal(buf[:, 32:], fast)


def test_should_support_multiple_io(tmp_path):
    ds_cfg = make_db_config(tmp_path)
    extractor = ds_cfg.extractors[0]
    given_io = IOSpec(
        inputs=(
            mmk.InputSpec(
                extractor_name=extractor.name,
                transform=mmk.Normalize(),
                module=mmk.LinearIO(),
            ).bind_to(extractor),
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
            mmk.TargetSpec(
                extractor_name=extractor.name,
                transform=mmk.Normalize(),
                module=mmk.LinearIO(),
                objective=mmk.Objective("reconstruction"),
            ).bind_to(extractor),
        ),
    )
    wn = WaveNet.from_config(
        WaveNet.Config(io_spec=given_io, dims_dilated=(64,), dims_1x1=(44,))
    )
    given_inputs = (
        np.random.randn(1, 32, 1).astype(np.float32),
        np.random.randn(1, 32, 1).astype(np.float32),
    )
    outputs = wn.forward(given_inputs)
    assert isinstance(outputs, tuple)
    assert outputs[0].shape == outputs[1].shape


@pytest.mark.parametrize(
    "given_io",
    [
        IOSpec.magspec_io(IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64)),
        embedding_io(),
    ],
)
def test_should_train(tmp_path, given_io):
    given_config = WaveNet.Config(
        io_spec=given_io, blocks=(3,), dims_dilated=(32,)
    )
    wn = WaveNet.from_config(given_config)
    db = make_db_config(tmp_path, filename="train-loop.h5").create(mode="w")
    config = TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        batch_size=2,
        batch_length=8,
        max_epochs=2,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="wav",
        prompt_length_sec=0.05,
        outputs_duration_sec=0.02,
        n_examples=1,
    )
    loop = TrainARMLoop.from_config(config, dataset=db, network=wn)
    loop.run()
    content = os.listdir(os.path.join(str(tmp_path), loop.hash_))
    for expected in ("hp.yaml", "outputs", "epoch=1.ckpt"):
        assert expected in content
    outputs = os.listdir(os.path.join(str(tmp_path), loop.hash_, "outputs"))
    assert ".wav" in {os.path.splitext(o)[-1] for o in outputs}


@pytest.mark.parametrize(
    "given_blocks",
    [(3,), (1, 1, 1, 1, 1, 1, 1), (2, 2, 1), (1, 2, 2), (1, 1, 1, 1, 2)]
)
def test_rf_should_be_correct(given_blocks):
    EXPECTED_RF = 8
    given_io = IOSpec.magspec_io(IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64))
    given_config = WaveNet.Config(
        io_spec=given_io, blocks=given_blocks, dims_dilated=(32,)
    )
    wn = WaveNet.from_config(given_config)
    assert wn.rf == EXPECTED_RF
    F = given_io.inputs[0].elem_type.size

    y = wn.forward((inputs_(2, EXPECTED_RF, F),))[0]
    assert y.shape[1] == 1

    wn2 = WaveNet.from_config(given_config)
    y = wn2.forward((inputs_(2, EXPECTED_RF + 1, F),))[0]
    assert y.shape[1] == 2

    wn3 = WaveNet.from_config(given_config)
    with pytest.raises(Exception):
        wn3.forward((inputs_(2, EXPECTED_RF - 1, F),))


def test_tie_io_weights_shares_kernel():
    """With tie_io_weights, the output head reads the transposed input
    kernel (live tying: no output kernel param, grads flow to the input)."""
    import jax
    import jax.numpy as jnp

    io = IOSpec.magspec_io(IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64))
    wn = WaveNet.from_config(
        WaveNet.Config(
            io_spec=io, blocks=(3,), dims_dilated=(32,), tie_io_weights=True
        )
    )
    F = io.inputs[0].elem_type.size
    x = np.random.rand(2, 16, F).astype(np.float32)
    out = wn.forward((x,))
    assert out[0].shape[-1] == F

    flat = jax.tree_util.tree_flatten_with_path(wn.params)[0]
    out_kernels = [
        p for p, _ in flat
        if "output_modules_0" in jax.tree_util.keystr(p)
        and "kernel" in jax.tree_util.keystr(p)
    ]
    assert out_kernels == []  # no independent output kernel

    def loss(p):
        o, _ = wn.module.apply(
            {"params": p}, (jnp.asarray(x),), None, True,
            rngs={"dropout": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)},
        )
        return (o[0] ** 2).mean()

    g = jax.grad(loss)(wn.params)
    in_kernel = next(
        l for p, l in jax.tree_util.tree_flatten_with_path(g)[0]
        if "input_modules_0" in jax.tree_util.keystr(p)
        and "kernel" in jax.tree_util.keystr(p)
    )
    assert bool(jnp.any(in_kernel != 0))


def test_tie_io_weights_noop_for_mulaw_embedding():
    """Embedding inputs aren't tied (the reference's Linear-name matching
    finds nothing either) — the net must still build and run."""
    io = embedding_io()
    wn = WaveNet.from_config(
        WaveNet.Config(
            io_spec=io, blocks=(3,), dims_dilated=(32,), tie_io_weights=True
        )
    )
    x = np.random.randint(0, 64, (2, 16))
    out = wn.forward((x,))
    assert out[0].shape[-1] == 64
