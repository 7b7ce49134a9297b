"""Mesh scaling: dp/tp-sharded training on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import mimikit_tpu as mmk

from .test_utils import make_db_config


def test_mesh_shapes():
    import jax

    from mimikit_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_param_shardings_split_large_kernels():
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.parallel import make_mesh, param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(n_model=2)
    params = {
        "big": {"kernel": jnp.zeros((256, 256))},
        "small": {"kernel": jnp.zeros((4, 4))},
        "scalar": jnp.zeros(()),
    }
    sh = param_shardings(mesh, params, min_size=1024)
    assert "model" in str(sh["big"]["kernel"].spec)
    assert sh["small"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_data_parallel_training_runs(tmp_path):
    """Full TrainARMLoop with the batch sharded over the data axis."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    ds_cfg = make_db_config(tmp_path, filename="dp.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16),
        extractor=ds_cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io)
    )
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        batch_size=8,  # divisible by the data axis
        batch_length=16,
        limit_train_batches=3,
        max_epochs=1,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs={"data_parallel": True},
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    assert loop.mesh is not None
    loop.run()
    import os

    assert "epoch=1.ckpt" in os.listdir(os.path.join(str(tmp_path), loop.hash_))


def test_sharded_decode_matches_unsharded():
    """Generation sharded over the data axis is bit-identical (streams are
    independent; zero collectives)."""
    import jax

    from mimikit_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    )
    mesh = make_mesh(n_model=1)
    prompts = (np.random.randint(0, 32, (8, 16)).astype(np.int32),)
    a = np.asarray(net.generate(prompts, n_steps=12, temperature=None)[0])
    b = np.asarray(
        net.generate(prompts, n_steps=12, temperature=None, mesh=mesh)[0]
    )
    assert np.array_equal(a, b)


def test_fsdp_param_shardings():
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.parallel import make_mesh
    from mimikit_tpu.parallel.mesh import param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(n_model=2)  # data=4, model=2
    params = {
        "big": {"kernel": jnp.zeros((256, 128))},
        "bias": jnp.zeros((2048,)),
        "small": {"kernel": jnp.zeros((4, 4))},
    }
    sh = param_shardings(mesh, params, min_size=1024, fsdp=True)
    spec = sh["big"]["kernel"].spec
    # column split over model AND the largest free dim sharded over data
    assert "model" in str(spec) and "data" in str(spec)
    assert "data" in str(sh["bias"].spec)  # 1-D but big enough
    assert sh["small"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_fsdp_training_runs(tmp_path):
    """TrainARMLoop with fully-sharded params over the data axis."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    ds_cfg = make_db_config(tmp_path, filename="fsdp.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16),
        extractor=ds_cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io)
    )
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        batch_size=8,
        batch_length=16,
        limit_train_batches=2,
        max_epochs=1,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        trainer_kwargs={"data_parallel": True, "fsdp": True, "min_size": 64},
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    loop.run()
    import os

    assert "epoch=1.ckpt" in os.listdir(os.path.join(str(tmp_path), loop.hash_))
