"""Checkpoint bank behaviors (reference ``tests/test_checkpointable.py``):
classes defined outside the package roundtrip through the h5 bank, and
weight-normed param trees ('/' in flax param names) restore bit-exact."""
import dataclasses as dtc

import numpy as np
import pytest

import mimikit_tpu as mmk
from mimikit_tpu.networks.arm import ARM, NetworkConfig


def _simple_io():
    ex = mmk.Extractor("signal", mmk.FileToSignal(16000))
    return mmk.IOSpec(
        inputs=(
            mmk.InputSpec(
                extractor_name="signal",
                transform=mmk.Normalize(),
                module=mmk.LinearIO(),
            ).bind_to(ex),
        ),
        targets=(
            mmk.TargetSpec(
                extractor_name="signal",
                transform=mmk.Normalize(),
                module=mmk.LinearIO(),
                objective=mmk.Objective(objective_type="reconstruction"),
            ).bind_to(ex),
        ),
    )


class MyCustom(ARM):
    """An ARM defined outside mimikit_tpu — config type tags must still
    resolve it on reload."""

    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: mmk.IOSpec = None
        x: int = 1

    @classmethod
    def from_config(cls, config):
        import jax.numpy as jnp

        net = cls()
        net._config = config
        net.params = {"w": jnp.full((config.x, config.x), 7.0)}
        return net

    def __init__(self):
        self.training = True

    @property
    def config(self):
        return self._config

    @property
    def rf(self):
        return 1

    @property
    def generate_params(self):
        return set()

    def train_batch(self, item_spec):
        return (), ()

    def test_batch(self, item_spec):
        return (), ()

    def before_generate(self, prompts, batch_index):
        pass

    def generate_step(self, inputs, **parameters):
        return inputs

    def after_generate(self, outputs, batch_index):
        pass


def test_saves_and_loads_class_defined_outside_package(tmp_path):
    import jax.numpy as jnp

    model = MyCustom.from_config(MyCustom.Config(io_spec=_simple_io()))
    model.params = {"w": jnp.full((1, 1), 3.25)}

    ckpt = mmk.Checkpoint(id="123", epoch=1, root_dir=str(tmp_path))
    ckpt.create(network=model)

    loaded = mmk.Checkpoint(id="123", epoch=1, root_dir=str(tmp_path)).network
    assert type(loaded) is MyCustom
    assert loaded.config.x == 1
    assert np.allclose(np.asarray(loaded.params["w"]), 3.25)


def test_weight_normed_params_roundtrip_bit_exact(tmp_path):
    """WeightNorm creates 'kernel/scale' param names; the h5 bank escapes
    the '/' so the tree restores exactly."""
    import jax

    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io, weight_norm=True
        )
    )
    net.seed(0)
    net.init_params(batch_size=1)

    ckpt = mmk.Checkpoint(id="wn", epoch=3, root_dir=str(tmp_path))
    ckpt.create(network=net)
    loaded = mmk.Checkpoint(id="wn", epoch=3, root_dir=str(tmp_path)).network

    flat_a = jax.tree_util.tree_leaves_with_path(net.params)
    flat_b = {
        jax.tree_util.keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_leaves_with_path(loaded.params)
    }
    assert len(flat_a) == len(flat_b)
    n_scales = 0
    for kp, leaf in flat_a:
        key = jax.tree_util.keystr(kp)
        assert np.array_equal(np.asarray(leaf), np.asarray(flat_b[key])), key
        n_scales += "scale" in key
    assert n_scales > 0  # weight norm actually present


def test_checkpoint_bank_layout(tmp_path):
    model = MyCustom.from_config(MyCustom.Config(io_spec=_simple_io()))
    for epoch in (1, 2):
        mmk.Checkpoint(id="run", epoch=epoch, root_dir=str(tmp_path)).create(
            network=model
        )
    import os

    files = sorted(os.listdir(tmp_path / "run"))
    assert files == ["epoch=1.ckpt", "epoch=2.ckpt"]
