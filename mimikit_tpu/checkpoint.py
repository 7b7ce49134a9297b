"""Checkpoint subsystem: content-addressed h5 banks.

Rebuild of ``/root/reference/mimikit/checkpoint.py``: checkpoints live at
``<root_dir>/<id>/epoch=N.ckpt`` — an HDF5 file holding the network state
dict (flax param tree, flattened to ``network/state_dict/<path>`` datasets),
the network/dataset/training configs as embedded YAML attrs, and the trainer
loop state; optimizer state goes to a sibling ``epoch=N.opt`` file.  Lazy
``cached_property`` accessors rebuild dataset, network (with io_spec
re-binding) and optimizer state.
"""
from __future__ import annotations

import dataclasses as dtc
import os
from functools import cached_property
from typing import Optional

import h5py
import numpy as np
import yaml

from .config import Config
from .features.dataset import DatasetConfig

__all__ = ["Checkpoint", "CheckpointBank"]


# flax param names may themselves contain '/' (e.g. WeightNorm's
# 'Dense_0/kernel/scale') — escape them so the h5 path round-trip is exact
def _esc(key: str) -> str:
    return key.replace("%", "%25").replace("/", "%2F")


def _unesc(key: str) -> str:
    return key.replace("%2F", "/").replace("%25", "%")


def _flatten_state(tree, prefix=""):
    """flax-style nested dict -> flat {path: np.ndarray}."""
    import flax.serialization as ser

    state = ser.to_state_dict(tree)

    out = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                k = _esc(str(k))
                rec(v, f"{path}/{k}" if path else k)
        else:
            out[path] = np.asarray(node)

    rec(state, prefix)
    return out


def _unflatten_state(flat):
    root: dict = {}
    for path, arr in flat.items():
        parts = [_unesc(p) for p in path.split("/")]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root


class CheckpointBank:
    """Reader/writer for one ``epoch=N.ckpt`` h5 file."""

    @classmethod
    def save(
        cls,
        filename: str,
        network,
        training_config=None,
        optimizer_state=None,
        trainer_state: Optional[dict] = None,
    ) -> str:
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        with h5py.File(filename, "w") as f:
            net_grp = f.create_group("network")
            net_grp.attrs["config"] = network.config.serialize()
            sd = f.create_group("network/state_dict")
            for path, arr in _flatten_state(network.params).items():
                sd.create_dataset(path, data=arr)
            if training_config is not None:
                f.attrs["dataset"] = training_config.dataset.serialize()
                f.attrs["training"] = training_config.training.serialize()
            else:
                # minimal dataset config so the network alone stays loadable
                features = [
                    *network.config.io_spec.inputs,
                    *network.config.io_spec.targets,
                ]
                schema = {s.extractor_name: s.extractor for s in features}
                f.attrs["dataset"] = DatasetConfig(
                    filename="unknown",
                    sources=(),
                    extractors=tuple(schema.values()),
                ).serialize()
            if trainer_state is not None:
                f.attrs["trainer_state"] = yaml.safe_dump(trainer_state)
        if optimizer_state is not None:
            import pickle

            opt_path = os.path.splitext(filename)[0] + ".opt"
            with open(opt_path, "wb") as fp:
                pickle.dump(optimizer_state, fp)
        return filename


@dtc.dataclass
class Checkpoint:
    id: str
    epoch: int
    root_dir: str = "./"

    def create(
        self,
        network,
        training_config=None,
        optimizer_state=None,
        trainer_state: Optional[dict] = None,
    ):
        CheckpointBank.save(
            self.os_path, network, training_config, optimizer_state, trainer_state
        )
        return self

    @staticmethod
    def get_id_and_epoch(path):
        id_, epoch = path.split("/")[-2:]
        return id_.strip("/"), int(epoch.split(".ckpt")[0].split("=")[-1])

    @staticmethod
    def from_path(path):
        basename = os.path.dirname(os.path.dirname(path))
        return Checkpoint(*Checkpoint.get_id_and_epoch(path), root_dir=basename)

    @property
    def os_path(self):
        return os.path.join(self.root_dir, f"{self.id}/epoch={self.epoch}.ckpt")

    def delete(self):
        os.remove(self.os_path)

    @cached_property
    def dataset_config(self) -> DatasetConfig:
        with h5py.File(self.os_path, "r") as f:
            raw = f.attrs["dataset"]
        return Config.deserialize(raw, as_type=DatasetConfig)

    @cached_property
    def network_config(self):
        with h5py.File(self.os_path, "r") as f:
            raw = f["network"].attrs["config"]
        return Config.deserialize(raw)

    @cached_property
    def training_config(self):
        with h5py.File(self.os_path, "r") as f:
            raw = f.attrs["training"]
        return Config.deserialize(raw)

    @cached_property
    def state_dict(self):
        flat = {}
        with h5py.File(self.os_path, "r") as f:
            sd = f["network/state_dict"]

            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    flat[name] = np.asarray(obj)

            sd.visititems(visit)
        return _unflatten_state(flat)

    @cached_property
    def network(self):
        import flax.serialization as ser
        import jax.numpy as jnp

        cfg = self.network_config
        cfg.io_spec.bind_to(self.dataset_config)
        cls = cfg.owner_class
        net = cls.from_config(cfg)
        if getattr(net, "params", None) is None:
            # shape the param tree so from_state_dict can restore into it;
            # custom ARMs may build params in from_config instead
            net.init_params()
        net.params = ser.from_state_dict(net.params, self.state_dict)
        net.params = __import__("jax").tree_util.tree_map(jnp.asarray, net.params)
        return net

    @cached_property
    def dataset(self):
        ds: DatasetConfig = self.dataset_config
        if os.path.exists(ds.filename):
            return ds.get(mode="r")
        return ds.create(mode="w")

    @cached_property
    def optimizer_state(self):
        opt_path = os.path.join(self.root_dir, f"{self.id}/epoch={self.epoch}.opt")
        if os.path.isfile(opt_path):
            import pickle

            with open(opt_path, "rb") as fp:
                return pickle.load(fp)
        return None

    @cached_property
    def trainer_state(self):
        with h5py.File(self.os_path, "r") as f:
            raw = f.attrs.get("trainer_state", None)
        if raw is not None:
            return yaml.safe_load(raw)
        return None
