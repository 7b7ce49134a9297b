"""Tied-weight convolutional autoencoder.

Rebuild of ``/root/reference/mimikit/networks/tied_autoencoder.py``: encoder
convs and decoder transposed-convs share the same kernels; optional
non-negative latent (abs) and an independence regularizer pushing
``W·Wᵀ ≈ I`` (returned as a second output, reference ``:68-77``).
"""
from __future__ import annotations

import dataclasses as dtc
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..io_spec import IOSpec

from ..features.item_spec import ItemSpec
from ..modules.io import Pipeline
from ..modules.misc import causal_pad
from .arm import AutoEncoder, NetworkConfig

__all__ = ["TiedAE"]

_DN = ("NWC", "WIO", "NWC")


class TiedAECore(nn.Module):
    kernel_sizes: Tuple[int, ...]
    dims: Tuple[int, ...]
    io_dim: int
    non_negative_latent: bool
    causal: bool
    independence_reg: Optional[float]
    input_modules: Tuple[nn.Module, ...]
    output_modules: Tuple[nn.Module, ...]

    def setup(self):
        in_dims = (self.io_dim, *self.dims[:-1])
        self.kernels = [
            self.param(
                f"w{i}",
                nn.initializers.lecun_normal(),
                (k, d_in, d_out),
            )
            for i, (d_in, d_out, k) in enumerate(
                zip(in_dims, self.dims, self.kernel_sizes)
            )
        ]

    def __call__(self, inputs: Tuple, hidden=None, train: bool = False,
                 temperature=None):
        x = None
        for mod, xi in zip(self.input_modules, inputs):
            y = mod(xi, train=train) if isinstance(mod, Pipeline) else mod(xi)
            x = y if x is None else x + y
        paddings = [k // 2 for k in self.kernel_sizes]
        indp = 0.0
        indp_r = self.independence_reg or 0.0
        for w, p in zip(self.kernels, paddings):
            if self.causal:
                x = causal_pad(x, (2 * p, 0))
                pad = [(0, 0)]
            else:
                pad = [(p, p)]
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=pad, dimension_numbers=_DN
            )
            if self.non_negative_latent:
                x = jnp.abs(x)
        for w, p in zip(reversed(self.kernels), reversed(paddings)):
            x = jax.lax.conv_transpose(
                x,
                w,
                strides=(1,),
                padding=[(p, p)],
                dimension_numbers=_DN,
                transpose_kernel=True,
            )
            if indp_r:
                ws = w.sum(axis=0)  # (d_in, d_out)
                wwt = ws @ ws.T
                indp = indp + jnp.abs(wwt - jnp.eye(wwt.shape[0])).mean()
        y = None
        for mod in self.output_modules:
            o = mod(x, train=train) if isinstance(mod, Pipeline) else mod(
                x, train=train, temperature=temperature
            )
            y = o if y is None else y + o
        return (y, indp * indp_r), ()


class TiedAE(AutoEncoder):
    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: "IOSpec" = None
        kernel_sizes: Tuple[int, ...] = (3,)
        dims: Tuple[int, ...] = (16,)
        non_negative_latent: bool = False
        causal_pad: bool = False
        independence_reg: Optional[float] = None

    @classmethod
    def from_config(cls, config: "TiedAE.Config"):
        io_dim = config.dims[0]
        input_modules = tuple(
            spec.module.copy().set(out_dim=io_dim).module()
            for spec in config.io_spec.inputs
        )
        output_modules = tuple(
            spec.module.copy().set(in_dim=io_dim).module()
            for spec in config.io_spec.targets
        )
        core = TiedAECore(
            kernel_sizes=config.kernel_sizes,
            dims=config.dims,
            io_dim=io_dim,
            non_negative_latent=config.non_negative_latent,
            causal=config.causal_pad,
            independence_reg=config.independence_reg,
            input_modules=input_modules,
            output_modules=output_modules,
        )
        return cls(config=config, core=core)

    def __init__(self, *, config, core):
        self._config = config
        self.module = core
        self.params = None
        self.training = True

    @property
    def config(self):
        return self._config

    @property
    def rf(self):
        return 0

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def init_params(self, batch_size: int = 1, batch_length: int = 8, rng=None):
        if rng is None:
            rng = self.next_rng()
        from ..features.functionals import Discrete as _D

        dummy = []
        for spec in self.config.io_spec.inputs:
            if isinstance(spec.elem_type, _D):
                dummy.append(jnp.zeros((batch_size, batch_length), jnp.int32))
            else:
                dummy.append(
                    jnp.zeros(
                        (batch_size, batch_length, spec.elem_type.size), jnp.float32
                    )
                )
        variables = self.module.init(
            {"params": rng, "dropout": rng, "sample": rng}, tuple(dummy), None, True
        )
        self.params = variables["params"]
        return self.params

    def _ensure_params(self, inputs):
        if self.params is None:
            self.init_params(
                batch_size=np.shape(inputs[0])[0],
                batch_length=np.shape(inputs[0])[1],
            )

    def forward(self, inputs: Tuple):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        self._ensure_params(inputs)
        (y, indp), _ = self.module.apply(
            {"params": self.params}, inputs, None, self.training,
            rngs={"dropout": self.next_rng(), "sample": self.next_rng()},
        )
        return y, indp

    def train_batch(self, item_spec: ItemSpec):
        return tuple(
            spec.to_batch_item(item_spec) for spec in self.config.io_spec.inputs
        ), tuple(
            spec.to_batch_item(item_spec) for spec in self.config.io_spec.targets
        )

    def test_batch(self, item_spec: ItemSpec):
        return self.train_batch(item_spec)

    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        self._ensure_params(prompts)

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        was = self.training
        self.training = False
        try:
            y, _ = self.forward(inputs)
            return (y,)
        finally:
            self.training = was

    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        pass

    @property
    def generate_params(self):
        return set()
