"""IO-module factories: serializable configs that build flax modules.

Rebuild of ``mimikit/modules/io.py:38-313``.  An :class:`IOModule` is a
``Config`` dataclass holding user-facing fields plus runtime wiring slots
(``in_dim``/``out_dim``/``frame_size``/``class_size``/``sampler``…) set once
via :meth:`IOModule.set` by the IOSpec binding step; :meth:`IOModule.module`
then builds the concrete flax module (input adapter or output head).
"""
from __future__ import annotations

import abc
import dataclasses as dtc
from enum import auto
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config, private_runtime_field
from ..utils import AutoStrEnum
from .activations import ActivationConfig
from .misc import unfold
from .resamplers import Conv1dResampler
from .targets import OutputWrapper
from .heads import (
    MLP,
    ParametrizedGaussian,
    ParametrizedLinear,
    ParametrizedLogistic,
)

__all__ = [
    "LinearIO",
    "ChunkedLinearIO",
    "FramedLinearIO",
    "EmbeddingIO",
    "EmbeddingBagIO",
    "EmbeddingConv1d",
    "FramedConv1dIO",
    "MLPIO",
    "VectorMix",
    "Gaussian",
    "Affine",
    "Logistic",
    "IOModule",
    "ZipMode",
    "ZipReduceVariables",
    "Linearizer",
]


class Linearizer(nn.Module):
    """class index -> [-1, 1] float (reference ``io.py:106-112``).

    Int inputs have no float dtype to follow, so the output dtype comes
    from the mixed-precision policy (``precision.compute_dtype`` — f32 by
    default): emitting f32 under a bf16 policy would re-promote every
    downstream matmul to f32."""

    class_size: int

    @nn.compact
    def __call__(self, x):
        from ..precision import compute_dtype

        return ((x.astype(compute_dtype()) / self.class_size) - 0.5) * 2


class Pipeline(nn.Module):
    """before* -> core -> after* with optional dropout; the materialization
    of ``IOModule.wrap`` (reference ``io.py:77-103``)."""

    before: Tuple[nn.Module, ...]
    core: nn.Module
    after: Tuple[nn.Module, ...]
    core_takes_train: bool = False
    dropout: float = 0.0
    dropout1d: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, tied_kernel=None, **_):
        for m in self.before:
            x = m(x)
        if tied_kernel is not None and isinstance(self.core, _Dense):
            x = self.core(x, tied_kernel=tied_kernel)
        elif self.core_takes_train:
            x = self.core(x, train=train)
        else:
            x = self.core(x)
        for m in self.after:
            x = m(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.dropout1d > 0:
            # drop whole feature channels across time: mask (B, 1, D)
            keep = 1.0 - self.dropout1d
            if train:
                mask = jnp.asarray(
                    nn.Dropout(self.dropout1d, deterministic=False)(
                        jnp.ones((x.shape[0], 1, x.shape[-1]), x.dtype)
                    )
                )
                x = x * mask
        return x


class _Dense(nn.Module):
    out_dim: int
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x, tied_kernel=None):
        if tied_kernel is not None:
            # live weight tying: use the (transposed) sibling kernel, keep an
            # own bias (WaveNet tie_io_weights, reference wavenet_v2.py:247-254)
            y = x @ tied_kernel
            if self.use_bias:
                bias = self.param(
                    "tied_bias", nn.initializers.zeros, (self.out_dim,)
                )
                y = y + bias
            return y
        layer = nn.Dense(self.out_dim, use_bias=self.use_bias)
        if self.weight_norm:
            layer = nn.WeightNorm(layer)
        return layer(x)


class _Embed(nn.Module):
    num: int
    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Embed(self.num, self.dim)(x)


class _UnfoldM(nn.Module):
    size: int
    step: int

    @nn.compact
    def __call__(self, x):
        return unfold(x, -1, self.size, self.step)


class _ChunkSum(nn.Module):
    n_chunks: int

    @nn.compact
    def __call__(self, x):
        return sum(jnp.split(x, self.n_chunks, axis=-1))


@dtc.dataclass
class IOModule(Config, abc.ABC):
    activation: Optional[ActivationConfig] = None
    dropout: float = 0.0
    dropout1d: float = 0.0

    in_dim: Optional[int] = private_runtime_field(None)
    out_dim: Optional[int] = private_runtime_field(None)
    hop_length: Optional[int] = private_runtime_field(None)
    frame_size: Optional[int] = private_runtime_field(None)
    class_size: Optional[int] = private_runtime_field(None)
    sampler: Optional[nn.Module] = private_runtime_field(None)
    weight_norm: bool = private_runtime_field(False)
    # bug-compat: reproduce the reference Conv1dResampler's reshape
    # permutation (resamplers.py:40-42) so trained reference checkpoints
    # that learned THROUGH it import exactly (JukeBox bottom tier)
    ref_scramble: bool = private_runtime_field(False)
    with_linearizer: bool = private_runtime_field(False)
    with_unfold: bool = private_runtime_field(False)
    with_n_chunks: Optional[int] = private_runtime_field(None)

    def set(self, **kwargs):
        for k, v in kwargs.items():
            if not hasattr(self, k):
                raise AttributeError(f"attribute '{k}' not found in IOModule")
            if getattr(self, k) is not None and not (
                isinstance(getattr(self, k), bool) and getattr(self, k) is False
            ):
                raise RuntimeError(
                    f"can not set attribute '{k}'. It has already been set to"
                    f" '{getattr(self, k)}'"
                )
            setattr(self, k, v)
        return self

    def not_none(self, *args):
        msg = ""
        for k in args:
            if getattr(self, k) is None:
                msg += (
                    f"- '{k}' can not be None with module_type"
                    f" '{type(self).__qualname__}'\n"
                )
        if msg:
            raise ValueError(msg)

    @abc.abstractmethod
    def module(self) -> nn.Module:
        ...

    def wrap(self, core: nn.Module, core_takes_train: bool = False) -> nn.Module:
        before = []
        if self.with_linearizer:
            before.append(Linearizer(self.class_size))
        if self.with_unfold:
            self.not_none("frame_size", "hop_length")
            before.append(_UnfoldM(self.frame_size, self.hop_length))
        after = []
        if self.with_n_chunks is not None:
            after.append(_ChunkSum(self.with_n_chunks))
        if self.activation is not None and str(self.activation.act) != "Identity":
            if self.activation.scaled:
                self.activation.dim = self.out_dim
            after.append(self.activation.get())
        mod = Pipeline(
            before=tuple(before),
            core=core,
            after=tuple(after),
            core_takes_train=core_takes_train,
            dropout=self.dropout,
            dropout1d=self.dropout1d,
        )
        if self.sampler is not None:
            return OutputWrapper(estimator=mod, sampler=self.sampler)
        return mod


@dtc.dataclass
class LinearIO(IOModule):
    bias: bool = True

    def module(self) -> nn.Module:
        self.not_none("out_dim")
        return self.wrap(_Dense(self.out_dim, self.bias, self.weight_norm))


@dtc.dataclass
class FramedLinearIO(IOModule):
    """linearize + unfold(frame) + Dense — the SampleRNN frame input."""

    def module(self) -> nn.Module:
        self.not_none("frame_size", "hop_length", "out_dim", "class_size")
        self.with_linearizer = True
        self.with_unfold = True
        return self.wrap(_Dense(self.out_dim, weight_norm=self.weight_norm))


@dtc.dataclass
class ChunkedLinearIO(IOModule):
    bias: bool = True
    n_chunks: int = 1

    def module(self) -> nn.Module:
        self.not_none("out_dim")
        self.with_n_chunks = self.n_chunks
        return self.wrap(
            _Dense(self.out_dim * self.n_chunks, self.bias, self.weight_norm)
        )


@dtc.dataclass
class EmbeddingIO(IOModule):
    def module(self) -> nn.Module:
        self.not_none("class_size", "out_dim")
        return self.wrap(_Embed(self.class_size, self.out_dim))


class _EmbeddingBag(nn.Module):
    """mean of embeddings over the frame axis (torch EmbeddingBag default)."""

    num: int
    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Embed(self.num, self.dim)(x).mean(axis=-2)


@dtc.dataclass
class EmbeddingBagIO(IOModule):
    def module(self) -> nn.Module:
        self.not_none("class_size", "frame_size", "hop_length", "out_dim")
        self.with_unfold = True
        return self.wrap(_EmbeddingBag(self.class_size, self.out_dim))


class _EmbedConv(nn.Module):
    num: int
    dim: int
    frame_size: int
    weight_norm: bool = False
    ref_scramble: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, n_frames, frame_size) ints
        h = nn.Embed(self.num, self.dim)(x)  # (B, nf, fs, dim)
        return Conv1dResampler(
            in_dim=self.dim, t_factor=1 / self.frame_size, d_factor=1,
            weight_norm=self.weight_norm, ref_scramble=self.ref_scramble,
        )(h)


@dtc.dataclass
class EmbeddingConv1d(IOModule):
    """Embedding + conv frame-collapse — SampleRNN bottom-tier input."""

    def module(self) -> nn.Module:
        self.not_none("class_size", "frame_size", "hop_length", "out_dim")
        self.with_unfold = True
        return self.wrap(
            _EmbedConv(
                self.class_size, self.out_dim, self.frame_size,
                self.weight_norm, self.ref_scramble,
            )
        )


class _FramedConv(nn.Module):
    frame_size: int
    out_dim: int
    weight_norm: bool = False
    ref_scramble: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, n_frames, frame_size) floats
        B, nf, fs = x.shape
        h = x.reshape(B, nf * fs, 1)
        return Conv1dResampler(
            in_dim=1, t_factor=1 / self.frame_size, d_factor=self.out_dim,
            weight_norm=self.weight_norm, ref_scramble=self.ref_scramble,
        )(h)


@dtc.dataclass
class FramedConv1dIO(IOModule):
    def module(self) -> nn.Module:
        self.not_none("frame_size", "out_dim")
        self.with_linearizer = self.class_size is not None
        self.with_unfold = True
        if self.hop_length is None:
            self.hop_length = 1
        return self.wrap(
            _FramedConv(
                self.frame_size, self.out_dim, self.weight_norm,
                self.ref_scramble,
            )
        )


@dtc.dataclass
class MLPIO(IOModule):
    hidden_dim: int = 128
    n_hidden_layers: int = 1
    activation: ActivationConfig = dtc.field(
        default_factory=lambda: ActivationConfig("Mish")
    )
    bias: bool = True
    dropout: float = 0.0
    dropout1d: float = 0.0
    min_temperature: Optional[float] = 1e-4

    def module(self) -> nn.Module:
        self.not_none("in_dim", "out_dim")
        act = self.activation.get() if self.activation is not None else None
        mod = MLP(
            in_dim=self.in_dim,
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            n_hidden_layers=self.n_hidden_layers,
            activation=act,
            use_bias=self.bias,
            dropout=self.dropout,
            dropout1d=self.dropout1d,
            min_temperature=self.min_temperature,
            weight_norm=self.weight_norm,
        )
        self.activation = None
        return self.wrap(mod, core_takes_train=True)


class _VMix(nn.Module):
    hidden: int
    out_dim: int
    act: nn.Module
    glu: bool

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden * (2 if self.glu else 1))(x)
        h = self.act(h)
        v = self.param(
            "v", nn.initializers.normal(1.0), (self.hidden, self.out_dim)
        )
        return h @ v


@dtc.dataclass
class VectorMix(IOModule):
    hidden_dim: int = 128
    hidden_activation: ActivationConfig = dtc.field(
        default_factory=lambda: ActivationConfig("Sigmoid")
    )

    def module(self):
        act = self.hidden_activation.get()
        return _VMix(
            hidden=self.hidden_dim,
            out_dim=self.out_dim,
            act=act,
            glu=str(self.hidden_activation.act) == "GLU",
        )


@dtc.dataclass
class Gaussian(IOModule):
    bias: bool = False
    min_std: float = 1e-4

    def module(self) -> nn.Module:
        return ParametrizedGaussian(
            input_dim=self.in_dim,
            z_dim=self.out_dim,
            use_bias=self.bias,
            min_std=self.min_std,
            return_params=False,
        )


@dtc.dataclass
class Affine(IOModule):
    bias: bool = True

    def module(self) -> nn.Module:
        return ParametrizedLinear(self.in_dim, self.out_dim, self.bias)


@dtc.dataclass
class Logistic(IOModule):
    bias: bool = True

    def module(self) -> nn.Module:
        return ParametrizedLogistic(self.in_dim, self.out_dim, self.bias)


class ZipMode(AutoStrEnum):
    sum = auto()
    mean = auto()
    static_mix = auto()


class ZipReduceVariables(nn.Module):
    """Reduce per-variable head outputs: sum / mean / learned softmax mix
    (reference ``io.py:289-313``)."""

    mode: str
    heads: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, inputs: Tuple, train: bool = False):
        m = len(self.heads)
        if str(self.mode) == "static_mix":
            w = self.param(
                "weights", lambda k, s: -jnp.ones(s) * 0.5, (m,)
            )
            w = nn.softmax(w, axis=0)
        elif str(self.mode) == "mean":
            w = jnp.ones(m) / m
        else:
            w = jnp.ones(m)
        y = None
        for i, (head, x) in enumerate(zip(self.heads, inputs)):
            out = head(x, train=train) if isinstance(head, Pipeline) else head(x)
            # mix weights follow the head output's dtype (f32 weights would
            # re-promote a bf16 activation path)
            wi = w[i].astype(out.dtype)
            y = out * wi if y is None else y + out * wi
        return y
