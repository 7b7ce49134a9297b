"""Activation factory (reference ``mimikit/modules/activations.py:26-157``).

``ActivationConfig.get()`` returns a flax.linen module; learned variants
(``ScaledActivation``, ``PhaseA/B``) carry parameters, plain ones are
stateless wrappers around jax.nn functions.
"""
from __future__ import annotations

import dataclasses as dtc
from enum import auto
from typing import Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config, private_runtime_field
from ..utils import AutoStrEnum

__all__ = [
    "ActivationEnum",
    "ActivationConfig",
    "Lambda",
    "Abs",
    "Sin",
    "Cos",
    "GatingUnit",
    "StaticScaledActivation",
    "ScaledActivation",
    "PhaseA",
    "PhaseB",
    "PhaseC",
]


class ActivationEnum(AutoStrEnum):
    Tanh = auto()
    Sigmoid = auto()
    Mish = auto()
    ReLU = auto()
    Softplus = auto()
    Identity = auto()
    Abs = auto()
    PhaseA = auto()
    PhaseB = auto()
    PhaseC = auto()
    Sin = auto()
    Cos = auto()
    GLU = auto()
    Softmax = auto()


class Lambda(nn.Module):
    """Stateless activation wrapper so plain functions compose as modules."""

    fn: Callable

    @nn.compact
    def __call__(self, x):
        return self.fn(x)


class Abs(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.abs(x)


class Sin(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.sin(x)


class Cos(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.cos(x)


class GatingUnit(nn.Module):
    @nn.compact
    def __call__(self, x_f, x_g):
        return jnp.tanh(x_f) * nn.sigmoid(x_g)


def _mish(x):
    return x * jnp.tanh(nn.softplus(x))


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * nn.sigmoid(b)


_PLAIN = {
    "Tanh": jnp.tanh,
    "Sigmoid": nn.sigmoid,
    "Mish": _mish,
    "ReLU": nn.relu,
    "Softplus": nn.softplus,
    "Identity": lambda x: x,
    "Abs": jnp.abs,
    "Sin": jnp.sin,
    "Cos": jnp.cos,
    "GLU": _glu,
    "Softmax": lambda x: nn.softmax(x, axis=-1),
}


class ScaledActivation(nn.Module):
    """``act(r·x/s)·s`` with learned per-feature scale/rate projections."""

    activation: nn.Module
    dim: int
    with_rate: bool = True

    @nn.compact
    def __call__(self, x):
        s = nn.Dense(self.dim, name="s")(x)
        r = nn.Dense(self.dim, name="r")(x) if self.with_rate else 1.0
        return self.activation(r * x / s) * s


class StaticScaledActivation(nn.Module):
    activation: nn.Module
    dim: int
    with_rate: bool = True

    @nn.compact
    def __call__(self, x):
        s = self.param("s", nn.initializers.ones, (self.dim,))
        r = (
            self.param("r", nn.initializers.ones, (self.dim,))
            if self.with_rate
            else 1.0
        )
        return self.activation(r * x / s) * s


PI = float(jnp.pi)


class PhaseA(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, phs):
        psis = self.param("psis", nn.initializers.ones, (self.dim,))
        return jnp.cos(jnp.tanh(phs) * psis) * PI


class PhaseB(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, phs):
        psis = self.param("psis", nn.initializers.ones, (self.dim,))
        return jnp.cos(phs * psis) * PI


class PhaseC(nn.Module):
    @nn.compact
    def __call__(self, phs):
        return jnp.tanh(phs) * PI


@dtc.dataclass
class ActivationConfig(Config, type_field=False):
    act: str = "Identity"
    scaled: bool = False
    static: bool = False
    with_rate: bool = False
    params: Dict = dtc.field(default_factory=lambda: {})
    dim: int = private_runtime_field(None)

    def get(self) -> nn.Module:
        act = str(self.act)
        if act in ("PhaseA", "PhaseB"):
            return {"PhaseA": PhaseA, "PhaseB": PhaseB}[act](self.dim)
        if act == "PhaseC":
            return PhaseC()
        base = Lambda(_PLAIN[act]) if act in _PLAIN else Lambda(getattr(nn, act.lower()))
        if self.scaled:
            cls = StaticScaledActivation if self.static else ScaledActivation
            return cls(base, self.dim, self.with_rate)
        return base
