"""Network interfaces: the Auto-Regressive Model contract.

Rebuild of ``/root/reference/mimikit/networks/arm.py``.  A network here is a
thin stateful wrapper (params + carried state + rng) around a pure flax
module, preserving the reference's public surface (``rf``, ``train_batch``,
``generate_step``…) while the hot paths (train step, decode scan) go through
the functional core directly.
"""
from __future__ import annotations

import abc
import dataclasses as dtc
from typing import Optional, Set, Tuple

import jax
import numpy as np

from typing import TYPE_CHECKING

from ..config import Config, Configurable
from ..features.item_spec import ItemSpec

if TYPE_CHECKING:  # avoid circular import (io_spec -> modules.io -> networks)
    from ..io_spec import IOSpec

__all__ = ["NetworkConfig", "ARM", "ARMWithHidden", "AutoEncoder"]


@dtc.dataclass
class NetworkConfig(Config, abc.ABC):
    @property
    @abc.abstractmethod
    def io_spec(self) -> "IOSpec":
        ...


class _NetworkBase(Configurable, abc.ABC):
    """Shared runtime plumbing: params container + rng streams."""

    module = None  # the flax core
    params = None  # pytree of parameters
    _rng: Optional[jax.Array] = None

    @property
    def device(self):
        try:
            leaf = jax.tree_util.tree_leaves(self.params)[0]
            return list(leaf.devices())[0]
        except Exception:
            return jax.devices()[0]

    def next_rng(self) -> jax.Array:
        if self._rng is None:
            self._rng = jax.random.PRNGKey(0)
        self._rng, k = jax.random.split(self._rng)
        return k

    def seed(self, seed: int):
        self._rng = jax.random.PRNGKey(seed)
        return self

    @property
    def n_parameters(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))

    @property
    @abc.abstractmethod
    def config(self) -> NetworkConfig:
        ...

    @property
    @abc.abstractmethod
    def rf(self):
        ...

    @abc.abstractmethod
    def train_batch(self, item_spec: ItemSpec):
        ...

    @abc.abstractmethod
    def test_batch(self, item_spec: ItemSpec):
        ...

    @abc.abstractmethod
    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        ...

    @abc.abstractmethod
    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters) -> Tuple:
        ...

    @abc.abstractmethod
    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        ...

    @property
    @abc.abstractmethod
    def generate_params(self) -> Set[str]:
        ...

    def stepwise_step_fn(self, parameters: dict):
        """Optional device fast path for ``GenerateLoopV2``'s stepwise
        fallback (the reference-semantics per-step loop,
        ``/root/reference/mimikit/loops/generate.py:207-219``).

        Return a PURE jit-safe function ``(params, window_inputs, rng) ->
        outputs_tuple`` equivalent to ``generate_step(inputs, t=t,
        **parameters)`` — only valid when the step is t-independent and
        shape-static (elements of the returned tuple may be ``None`` for
        tensors the step does not write).  The loop then fuses
        window-slice + step + buffer-write into one jitted dispatch per
        step and keeps every tensor device-resident: the host loop pays a
        full tunnel round trip per op, ~10,000x slower on remote TPU.

        Default ``None``: keep the host loop (stateful / t-dependent
        ``generate_step`` implementations, e.g. SampleRNN's tier caches).
        """
        return None


class ARM(_NetworkBase, abc.ABC):
    """Interface for Auto Regressive Networks."""


class ARMWithHidden(ARM, abc.ABC):
    @abc.abstractmethod
    def reset_hidden(self) -> None:
        ...


class AutoEncoder(_NetworkBase, abc.ABC):
    """Same surface for non-AR models (reference ``arm.py:90-141``)."""
