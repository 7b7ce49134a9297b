"""Loop callbacks: progress, checkpointing, per-epoch generation.

Rebuild of ``/root/reference/mimikit/loops/callbacks.py`` without the
pytorch-lightning Callback machinery — the train loop invokes these hooks
directly.
"""
from __future__ import annotations

import os
from typing import Iterable

from ..checkpoint import Checkpoint

__all__ = [
    "is_notebook",
    "tqdm",
    "EpochProgressBarCallback",
    "TrainingProgressBar",
    "GradNormCallback",
    "MMKCheckpoint",
    "GenerateCallback",
]


def is_notebook() -> bool:
    try:
        from IPython import get_ipython

        shell = get_ipython().__class__.__name__
        return shell in ("ZMQInteractiveShell", "Shell")
    except Exception:
        return False


try:
    if is_notebook():
        from tqdm.notebook import tqdm  # type: ignore
    else:
        from tqdm.auto import tqdm  # type: ignore
except ImportError:  # tqdm optional: plain passthrough

    def tqdm(it, **kwargs):  # type: ignore
        return it


class EpochProgressBarCallback:
    """Epoch-level tqdm bar (reference ``callbacks.py:39-51``); the train
    loop drives per-batch bars itself, this adds the outer epoch bar."""

    def __init__(self):
        self.epoch_bar = None

    def on_train_start(self, max_epochs: int):
        self.epoch_bar = tqdm(
            range(1, max_epochs), unit="epoch", position=0, leave=False,
            dynamic_ncols=True,
        )

    def on_train_epoch_end(self, *a, **k):
        if self.epoch_bar is not None:
            self.epoch_bar.update()


class TrainingProgressBar:
    """1s-throttled batch bar factory (reference ``callbacks.py:54-93``)."""

    def __init__(self, mininterval: float = 1.0):
        self.mininterval = mininterval

    def bar(self, iterable, total=None, desc=None):
        return tqdm(
            iterable, total=total, desc=desc, leave=True, dynamic_ncols=True,
            smoothing=0, mininterval=self.mininterval,
        )


class GradNormCallback:
    """Collects global gradient norms (reference ``callbacks.py:96-102``).
    Wire by calling ``on_after_backward(grads)`` from a custom step, or use
    ``grad_norm`` directly."""

    def __init__(self):
        self.gradnorms = []

    @staticmethod
    def grad_norm(grads, ord=1.0):
        import jax
        import jax.numpy as jnp

        leaves = jax.tree_util.tree_leaves(grads)
        if ord == 1.0:
            return sum(jnp.abs(l).sum() for l in leaves)
        return sum((jnp.abs(l) ** ord).sum() for l in leaves) ** (1.0 / ord)

    def on_after_backward(self, grads) -> None:
        self.gradnorms.append(float(self.grad_norm(grads)))


class MMKCheckpoint:
    """Epoch-interval checkpointing (reference ``callbacks.py:105-152``)."""

    def __init__(self, epochs=None, root_dir=""):
        self.epochs = epochs
        self.root_dir = root_dir
        self.config = None

    def on_fit_start(self, loop) -> None:
        config = loop.config
        # serialization round-trip sanity check before any training happens
        type(config).deserialize(config.serialize())
        self.config = config

    def should_save(self, epoch: int, step: int) -> bool:
        if type(self.epochs) is int:
            return epoch > 0 and (epoch % self.epochs) == 0
        if isinstance(self.epochs, Iterable):
            return epoch in self.epochs
        return False

    def on_train_epoch_end(
        self, loop, epoch: int, global_step: int, interrupted: bool = False
    ) -> None:
        if interrupted or epoch == loop.train_cfg.max_epochs or self.should_save(
            epoch, global_step
        ):
            self.save_checkpoint(loop, epoch)

    def save_checkpoint(self, loop, epoch: int):
        root_dir, training_id = os.path.split(self.root_dir)
        opt_state = (
            loop.opt_state if loop.train_cfg.save_optimizer else None
        )
        trainer_state = dict(
            fit_loop=dict(epoch=epoch, global_step=loop.global_step)
        )
        Checkpoint(id=training_id, epoch=epoch, root_dir=root_dir).create(
            loop.net,
            self.config,
            optimizer_state=opt_state,
            trainer_state=trainer_state,
        )


class GenerateCallback:
    """Runs a GenerateLoop every n epochs (audio monitoring during training)."""

    def __init__(self, generate_loop=None, every_n_epochs: int = 10):
        self.loop = generate_loop
        self.every_n_epochs = every_n_epochs

    def on_train_epoch_end(self, trainer_loop, epoch: int) -> None:
        if epoch % self.every_n_epochs != 0:
            return
        self.loop.template_vars = dict(epoch=epoch)
        for _ in self.loop.run():
            continue
