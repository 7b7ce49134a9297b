"""Flat-buffer optimizer adapter: one fused update kernel per step.

A model's param tree has tens of small leaves (the seq2seq bench net: 53,
mostly (512, 512) gate matrices).  ``optax`` updates each leaf with its own
fused elementwise kernel, so the optimizer costs ~50 kernel launches of a
few hundred KB each — on the bench TPU that measured **2.9 ms** for a
53.5 MB Adam tree whose pure HBM traffic (7x the param bytes) is worth
~0.5 ms.  Raveling the tree into ONE contiguous vector turns the whole
update into a single fused kernel at full HBM bandwidth; the only added
cost is one concat of the grads and one unravel of the updates per step
(2 x param-bytes of copies).

``flat_optimizer`` wraps any ``optax.GradientTransformation`` (including
composed chains, ``inject_hyperparams`` schedules and ``MultiSteps``): the
wrapped transform sees a single-leaf tree, so every elementwise op —
Adam moments, global-norm clipping, schedule scaling, micro-batch
accumulation — computes the same values it would per-leaf.  Elementwise
transforms (Adam, schedules, MultiSteps) are bit-exact vs the unwrapped
optimizer; global reductions (clip_by_global_norm) sum squares in a
different order and can differ by <=1 ULP (pinned in
tests/test_train_loop.py).

Do NOT use under sharded (fsdp) params: raveling replicated-concats the
sharded leaves and defeats the sharding; ``TrainARMLoop`` only applies the
wrapper on the single-device path.

Reference context: the torch reference keeps torch.optim.Adam's per-tensor
loop (/root/reference/mimikit/loops/train_loops.py:60-75); fusing the
update is a TPU-side throughput choice, not a parity divergence.
"""
from typing import Any

import jax
import optax
from jax.flatten_util import ravel_pytree

__all__ = ["flat_optimizer", "ravel_restored_state", "can_flatten"]


def can_flatten(params) -> bool:
    """True when every leaf shares one dtype (ravel_pytree would silently
    upcast mixed-dtype trees, changing optimizer numerics)."""
    leaves = jax.tree_util.tree_leaves(params)
    if not leaves:
        return False
    d0 = leaves[0].dtype
    return all(l.dtype == d0 for l in leaves)


def flat_optimizer(tx: optax.GradientTransformation,
                   params_example) -> optax.GradientTransformation:
    """Wrap ``tx`` so it updates one raveled vector instead of the tree.

    ``params_example`` fixes the tree layout; the returned transform's
    ``init``/``update`` still take and return trees of that layout, so it
    is a drop-in replacement anywhere ``tx`` was used.  State is the inner
    transform's state over the flat vector (pickles/restores like any
    optax state; see :func:`ravel_restored_state` for importing states
    saved by the unwrapped optimizer).
    """
    _, unravel = ravel_pytree(params_example)

    def init(params):
        flat, _ = ravel_pytree(params)
        return tx.init(flat)

    def update(grads, state, params=None, **extra):
        gflat, _ = ravel_pytree(grads)
        pflat = ravel_pytree(params)[0] if params is not None else None
        uflat, state = tx.update(gflat, state, pflat, **extra)
        return unravel(uflat), state

    return optax.GradientTransformation(init, update)


def ravel_restored_state(state: Any, params) -> Any:
    """Convert an optimizer state saved by the UNWRAPPED optimizer (leaf
    subtrees shaped like ``params``) into the flat layout.

    Walks the state and ravels every subtree whose structure matches the
    param tree (Adam's mu/nu, MultiSteps' acc_grads, ...).  States already
    flat pass through unchanged.
    """
    tdef = jax.tree_util.tree_structure(params)
    if tdef.num_leaves <= 1:
        return state

    def is_param_tree(x):
        try:
            return jax.tree_util.tree_structure(x) == tdef
        except Exception:
            return False

    def convert(x):
        return ravel_pytree(x)[0] if is_param_tree(x) else x

    return jax.tree_util.tree_map(convert, state, is_leaf=is_param_tree)
