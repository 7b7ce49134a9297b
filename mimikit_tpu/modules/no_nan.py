"""NaN sanitizers — the debug guard surface.

The reference registers forward+backward hooks on every submodule raising on
NaN (``modules/no_nan_hooks.py:18-33``) plus a hard raise on NaN/inf loss
(``loops/logger.py:32-34``).  JAX equivalents:

* :func:`checked_apply` — wraps a module apply in ``jax.experimental.checkify``
  so any NaN/inf produced anywhere inside the jitted computation surfaces as
  a checked error with location info;
* :func:`debug_nans` — context manager enabling jax's global nan debugging;
* the train loop's host-side loss check (``EpochMetrics.check_loss``).
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Callable

__all__ = ["checked_apply", "debug_nans", "assert_all_finite", "no_nan_hooks"]


def checked_apply(fn: Callable, *args, **kwargs):
    """Run ``fn`` under checkify's float checks; raises on NaN/inf anywhere
    in the traced computation (the ``no_nan_hooks`` equivalent)."""
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, out = checked(*args, **kwargs)
    err.throw()
    return out


@contextmanager
def debug_nans(enabled: bool = True):
    """Globally raise on any NaN produced under jit within the context."""
    import jax

    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree, name: str = "tree"):
    """Host-side finite check over a pytree (params / grads)."""
    import jax
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf))):
            raise RuntimeError(
                f"non-finite values in {name} at {jax.tree_util.keystr(path)}"
            )


def no_nan_hooks(network):
    """API-compat wrapper of the reference's hook installer
    (``no_nan_hooks.py:18-33``): wraps ``network.forward`` with a host-side
    finite check on its outputs."""
    original = network.forward

    def checked_forward(*args, **kwargs):
        out = original(*args, **kwargs)
        assert_all_finite(out, f"{type(network).__name__}.forward outputs")
        return out

    network.forward = checked_forward
    return network
