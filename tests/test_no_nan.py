"""NaN sanitizer surface (reference ``no_nan_hooks`` equivalents)."""
import numpy as np
import pytest

import mimikit_tpu as mmk


def test_checked_apply_raises_on_nan():
    import jax.numpy as jnp

    from mimikit_tpu.modules.no_nan import checked_apply

    def bad(x):
        return jnp.log(x)  # nan for negative inputs

    with pytest.raises(Exception):
        checked_apply(bad, jnp.asarray(-1.0))

    # clean input passes through
    out = checked_apply(bad, jnp.asarray(1.0))
    assert float(out) == 0.0


def test_assert_all_finite():
    import jax.numpy as jnp

    from mimikit_tpu.modules.no_nan import assert_all_finite

    assert_all_finite({"a": jnp.ones(3)}, "params")
    with pytest.raises(RuntimeError, match="non-finite"):
        assert_all_finite({"a": jnp.asarray([1.0, np.nan])}, "params")


def test_epoch_metrics_raises_on_nan_loss():
    from mimikit_tpu.loops.logger import EpochMetrics

    m = EpochMetrics()
    m.check_loss(1.0)
    with pytest.raises(RuntimeError):
        m.check_loss(float("nan"))
    with pytest.raises(RuntimeError):
        m.check_loss(float("inf"))
