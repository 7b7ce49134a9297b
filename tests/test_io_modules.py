"""IO module factories (reference ``tests/test_io_modules.py`` extended)."""
import numpy as np
import pytest

import mimikit_tpu as mmk


def _build_and_run(io_module, x, **set_kwargs):
    import jax

    mod = io_module.set(**set_kwargs).module()
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )
    return mod.apply(
        variables, x, rngs={"sample": jax.random.PRNGKey(2)}
    )


@pytest.mark.parametrize("in_dim", [13, 32])
@pytest.mark.parametrize("out_dim", [7, 16])
def test_vector_mix(in_dim, out_dim):
    x = np.random.randn(2, 5, in_dim).astype(np.float32)
    y = _build_and_run(mmk.VectorMix(hidden_dim=8), x, in_dim=in_dim, out_dim=out_dim)
    assert y.shape == (2, 5, out_dim)


def test_linear_io():
    x = np.random.randn(2, 5, 8).astype(np.float32)
    y = _build_and_run(mmk.LinearIO(), x, in_dim=8, out_dim=12)
    assert y.shape == (2, 5, 12)


def test_chunked_linear_io_sums_chunks():
    x = np.random.randn(2, 5, 8).astype(np.float32)
    y = _build_and_run(mmk.ChunkedLinearIO(n_chunks=4), x, in_dim=8, out_dim=6)
    assert y.shape == (2, 5, 6)


def test_framed_linear_io():
    x = np.random.randint(0, 16, (2, 40))
    y = _build_and_run(
        mmk.FramedLinearIO(), x, class_size=16, frame_size=8, hop_length=8,
        out_dim=12,
    )
    assert y.shape == (2, 5, 12)


def test_embedding_io():
    x = np.random.randint(0, 16, (2, 40))
    y = _build_and_run(mmk.EmbeddingIO(), x, class_size=16, out_dim=12)
    assert y.shape == (2, 40, 12)


def test_embedding_conv1d():
    x = np.random.randint(0, 16, (2, 40))
    y = _build_and_run(
        mmk.EmbeddingConv1d(), x, class_size=16, frame_size=8, hop_length=1,
        out_dim=12,
    )
    assert y.shape == (2, 33, 12)


def test_framed_conv1d_io():
    x = np.random.randint(0, 16, (2, 40))
    y = _build_and_run(
        mmk.FramedConv1dIO(), x, class_size=16, frame_size=8, hop_length=1,
        out_dim=12,
    )
    assert y.shape == (2, 33, 12)


def test_mlp_io_learned_temperature():
    import jax

    x = np.random.randn(2, 5, 8).astype(np.float32)
    io_mod = mmk.MLPIO(hidden_dim=16, min_temperature=1e-3)
    mod = io_mod.set(in_dim=8, out_dim=10, sampler=None).module()
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    y = mod.apply(variables, x)
    assert y.shape == (2, 5, 10)


def test_set_raises_on_reassignment():
    m = mmk.LinearIO()
    m.set(out_dim=4)
    with pytest.raises(RuntimeError):
        m.set(out_dim=8)


def test_zip_reduce_modes():
    import jax

    x = np.random.randn(2, 5, 8).astype(np.float32)
    for mode in ("sum", "mean", "static_mix"):
        heads = tuple(
            mmk.LinearIO().set(in_dim=8, out_dim=6).module() for _ in range(2)
        )
        zrv = mmk.ZipReduceVariables(mode=mode, heads=heads)
        variables = zrv.init(jax.random.PRNGKey(0), (x, x))
        y = zrv.apply(variables, (x, x))
        assert y.shape == (2, 5, 6)


def test_cross_entropy_finite_at_huge_logits_and_grads_flow():
    """cross_entropy pins ONE materialization of its logits
    (jax.lax.optimization_barrier): under a bf16 mixed-precision forward
    XLA may rematerialize the producer separately for the max and the
    exp(x - max), and once |logit| >= 2**15 the one-bf16-ulp disagreement
    exceeds f32's exp underflow range — logsumexp returned -inf from
    FINITE logits (measured on v5e, see the docstring).  This pin
    exercises the huge-logit regime and the barrier's gradient path."""
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.modules.loss_functions import cross_entropy

    rs = np.random.RandomState(0)
    # bf16-rounded producer at |x| ~ 1.7e5 — the failing regime's scale
    logits = (
        rs.randn(64, 256).astype(np.float32) * 3e4
    ).astype(jnp.bfloat16).astype(np.float32)
    labels = rs.randint(0, 256, (64,))

    @jax.jit
    def loss(lg):
        return cross_entropy(lg, jnp.asarray(labels))

    val, grad = jax.value_and_grad(loss)(jnp.asarray(logits))
    assert bool(jnp.isfinite(val))
    assert bool(jnp.all(jnp.isfinite(grad)))
    # grad == softmax - one_hot: rows sum to ~0 and are nonzero
    assert float(jnp.abs(grad.sum(-1)).max()) < 1e-3
    assert float(jnp.abs(grad).max()) > 0.0

    # the mode scopes (precision.loss_barrier): "bf16" barriers a
    # LOSSLESS bf16 cast (these logits are bf16-representable) — value
    # equal to the default full barrier; None skips the barrier (the
    # pure-f32 train step's mode) and still matches on CPU
    from mimikit_tpu import precision as prec

    with prec.loss_barrier("bf16"):
        v_bf16 = jax.jit(loss)(jnp.asarray(logits))
    with prec.loss_barrier(None):
        v_none = jax.jit(loss)(jnp.asarray(logits))
    assert float(jnp.abs(v_bf16 - val)) < 1e-6 * max(1.0, abs(float(val)))
    assert float(jnp.abs(v_none - val)) < 1e-6 * max(1.0, abs(float(val)))
