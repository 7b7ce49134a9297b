"""Framed/FFT conv ops must match flax.linen exactly (fwd + grads).

These are the compile-friendly spellings WaveGAN uses instead of
``nn.Conv``/``nn.ConvTranspose`` (see ops/framed_conv.py's module
docstring for why); flax itself is the oracle.
"""
import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import pytest

from mimikit_tpu.ops.framed_conv import (
    FramedConv,
    FramedConvTranspose,
    fft_conv1d,
    framed_conv1d,
    framed_conv_transpose1d,
)


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize(
    "k,s,T,Cin,Cout",
    [
        (25, 4, 64, 3, 5),   # WaveGAN discriminator block shape
        (25, 1, 40, 2, 4),   # stride-1 (nearest-upsample generator block)
        (2, 1, 16, 1, 3),
        (9, 4, 37, 2, 2),    # T not divisible by stride
        (5, 3, 22, 1, 1),
    ],
)
def test_framed_conv_matches_flax(k, s, T, Cin, Cout):
    x = _rand(0, 2, T, Cin)
    ref = nn.Conv(Cout, (k,), strides=(s,), padding="SAME")
    v = ref.init(jax.random.PRNGKey(1), x)
    w, b = v["params"]["kernel"], v["params"]["bias"]

    got = framed_conv1d(x, w, b, stride=s, padding="SAME")
    want = ref.apply(v, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gradients (input AND weights) through both spellings agree
    g_ours = jax.grad(
        lambda x, w: framed_conv1d(x, w, b, stride=s).sum(), argnums=(0, 1)
    )(x, w)
    g_ref = jax.grad(
        lambda x, w: ref.apply(
            {"params": {"kernel": w, "bias": b}}, x
        ).sum(),
        argnums=(0, 1),
    )(x, w)
    for a, bb in zip(g_ours, g_ref):
        np.testing.assert_allclose(a, bb, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "k,s,T,Cin,Cout",
    [
        (512, 1, 600, 1, 1),  # WaveGAN post-proc filter shape
        (65, 1, 128, 2, 3),
        (70, 2, 128, 1, 2),   # strided FFT path
    ],
)
def test_fft_conv_matches_flax(k, s, T, Cin, Cout):
    x = _rand(2, 2, T, Cin)
    ref = nn.Conv(Cout, (k,), strides=(s,), padding="SAME")
    v = ref.init(jax.random.PRNGKey(3), x)
    w, b = v["params"]["kernel"], v["params"]["bias"]

    got = fft_conv1d(x, w, b, stride=s, padding="SAME")
    want = ref.apply(v, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    g_ours = jax.grad(lambda w: fft_conv1d(x, w, b, stride=s).sum())(w)
    g_ref = jax.grad(
        lambda w: ref.apply({"params": {"kernel": w, "bias": b}}, x).sum()
    )(w)
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "k,s,T,Cin,Cout",
    [
        (25, 4, 16, 4, 2),   # WaveGAN generator up-block shape
        (25, 4, 7, 2, 3),
        (4, 4, 9, 1, 2),     # k == s
        (3, 2, 11, 2, 1),
        (2, 4, 6, 1, 1),     # s > k-1 branch of the padding rule
        (7, 1, 13, 2, 2),    # stride-1 degenerates to a plain conv
    ],
)
def test_framed_conv_transpose_matches_flax(k, s, T, Cin, Cout):
    x = _rand(4, 2, T, Cin)
    ref = nn.ConvTranspose(Cout, (k,), strides=(s,), padding="SAME")
    v = ref.init(jax.random.PRNGKey(5), x)
    w, b = v["params"]["kernel"], v["params"]["bias"]

    got = framed_conv_transpose1d(x, w, b, stride=s)
    want = ref.apply(v, x)
    assert got.shape == want.shape == (2, T * s, Cout)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    g_ours = jax.grad(
        lambda x, w: framed_conv_transpose1d(x, w, b, stride=s).sum(),
        argnums=(0, 1),
    )(x, w)
    g_ref = jax.grad(
        lambda x, w: ref.apply(
            {"params": {"kernel": w, "bias": b}}, x
        ).sum(),
        argnums=(0, 1),
    )(x, w)
    for a, bb in zip(g_ours, g_ref):
        np.testing.assert_allclose(a, bb, rtol=1e-4, atol=1e-4)


def test_framed_modules_are_param_compatible_with_flax():
    """FramedConv/FramedConvTranspose load nn.Conv/nn.ConvTranspose params
    unchanged (same names, same shapes) and produce the same outputs."""
    x = _rand(6, 2, 32, 3)
    ref = nn.Conv(5, (25,), strides=(4,), padding="SAME")
    v = ref.init(jax.random.PRNGKey(7), x)
    ours = FramedConv(features=5, kernel_size=25, strides=4)
    np.testing.assert_allclose(
        ours.apply(v, x), ref.apply(v, x), rtol=1e-5, atol=1e-5
    )

    ref_t = nn.ConvTranspose(4, (25,), strides=(4,), padding="SAME")
    vt = ref_t.init(jax.random.PRNGKey(8), x)
    ours_t = FramedConvTranspose(features=4, kernel_size=25, strides=4)
    np.testing.assert_allclose(
        ours_t.apply(vt, x), ref_t.apply(vt, x), rtol=1e-5, atol=1e-5
    )

    # init from scratch produces the same pytree structure
    vi = ours.init(jax.random.PRNGKey(9), x)
    assert jax.tree_util.tree_structure(vi) == jax.tree_util.tree_structure(v)
    for a, bb in zip(
        jax.tree_util.tree_leaves(vi), jax.tree_util.tree_leaves(v)
    ):
        assert a.shape == bb.shape
