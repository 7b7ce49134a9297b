"""STFT/ISTFT alignment + round-trip recovery.

Mirrors the reference's pinning suite
(``/root/reference/tests/test_fft_alignment.py``): frame-count formulas,
start/end alignment trims, ``convert()`` inverse consistency, and
``np.allclose`` signal recovery through the transform pair.
"""
import numpy as np
import pytest

import mimikit_tpu as mmk


def test_should_fail_with_magspec():
    n_fft, hop_length, center = 2048, 512, True
    fft = mmk.MagSpec(n_fft, hop_length, center=center, alignment="end")
    ifft = fft.inv

    n_frames, extra = 8, 104
    x = mmk.Normalize()(np.random.randn((n_frames - 1) * hop_length + extra))
    S = fft(x)
    assert S.shape[0] == n_frames

    y = ifft(S)
    # magnitude-only inversion (Griffin-Lim) cannot recover the waveform
    assert not np.allclose(x[-y.shape[0]:], y)


def test_convert_should_match_inverse():
    n_fft, hop_length, center = 2048, 512, False
    fft = mmk.STFT(n_fft, hop_length, center=center, alignment="end")
    ifft = fft.inv

    n_frames, extra = 8, 104
    x = mmk.Normalize()(
        np.random.randn((n_fft - hop_length) + (n_frames * hop_length) + extra)
    )
    S = fft(x)
    assert S.shape[0] == n_frames

    n_samples = mmk.convert(S.shape[0], fft.unit, mmk.Sample(sr=1), as_length=True)
    y = ifft(S)
    assert n_samples == y.shape[0]


def test_convert_should_match_inverse_with_center_true():
    n_fft, hop_length, center = 2048, 512, True
    fft = mmk.STFT(n_fft, hop_length, center=center, alignment="end")
    ifft = fft.inv

    n_frames, extra = 8, 104
    x = mmk.Normalize()(np.random.randn((n_frames - 1) * hop_length + extra))
    S = fft(x)
    assert S.shape[0] == n_frames

    n_samples = mmk.convert(S.shape[0], fft.unit, mmk.Sample(sr=1), as_length=True)
    y = ifft(S)
    assert n_samples == y.shape[0]


def test_should_end_align_with_center_true():
    n_fft, hop_length = 2048, 512
    fft = mmk.STFT(n_fft, hop_length, center=True, alignment="end")
    ifft = fft.inv

    n_frames, extra = 8, 104
    x = mmk.Normalize()(np.random.randn((n_frames - 1) * hop_length + extra))
    S = fft(x)
    assert S.shape[0] == n_frames

    y = ifft(S)
    assert np.allclose(x[-y.shape[0]:], y)


def test_should_end_align_with_center_false():
    n_fft, hop_length = 2048, 512
    fft = mmk.STFT(n_fft, hop_length, center=False, alignment="end", window="hann")
    ifft = fft.inv

    n_frames, extra = 8, 105
    x = mmk.Normalize()(
        np.random.randn((n_fft - hop_length) + (n_frames * hop_length) + extra)
    )
    S = fft(x)
    assert S.shape[0] == n_frames

    y = ifft(S)
    # hann[0] == 0: the very first sample is unrecoverable without centering
    assert np.allclose(x[-y.shape[0] + 1:], y[1:])


def test_should_start_align_with_center_true():
    n_fft, hop_length = 2048, 512
    fft = mmk.STFT(n_fft, hop_length, center=True, alignment="start")
    ifft = fft.inv

    n_frames, extra = 8, 87
    x = mmk.Normalize()(np.random.randn((n_frames - 1) * hop_length + extra))
    S = fft(x)
    assert S.shape[0] == n_frames

    y = ifft(S)
    assert np.allclose(x[: y.shape[0]], y)


def test_should_start_align_with_center_false():
    n_fft, hop_length = 2048, 512
    fft = mmk.STFT(n_fft, hop_length, center=False, alignment="start", window="hann")
    ifft = fft.inv

    n_frames, extra = 8, 99
    x = mmk.Normalize()(
        np.random.randn((n_fft - hop_length) + (n_frames * hop_length) + extra)
    )
    S = fft(x)
    assert S.shape[0] == n_frames

    y = ifft(S)
    assert np.allclose(x[1 : y.shape[0]], y[1:])


# ---------------------------------------------------------------------------
# additional pins beyond the reference: JAX path == numpy path
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("center", [True, False])
def test_jax_stft_matches_numpy(center):
    import jax.numpy as jnp

    n_fft, hop = 512, 128
    x = np.random.randn(4096).astype(np.float32)
    S_np = mmk.features.dsp.stft_np(x, n_fft, hop, center, "hann")
    S_jax = np.asarray(mmk.features.dsp.stft_jax(jnp.asarray(x), n_fft, hop, center, "hann"))
    assert S_np.shape == S_jax.shape
    assert np.allclose(np.abs(S_np), np.abs(S_jax), atol=1e-3)


@pytest.mark.parametrize("center", [True, False])
def test_jax_istft_matches_numpy(center):
    import jax.numpy as jnp

    n_fft, hop = 512, 128
    x = np.random.randn(4096).astype(np.float32)
    S = mmk.features.dsp.stft_np(x, n_fft, hop, center, "hann")
    y_np = mmk.features.dsp.istft_np(S, n_fft, hop, center, "hann")
    y_jax = np.asarray(
        mmk.features.dsp.istft_jax(jnp.asarray(S), n_fft, hop, center, "hann")
    )
    assert y_np.shape == y_jax.shape
    assert np.allclose(y_np, y_jax, atol=1e-3)


def test_mulaw_roundtrip():
    x = np.clip(np.random.randn(10000) * 0.3, -1, 1).astype(np.float32)
    comp = mmk.MuLawCompress(q_levels=256)
    exp = comp.inv
    q = comp(x)
    assert q.min() >= 0 and q.max() <= 255
    y = exp(q)
    assert np.abs(x - y).max() < 0.05  # quantization error bound

    import jax.numpy as jnp

    # np (libm) and jnp (XLA) agree everywhere except samples that land
    # exactly on a quantization-bin edge, where 1-ulp log1p differences can
    # round to the adjacent bin
    qj = np.asarray(comp(jnp.asarray(x)))
    diff = np.abs(qj.astype(np.int64) - q.astype(np.int64))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3
    yj = np.asarray(exp(jnp.asarray(q.astype(np.int32))))
    assert np.allclose(yj, y, atol=1e-5)
