"""Numeric parity against torch reference semantics with transferred weights.

The BASELINE requires generation to match the PyTorch reference given
identical seeds/weights.  RNG streams cannot match across frameworks, but
every deterministic computation can: these tests copy weights between torch
(CPU) modules implementing the reference's exact ops and our flax modules,
and require allclose outputs.
"""
import os
import sys

# run standalone (invoked in a subprocess by test_torch_parity.py: torch and
# jax share LLVM/OpenMP symbols and crash later XLA:CPU compiles when loaded
# into the long-lived suite process)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

jax.config.update("jax_platforms", "cpu")

import mimikit_tpu as mmk


def test_mulaw_matches_torch_reference_formula():
    """The reference's torch mu-law (functionals.py:330-338) vs our numpy/jnp."""
    x = np.clip(np.random.randn(1000).astype(np.float32) * 0.5, -1, 1)
    q, C = 256, 0.7

    xt = torch.from_numpy(x)
    mu = torch.tensor(q - 1.0)
    Ct = torch.tensor(C)
    x_mu = torch.sign(xt) * torch.log1p(mu * torch.abs(xt) * Ct) / torch.log1p(mu * Ct)
    ref = ((x_mu + 1) / 2 * mu + 0.5).to(torch.int64).numpy()

    ours = mmk.MuLawCompress(q, C)(x)
    assert np.array_equal(ref, np.asarray(ours))

    # expand
    yt = (torch.from_numpy(ref).to(torch.float) / mu) * 2 - 1.0
    ref_exp = (
        torch.sign(yt) * (torch.exp(torch.abs(yt) * torch.log1p(mu * Ct)) - 1.0) / (mu * Ct)
    ).numpy()
    ours_exp = mmk.MuLawExpand(q, C)(ref)
    assert np.allclose(ref_exp, np.asarray(ours_exp), atol=1e-6)


def test_dilated_gated_conv_matches_torch():
    """WNLayer's gated dilated conv vs torch Conv1d with the same weights."""
    import jax

    from mimikit_tpu.networks.wavenet import WNLayer

    B, T, D_in, D = 2, 20, 8, 12
    k, dil = 2, 4
    x = np.random.randn(B, T, D_in).astype(np.float32)

    layer = WNLayer(
        input_dim=D_in, dims_dilated=(D,), pad_side=0, kernel_size=k,
        dilation=dil, act_g="Sigmoid",
    )
    variables = layer.init(jax.random.PRNGKey(0), (x,), (), None)
    y_flax, _ = layer.apply(variables, (x,), (), None)

    # torch replica: Conv1d(D_in -> 2D, k, dilation) + tanh*sigmoid gate
    kernel = np.asarray(variables["params"]["conv_dil0"]["kernel"])  # (k, in, out)
    bias = np.asarray(variables["params"]["conv_dil0"]["bias"])
    conv = torch.nn.Conv1d(D_in, 2 * D, k, dilation=dil, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel.transpose(2, 1, 0)))
        conv.bias.copy_(torch.from_numpy(bias))
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, T)
    fg = conv(xt)
    f, g = torch.chunk(fg, 2, dim=1)
    y_t = (torch.tanh(f) * torch.sigmoid(g)).detach().numpy().transpose(0, 2, 1)

    assert y_flax.shape == y_t.shape
    assert np.allclose(np.asarray(y_flax), y_t, atol=1e-5)


def test_dense_matches_torch_linear():
    import jax
    import flax.linen as nn

    x = np.random.randn(3, 7).astype(np.float32)
    dense = nn.Dense(5)
    variables = dense.init(jax.random.PRNGKey(0), x)
    y_flax = dense.apply(variables, x)

    lin = torch.nn.Linear(7, 5)
    with torch.no_grad():
        lin.weight.copy_(
            torch.from_numpy(np.asarray(variables["params"]["kernel"]).T)
        )
        lin.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["bias"])))
    y_t = lin(torch.from_numpy(x)).detach().numpy()
    assert np.allclose(np.asarray(y_flax), y_t, atol=1e-5)


def test_lstm_cell_matches_torch():
    """flax OptimizedLSTMCell vs torch LSTMCell with transferred weights."""
    import jax
    import flax.linen as nn

    H, B = 6, 3
    x = np.random.randn(B, H).astype(np.float32)
    cell = nn.OptimizedLSTMCell(features=H)
    carry0 = cell.initialize_carry(jax.random.PRNGKey(0), (B, H))
    variables = cell.init(jax.random.PRNGKey(0), carry0, x)
    (c1, h1), y = cell.apply(variables, carry0, x)

    p = variables["params"]
    # flax gate order: i, f, g, o ; torch: i, f, g, o as well
    def cat(parts):
        return np.concatenate(parts, axis=0)

    w_ih = cat([np.asarray(p[f"i{g}"]["kernel"]).T for g in "ifgo"])
    w_hh = cat([np.asarray(p[f"h{g}"]["kernel"]).T for g in "ifgo"])
    b_ih = cat(
        [
            np.asarray(p[f"i{g}"]["bias"])
            if "bias" in p[f"i{g}"]
            else np.zeros(H, np.float32)
            for g in "ifgo"
        ]
    )
    b_hh = cat([np.asarray(p[f"h{g}"]["bias"]) for g in "ifgo"])

    tc = torch.nn.LSTMCell(H, H)
    with torch.no_grad():
        tc.weight_ih.copy_(torch.from_numpy(w_ih))
        tc.weight_hh.copy_(torch.from_numpy(w_hh))
        tc.bias_ih.copy_(torch.from_numpy(b_ih))
        tc.bias_hh.copy_(torch.from_numpy(b_hh))
    h_t, c_t = tc(
        torch.from_numpy(x),
        (torch.from_numpy(np.asarray(carry0[1])), torch.from_numpy(np.asarray(carry0[0]))),
    )
    assert np.allclose(np.asarray(h1), h_t.detach().numpy(), atol=1e-5)
    assert np.allclose(np.asarray(c1), c_t.detach().numpy(), atol=1e-5)


def test_stft_matches_torch_stft():
    """Our framing vs torch.stft (the reference's torch path)."""
    n_fft, hop = 256, 64
    x = np.random.randn(2048).astype(np.float32)
    S_ours = np.asarray(
        mmk.features.dsp.stft_np(x, n_fft, hop, True, "hann")
    )  # (T, F) complex

    S_torch = torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="constant",
        return_complex=True,
    ).numpy().T  # -> (T, F)
    assert S_ours.shape == S_torch.shape
    assert np.allclose(np.abs(S_ours), np.abs(S_torch), atol=1e-3)
    assert np.allclose(S_ours.real, S_torch.real, atol=1e-3)


def test_derivative_torch_matches_np_and_reference_formula():
    """``mmk.derivative_torch`` (reference functionals.py:960-974) agrees with
    the np/native path and with the reference's own loop formula."""
    for shape in ((64,), (3, 50)):
        y = np.random.randn(*shape).astype(np.float32)
        ours_t = mmk.derivative_torch(torch.from_numpy(y), 3).numpy()
        ours_np = mmk.derivative_np(y, 3)
        assert np.allclose(ours_t, ours_np, atol=1e-5)

        # the reference's torch loop, written out independently
        yt = torch.from_numpy(y)
        grads = torch.zeros_like(yt)
        max_lag = 3
        for delay in range(1, max_lag + 1):
            k = delay * 2 + 1
            k_half = k // 2
            y_p = torch.zeros(*y.shape[:-1], y.shape[-1] + k - 1)
            y_p[..., k_half:-k_half] = yt
            y_p[..., :k_half] = yt[..., :1] + (yt[..., :1] - yt[..., 1 : 1 + k_half]).flip(-1)
            y_p[..., -k_half:] = yt[..., -1:] + (yt[..., -1:] - yt[..., -k_half - 1 : -1]).flip(-1)
            a, b = y_p[..., : -k + 1], y_p[..., k - 1 :]
            grads += (1 / delay) * ((b - yt) + (yt - a)) / 2 / max_lag
        assert np.allclose(ours_t, grads.numpy(), atol=1e-6)
