"""Fused Pallas LSTM train path (ops/pallas_lstm.py) vs the lax.scan of
flax OptimizedLSTMCell: forward bit-exact (same reduction order), all
gradients allclose (hand-written Pallas backward), and the RNNStack
integration produces the same training dynamics."""
import numpy as np
import pytest

import mimikit_tpu as mmk


def _scan_ref(params, x, h0, c0):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    H = h0.shape[-1]
    cell = nn.OptimizedLSTMCell(features=H)

    def body(c, xt):
        c2, y = cell.apply({"params": params}, c, xt)
        return c2, y

    (cT, hT), ys = jax.lax.scan(body, (c0, h0), x)
    return ys, hT, cT


def _setup(T=12, B=4, D=8, H=16, seed=0):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(T, B, D), jnp.float32)
    cell = nn.OptimizedLSTMCell(features=H)
    params = cell.init(
        jax.random.PRNGKey(0),
        (jnp.zeros((B, H)), jnp.zeros((B, H))),
        jnp.zeros((B, D)),
    )["params"]
    h0 = jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
    c0 = jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
    Wi = jnp.concatenate([params[f"i{g}"]["kernel"] for g in "ifgo"], axis=1)
    Wh = jnp.concatenate([params[f"h{g}"]["kernel"] for g in "ifgo"], axis=1)
    b = jnp.concatenate([params[f"h{g}"]["bias"] for g in "ifgo"])
    return params, x, h0, c0, Wi, Wh, b


@pytest.mark.parametrize("T,B,H", [(12, 4, 16), (7, 2, 8), (32, 8, 16)])
def test_fused_lstm_forward_matches_scan_exactly(T, B, H):
    import jax.numpy as jnp

    from mimikit_tpu.ops.pallas_lstm import fused_lstm_layer

    params, x, h0, c0, Wi, Wh, b = _setup(T=T, B=B, D=8, H=H)
    ys_s, hT_s, cT_s = _scan_ref(params, x, h0, c0)
    ys_f, hT_f, cT_f = fused_lstm_layer(x, Wi, Wh, b, h0, c0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ys_s), np.asarray(ys_f))
    np.testing.assert_array_equal(np.asarray(hT_s), np.asarray(hT_f))
    np.testing.assert_array_equal(np.asarray(cT_s), np.asarray(cT_f))


def test_fused_lstm_grads_match_scan():
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.ops.pallas_lstm import fused_lstm_layer

    params, x, h0, c0, Wi, Wh, b = _setup()

    def loss_s(p, x, h0, c0):
        ys, hT, cT = _scan_ref(p, x, h0, c0)
        return jnp.sum(ys**2) + jnp.sum(hT * cT)

    def loss_f(wi, wh, bb, x, h0, c0):
        ys, hT, cT = fused_lstm_layer(x, wi, wh, bb, h0, c0, interpret=True)
        return jnp.sum(ys**2) + jnp.sum(hT * cT)

    gp, gx, gh0, gc0 = jax.grad(loss_s, argnums=(0, 1, 2, 3))(
        params, x, h0, c0
    )
    gWi, gWh, gb, gx_f, gh0_f, gc0_f = jax.grad(
        loss_f, argnums=(0, 1, 2, 3, 4, 5)
    )(Wi, Wh, b, x, h0, c0)
    gWi_s = jnp.concatenate([gp[f"i{g}"]["kernel"] for g in "ifgo"], axis=1)
    gWh_s = jnp.concatenate([gp[f"h{g}"]["kernel"] for g in "ifgo"], axis=1)
    gb_s = jnp.concatenate([gp[f"h{g}"]["bias"] for g in "ifgo"])
    for a, f in [
        (gWi_s, gWi), (gWh_s, gWh), (gb_s, gb),
        (gx, gx_f), (gh0, gh0_f), (gc0, gc0_f),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(f), rtol=1e-5, atol=1e-5
        )


def test_rnnstack_fused_matches_scan_training_step(monkeypatch):
    """RNNStack routes to the fused path under MMK_FUSED_LSTM=1; one
    optimizer step over a 2-layer stack must produce the same params as
    the scan path (grads allclose end-to-end through the module)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mimikit_tpu.modules.rnn import RNNStack

    B, T, D, H = 2, 10, 6, 12
    stack = RNNStack(hidden_dim=H, n_layers=2, cell_type="lstm")
    x = jnp.asarray(np.random.RandomState(1).randn(B, T, D), jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), x)["params"]

    def run_one_step(flag):
        monkeypatch.setenv("MMK_FUSED_LSTM", flag)

        def loss(p):
            y, final = stack.apply({"params": p}, x)
            return jnp.sum(y**2) + sum(
                jnp.sum(c[0]) + jnp.sum(c[1]) for c in final
            )

        g = jax.grad(loss)(params)
        tx = optax.sgd(1e-2)
        upd, _ = tx.update(g, tx.init(params))
        return optax.apply_updates(params, upd)

    p_scan = run_one_step("0")
    p_fused = run_one_step("1")
    for a, f in zip(
        jax.tree_util.tree_leaves(p_scan), jax.tree_util.tree_leaves(p_fused)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(f), rtol=1e-5, atol=1e-6
        )


def test_rnnstack_fused_carry_continues_like_scan(monkeypatch):
    """TBPTT contract: the carry returned by the fused path feeds the next
    window exactly like the scan path's."""
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.modules.rnn import RNNStack

    B, T, D, H = 2, 8, 6, 12
    stack = RNNStack(hidden_dim=H, n_layers=1, cell_type="lstm")
    x1 = jnp.asarray(np.random.RandomState(2).randn(B, T, D), jnp.float32)
    x2 = jnp.asarray(np.random.RandomState(3).randn(B, T, D), jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), x1)["params"]

    def two_windows(flag):
        monkeypatch.setenv("MMK_FUSED_LSTM", flag)
        y1, c1 = stack.apply({"params": params}, x1)
        y2, c2 = stack.apply({"params": params}, x2, c1)
        return y2

    np.testing.assert_allclose(
        np.asarray(two_windows("0")),
        np.asarray(two_windows("1")),
        rtol=1e-6,
        atol=1e-7,
    )


def test_fused_lstm_bf16_streams():
    """bf16 inputs route to the bf16-stream kernel variant: outputs come
    back bf16 and match the f32 kernel to bf16 resolution (compute and
    carry stay f32 in VMEM — only the HBM streams round)."""
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.ops.pallas_lstm import fused_lstm_layer

    params, x, h0, c0, Wi, Wh, b = _setup(T=16, B=4, D=8, H=16)
    ys32, hT32, cT32 = fused_lstm_layer(x, Wi, Wh, b, h0, c0, interpret=True)
    x16 = x.astype(jnp.bfloat16)
    ys16, hT16, cT16 = fused_lstm_layer(
        x16, Wi.astype(jnp.bfloat16), Wh.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16), h0.astype(jnp.bfloat16),
        c0.astype(jnp.bfloat16), interpret=True,
    )
    assert ys16.dtype == jnp.bfloat16
    assert hT16.dtype == jnp.bfloat16 and cT16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ys32), np.asarray(ys16, np.float32), rtol=0.05, atol=0.03
    )
    np.testing.assert_allclose(
        np.asarray(cT32), np.asarray(cT16, np.float32), rtol=0.05, atol=0.05
    )


def test_fused_lstm_bf16_grads_match_f32():
    """bf16 backward: gradients stay within bf16 rounding of the f32
    kernel's (the dWh/db accumulators are f32 in scratch)."""
    import jax
    import jax.numpy as jnp

    from mimikit_tpu.ops.pallas_lstm import fused_lstm_layer

    params, x, h0, c0, Wi, Wh, b = _setup(T=12, B=4, D=8, H=16)

    def loss(wi, wh, bb, xx, hh, cc, dtype):
        ys, hT, cT = fused_lstm_layer(
            xx.astype(dtype), wi.astype(dtype), wh.astype(dtype),
            bb.astype(dtype), hh.astype(dtype), cc.astype(dtype),
            interpret=True,
        )
        ys = ys.astype(jnp.float32)
        return jnp.sum(ys**2) + jnp.sum(
            hT.astype(jnp.float32) * cT.astype(jnp.float32)
        )

    g32 = jax.grad(loss, argnums=(0, 1, 2))(
        Wi, Wh, b, x, h0, c0, jnp.float32
    )
    g16 = jax.grad(loss, argnums=(0, 1, 2))(
        Wi, Wh, b, x, h0, c0, jnp.bfloat16
    )
    for a, f in zip(g32, g16):
        assert f.dtype == jnp.float32  # cotangents re-cast at the boundary
        denom = np.maximum(np.abs(np.asarray(a)), 1e-2)
        rel = np.abs(np.asarray(a) - np.asarray(f, np.float32)) / denom
        assert np.median(rel) < 0.05, f"median rel err {np.median(rel)}"


def test_fused_lstm_gate_rejects_non_lstm(monkeypatch):
    monkeypatch.setenv("MMK_FUSED_LSTM", "1")
    from mimikit_tpu.modules.rnn import RNNStack

    gru = RNNStack(hidden_dim=8, n_layers=1, cell_type="gru")
    assert not gru._use_fused_lstm(32, 256)
    wn = RNNStack(hidden_dim=8, n_layers=1, cell_type="lstm", weight_norm=True)
    assert not wn._use_fused_lstm(32, 256)
    monkeypatch.setenv("MMK_FUSED_LSTM", "0")
    lstm = RNNStack(hidden_dim=8, n_layers=1, cell_type="lstm")
    assert not lstm._use_fused_lstm(32, 256)
    # size gate: tiny single-stream calls keep the scan on 'auto' (the
    # kernel launch outweighs 8 scan iterations — measured on v5e), but
    # =1 forces the kernel (how the parity tests run on CPU)
    monkeypatch.setenv("MMK_FUSED_LSTM", "1")
    assert lstm._use_fused_lstm(1, 8)
    monkeypatch.delenv("MMK_FUSED_LSTM")
    import jax

    expected_big = jax.default_backend() != "cpu"
    assert lstm._use_fused_lstm(32, 256) == expected_big
    assert not lstm._use_fused_lstm(1, 8)
