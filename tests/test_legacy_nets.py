"""Legacy model families: MultiSeq2SeqLSTM (s2s v1), WaveGAN, PocoNet.

The reference keeps these un-exported (``networks/__init__.py``) and two
of them un-runnable (MultiSeq2SeqLSTM calls a stale constructor signature,
``s2s_lstm.py:229-233``; poconet's base class is ``WNNetwork = None``,
``poconet.py:114``) — here all three are working, tested TPU-native nets.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import mimikit_tpu as mmk
from mimikit_tpu.networks.poconet import (
    extract_env,
    l1_loss_with_phs,
    peak_detector,
    peak_detector_np,
)
from mimikit_tpu.networks.wave_gan import make_wavegan_steps, phase_shuffle


# ---------------------------------------------------------------- multi-s2s
def test_multi_seq2seq_autoencodes_frames():
    net = mmk.MultiSeq2SeqLSTM.from_config(
        mmk.MultiSeq2SeqLSTM.Config(io_dim=33, model_dim=16, hop=4, n_stages=3)
    )
    assert net.rf == 64  # hop ** n_stages time compression
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (2, 64, 33)))
    (y,) = net.forward((x,))
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y))) and bool(jnp.all(y >= 0))
    # generate_step is the forward (v1 semantics, s2s_lstm.py:247-248)
    (y2,) = net.generate_step((x,))
    assert y2.shape == x.shape


def test_multi_seq2seq_one_grad_step_reduces_loss():
    cfg = mmk.MultiSeq2SeqLSTM.Config(
        io_dim=9, model_dim=8, hop=2, n_stages=2, with_sampler=False
    )
    net = mmk.MultiSeq2SeqLSTM.from_config(cfg)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 8, 9)))
    net.init_params(batch_size=2, batch_length=8)

    def loss_fn(params):
        (y,), _ = net.module.apply({"params": params}, (x,), None, True,
                                   rngs={"sample": jax.random.PRNGKey(0)})
        return jnp.abs(y - x).mean()

    opt = optax.adam(1e-2)
    state = opt.init(net.params)
    l0, g = jax.value_and_grad(loss_fn)(net.params)
    updates, state = opt.update(g, state, net.params)
    p1 = optax.apply_updates(net.params, updates)
    for _ in range(10):
        _, g = jax.value_and_grad(loss_fn)(p1)
        updates, state = opt.update(g, state, p1)
        p1 = optax.apply_updates(p1, updates)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)


def test_multi_seq2seq_config_roundtrips():
    cfg = mmk.MultiSeq2SeqLSTM.Config(io_dim=129, model_dim=64, hop=4)
    c2 = mmk.Config.deserialize(cfg.serialize())
    assert c2 == cfg


# ------------------------------------------------------------------ wavegan
def _tiny_gan():
    cfg = mmk.WaveGAN.Config(
        latent_dim=8, model_size=4, kernel_size=9, t0=4,
        up_sample=(2, 2, 2), post_proc_filt_len=16,
    )
    return mmk.WaveGAN.from_config(cfg)


def test_wavegan_generator_shapes_and_range():
    gan = _tiny_gan()
    assert gan.config.slice_length == 32
    w = gan.generate(3, rng=jax.random.PRNGKey(0))
    assert w.shape == (3, 32, 1)
    assert bool(jnp.all(jnp.abs(w) <= 1.0))  # tanh output


def test_wavegan_nearest_upsampling_variant():
    cfg = mmk.WaveGAN.Config(
        latent_dim=4, model_size=2, kernel_size=8, t0=2,
        up_sample=(2, 2), up_sampling="nearest", post_proc_filt_len=0,
    )
    gan = mmk.WaveGAN.from_config(cfg)
    w = gan.generate(2, rng=jax.random.PRNGKey(1))
    assert w.shape == (2, cfg.slice_length, 1)


def test_phase_shuffle_reflects_and_preserves_shape():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 12, 3))
    assert phase_shuffle(x, key, 0) is x
    y = phase_shuffle(x, key, 3)
    assert y.shape == x.shape
    # every output row must equal the reflect-padded input shifted by some
    # k in [-3, 3] (oracle: numpy)
    xp = np.pad(np.asarray(x), ((0, 0), (3, 3), (0, 0)), mode="reflect")
    for b in range(x.shape[0]):
        ok = any(
            np.allclose(np.asarray(y)[b], xp[b, 3 - k: 3 - k + 12])
            for k in range(-3, 4)
        )
        assert ok, b


def test_wavegan_wgan_gp_steps_train():
    gan = _tiny_gan()
    gan.init_params(batch_size=2)
    g_opt, d_opt = optax.adam(1e-4), optax.adam(1e-4)
    g_state = g_opt.init(gan.gen_params["params"])
    d_state = d_opt.init(gan.disc_params["params"])
    d_step, g_step = make_wavegan_steps(gan, g_opt, d_opt)
    key = jax.random.PRNGKey(3)
    real = jax.random.uniform(
        key, (2, gan.config.slice_length, 1), minval=-1, maxval=1
    )
    dp, gp = gan.disc_params, gan.gen_params
    for _ in range(2):
        key, k1, k2 = jax.random.split(key, 3)
        dp, d_state, dl = d_step(dp, d_state, gp, real, k1)
        gp, g_state, gl = g_step(gp, g_state, dp, k2)
        assert bool(jnp.isfinite(dl)) and bool(jnp.isfinite(gl))
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), gan.gen_params, gp
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_wavegan_batch_norm_trains():
    """use_batch_norm=True must actually train: batch_stats are carried
    and updated through both WGAN-GP steps (regression: the steps used to
    crash with ModifyScopeVariableError)."""
    cfg = mmk.WaveGAN.Config(
        latent_dim=8, model_size=4, kernel_size=9, t0=4,
        up_sample=(2, 2), post_proc_filt_len=0, use_batch_norm=True,
    )
    gan = mmk.WaveGAN.from_config(cfg)
    gan.init_params(batch_size=2)
    assert "batch_stats" in gan.gen_params  # BN really is in the tree
    g_opt, d_opt = optax.adam(1e-3), optax.adam(1e-3)
    g_state = g_opt.init(gan.gen_params["params"])
    d_state = d_opt.init(gan.disc_params["params"])
    d_step, g_step = make_wavegan_steps(gan, g_opt, d_opt, g_batch=2)
    key = jax.random.PRNGKey(5)
    real = jax.random.uniform(
        key, (2, cfg.slice_length, 1), minval=-1, maxval=1
    )
    dp, gp = gan.disc_params, gan.gen_params
    for _ in range(2):
        key, k1, k2 = jax.random.split(key, 3)
        dp, d_state, dl = d_step(dp, d_state, gp, real, k1)
        gp, g_state, gl = g_step(gp, g_state, dp, k2)
        assert bool(jnp.isfinite(dl)) and bool(jnp.isfinite(gl))
    # the generator's running stats moved (train-mode BN was exercised)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        gan.gen_params["batch_stats"], gp["batch_stats"],
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_legacy_nets_run_under_generate_loop_interface():
    """MultiSeq2SeqLSTM and PocoNet expose the full ARM loop surface
    (before_generate / generate_step / after_generate / generate_params)
    so the generation loops don't crash on them."""
    ms2s = mmk.MultiSeq2SeqLSTM.from_config(
        mmk.MultiSeq2SeqLSTM.Config(io_dim=9, model_dim=8, hop=2, n_stages=2)
    )
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1, 8, 9)))
    ms2s.before_generate((x,), 0)
    (y,) = ms2s.generate_step((x,), t=0)
    ms2s.after_generate((y,), 0)
    assert ms2s.generate_params == set()

    poco = mmk.PocoNet.from_config(
        mmk.PocoNet.Config(input_dim=9, gate_dim=16, n_layers=(2,),
                           dim1x1=8, dim2x3=8, amp_env_dim=4, amp_gate_dim=8)
    )
    mag, phs, env = _poco_inputs(T=12, F=9)
    poco.before_generate((mag, phs, env), 0)
    sm, sp = poco.generate_step((mag, phs, env), t=0)
    poco.after_generate((sm, sp), 0)
    assert sm.shape == (2, 1, 9)


def test_wavegan_config_roundtrips():
    cfg = mmk.WaveGAN.Config(up_sample=(4, 4, 2), model_size=8)
    c2 = mmk.Config.deserialize(cfg.serialize())
    assert c2 == cfg
    assert isinstance(c2.up_sample, tuple)


# ------------------------------------------------------------------ poconet
def test_peak_detector_device_matches_host():
    sig = np.abs(np.random.default_rng(0).normal(size=128)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(peak_detector(jnp.asarray(sig), 0.75, 0.1)),
        peak_detector_np(sig, 0.75, 0.1),
        rtol=1e-5,
    )


def test_extract_env_shape_alignment():
    rng = np.random.default_rng(1)
    S = rng.normal(size=(17, 40)) + 1j * rng.normal(size=(17, 40))
    env = extract_env(S)
    assert env.shape == (38, 2)  # frames 1..T-2 (poconet.py:40-45)
    assert np.isfinite(env).all()


def _poco_inputs(T=24, F=17, B=2, seed=3):
    rng = np.random.default_rng(seed)
    mag = jnp.abs(jnp.asarray(rng.normal(size=(B, T, F)), dtype=jnp.float32))
    phs = jnp.asarray(
        rng.uniform(-np.pi, np.pi, size=(B, T, F)), dtype=jnp.float32
    )
    env = jnp.asarray(rng.normal(size=(B, T, 2)), dtype=jnp.float32)
    return mag, phs, env


def test_poconet_forward_shapes_and_ranges():
    cfg = mmk.PocoNet.Config(
        input_dim=17, gate_dim=32, n_layers=(3,), dim1x1=8, dim2x3=16,
        amp_env_dim=8, amp_gate_dim=16,
    )
    net = mmk.PocoNet.from_config(cfg)
    mag, phs, env = _poco_inputs()
    pm, pp = net.forward((mag, phs, env))
    T_out = mag.shape[1] - net.rf + 1
    assert pm.shape == (2, T_out, 17) and pp.shape == (2, T_out, 17)
    assert bool(jnp.all(pm >= 0))  # magnitudes through |.|
    assert bool(jnp.all(jnp.abs(pp) <= np.pi + 1e-5))  # principal branch
    sm, sp = net.generate_step((mag, phs, env))
    assert sm.shape == (2, 1, 17) and sp.shape == (2, 1, 17)


def test_poconet_loss_and_gradients():
    cfg = mmk.PocoNet.Config(
        input_dim=17, gate_dim=32, n_layers=(3,), dim1x1=8, dim2x3=16,
        amp_env_dim=8, amp_gate_dim=16,
    )
    net = mmk.PocoNet.from_config(cfg)
    mag, phs, env = _poco_inputs()
    pm, pp = net.forward((mag, phs, env))
    tgt = (mag[:, net.rf:], phs[:, net.rf:])
    d = l1_loss_with_phs((pm[:, :-1], pp[:, :-1]), tgt)
    assert set(d) == {"loss", "mag_loss", "phs_loss"}
    assert all(bool(jnp.isfinite(v)) for v in d.values())

    def loss_fn(params):
        outs, _ = net.module.apply(
            {"params": params}, (mag, phs, env), None, True
        )
        return l1_loss_with_phs((outs[0][:, :-1], outs[1][:, :-1]), tgt)["loss"]

    g = jax.grad(loss_fn)(net.params)
    gn = sum(float(jnp.sum(x ** 2)) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_poconet_config_roundtrips():
    cfg = mmk.PocoNet.Config(input_dim=257, n_layers=(4, 4))
    c2 = mmk.Config.deserialize(cfg.serialize())
    assert c2 == cfg
    assert isinstance(c2.n_layers, tuple)


def test_legacy_names_exported():
    for name in ("MultiSeq2SeqLSTM", "WaveGAN", "WaveGANGenerator",
                 "WaveGANDiscriminator", "PocoNet", "PhaseNetwork"):
        assert hasattr(mmk, name), name
