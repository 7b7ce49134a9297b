"""WaveGAN training recipe: adversarial raw-waveform synthesis.

The reference ships the WaveGAN modules (``networks/wave_gan.py``) but no
demo or training code for them; this recipe completes the family — slice a
dataset into fixed windows, train generator vs critic with WGAN-GP, and
bounce unconditional samples.
"""


def demo(
    sources=None,
    sample_rate=16000,
    db_path="train-wavegan.h5",
    n_steps=2000,
    n_critic=5,
    batch_size=32,
    out_dir="wavegan-outputs",
    **overrides,
):
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from scipy.io import wavfile

    import mimikit_tpu as mmk
    from mimikit_tpu.networks.wave_gan import make_wavegan_steps

    if sources is None:
        sources = tuple(mmk.FileWalker(mmk.SOUND_FILE_REGEX, "./"))
    if os.path.exists(db_path):
        os.remove(db_path)

    signal = mmk.Extractor(
        "signal",
        mmk.Compose(
            mmk.FileToSignal(sample_rate), mmk.RemoveDC(), mmk.Normalize()
        ),
    )
    ds = mmk.DatasetConfig(sources=sources, filename=db_path, extractors=(signal,))
    ds.create(mode="w")
    dataset = ds.get(mode="r")

    defaults = dict(
        latent_dim=100,
        model_size=32,
        kernel_size=25,
        t0=16,
        up_sample=(4, 4, 4, 4),  # 16 * 256 = 4096-sample slices (~1/4 s)
        post_proc_filt_len=512,
    )
    cfg = mmk.WaveGAN.Config(**{**defaults, **overrides})
    gan = mmk.WaveGAN.from_config(cfg)
    gan.init_params(batch_size=batch_size)
    from mimikit_tpu.optim import flat_optimizer

    g_opt = flat_optimizer(
        optax.adam(1e-4, b1=0.5, b2=0.9), gan.gen_params["params"]
    )
    d_opt = flat_optimizer(
        optax.adam(1e-4, b1=0.5, b2=0.9), gan.disc_params["params"]
    )
    g_state = g_opt.init(gan.gen_params["params"])
    d_state = d_opt.init(gan.disc_params["params"])
    d_step, g_step = make_wavegan_steps(
        gan, g_opt, d_opt, g_batch=batch_size
    )

    sig = np.asarray(dataset.signal[:]).astype(np.float32)
    L = cfg.slice_length
    if len(sig) <= L:
        raise ValueError(
            f"dataset has {len(sig)} samples but WaveGAN slices are "
            f"{L} (t0 * prod(up_sample)) — provide longer audio or a "
            f"smaller slice config"
        )
    n_slices = len(sig) - L
    rng = np.random.default_rng(42)
    key = jax.random.PRNGKey(42)
    dp, gp = gan.disc_params, gan.gen_params
    for step in range(n_steps):
        for _ in range(n_critic):
            starts = rng.integers(0, n_slices, batch_size)
            real = np.stack([sig[s: s + L] for s in starts])[..., None]
            key, k = jax.random.split(key)
            dp, d_state, d_loss = d_step(dp, d_state, gp, jnp.asarray(real), k)
        key, k = jax.random.split(key)
        gp, g_state, g_loss = g_step(gp, g_state, dp, k)
        if step % 100 == 0:
            print(f"step {step}: d={float(d_loss):.4f} g={float(g_loss):.4f}")
    gan.gen_params, gan.disc_params = gp, dp

    os.makedirs(out_dir, exist_ok=True)
    key, k = jax.random.split(key)
    fake = np.asarray(gan.generate(4, rng=k))[..., 0]
    for i, w in enumerate(fake):
        wavfile.write(
            os.path.join(out_dir, f"sample_{i}.wav"),
            sample_rate,
            (np.clip(w, -1, 1) * 32767).astype(np.int16),
        )
    print(f"wrote {len(fake)} samples to {out_dir}/")
    return gan
