"""The demo recipes run end-to-end on a synthesized wav with tiny overrides
(demos are the notebook-facing API — reference ``mimikit/demos/``)."""
import os

import numpy as np
import pytest

import mimikit_tpu as mmk


@pytest.fixture
def wav_dir(tmp_path):
    from scipy.io import wavfile

    t = np.arange(16000) / 16000.0
    sig = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wavfile.write(str(tmp_path / "tone.wav"), 16000, (sig * 32767).astype(np.int16))
    return tmp_path


def _tiny(root):
    return dict(
        max_epochs=1,
        limit_train_batches=2,
        batch_size=2,
        every_n_epochs=1,
        n_examples=1,
        prompt_length_sec=0.02,
        outputs_duration_sec=0.02,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        root_dir=str(root / "trainings"),
    )


def test_srnn_demo(wav_dir, monkeypatch):
    monkeypatch.chdir(wav_dir)
    from mimikit_tpu.demos import srnn

    loop = srnn.demo(
        sources=(str(wav_dir / "tone.wav"),),
        db_path=str(wav_dir / "srnn.h5"),
        batch_length=512,  # must exceed the demo's top frame size (256)
        tbptt_chunk_length=4096,
        **_tiny(wav_dir),
    )
    assert os.path.exists(os.path.join(loop.root_dir, "epoch=1.ckpt"))


def test_freqnet_demo(wav_dir, monkeypatch):
    monkeypatch.chdir(wav_dir)
    from mimikit_tpu.demos import freqnet

    loop = freqnet.demo(
        sources=(str(wav_dir / "tone.wav"),),
        sample_rate=16000,
        db_path=str(wav_dir / "freqnet.h5"),
        batch_length=8,
        downsampling=1,  # the demo's stride of 64 assumes minutes of audio
        **_tiny(wav_dir),
    )
    assert os.path.exists(os.path.join(loop.root_dir, "epoch=1.ckpt"))


def test_wave_gan_demo(wav_dir, monkeypatch):
    monkeypatch.chdir(wav_dir)
    from mimikit_tpu.demos import wave_gan

    gan = wave_gan.demo(
        sources=(str(wav_dir / "tone.wav"),),
        db_path=str(wav_dir / "wavegan.h5"),
        n_steps=2,
        n_critic=1,
        batch_size=2,
        out_dir=str(wav_dir / "gan-out"),
        latent_dim=8,
        model_size=2,
        kernel_size=9,
        t0=4,
        up_sample=(2, 2, 2),
        post_proc_filt_len=16,
    )
    assert gan.config.slice_length == 32
    outs = sorted(os.listdir(str(wav_dir / "gan-out")))
    assert len(outs) == 4 and outs[0].endswith(".wav")


def test_generate_chunks(wav_dir, monkeypatch):
    monkeypatch.chdir(wav_dir)
    from mimikit_tpu.demos import srnn
    from mimikit_tpu.loops.generate_chunks import generate_chunks

    loop = srnn.demo(
        sources=(str(wav_dir / "tone.wav"),),
        db_path=str(wav_dir / "srnn2.h5"),
        batch_length=512,
        tbptt_chunk_length=4096,
        **_tiny(wav_dir),
    )
    ckpt = mmk.Checkpoint(
        id=loop.hash_, epoch=1, root_dir=str(wav_dir / "trainings")
    )
    tracks = generate_chunks(
        ckpt,
        out_filename=str(wav_dir / "chunks.h5"),
        batch_size=2,
        n_chunks=2,
        chunk_seconds=0.02,
        prompt_seconds=0.02,
    )
    assert tracks.shape[0] == 2
    assert os.path.exists(str(wav_dir / "chunks.h5"))


def test_serving_demo(wav_dir, monkeypatch):
    monkeypatch.chdir(wav_dir)
    audio, outs = mmk.demos.serving.demo(
        sources=(str(wav_dir / "tone.wav"),),
        db_path=str(wav_dir / "serving.h5"),
        n_chunks=2,
        chunk_seconds=0.005,
        max_epochs=1,
        limit_train_batches=2,
        batch_size=2,
        root_dir=str(wav_dir / "trainings"),
    )
    assert audio.shape == (2 * 80,)  # 2 chunks x 0.005 s x 16 kHz
    assert np.isfinite(audio).all()
    assert outs[0].shape[1] == 4000 + 80  # prompt + chunk_steps
