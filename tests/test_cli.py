"""Console entry points (the reference declares these script names but
points them at functions that do not exist — here they work)."""
import io
import json
import os
from contextlib import redirect_stdout

import numpy as np
import pytest
from scipy.io import wavfile

from mimikit_tpu.cli import segment_main, stretch_main


@pytest.fixture()
def three_section_wav(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    y = np.concatenate(
        [
            0.7 * np.sin(2 * np.pi * 330 * t),
            0.4 * np.random.RandomState(0).randn(sr),
            0.7 * np.sin(2 * np.pi * 880 * t),
        ]
    ).astype(np.float32)
    path = str(tmp_path / "abc.wav")
    wavfile.write(path, sr, (y * 32767).astype(np.int16))
    return path, y, sr


def test_segment_cli_finds_section_boundaries(three_section_wav, tmp_path):
    path, y, sr = three_section_wav
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert segment_main([path, "--write", "--min-strength", "0.01"]) == 0
    times = json.loads(buf.getvalue())[path]
    assert any(0.6 < x < 1.4 for x in times)  # tone -> noise at 1.0 s
    assert any(1.6 < x < 2.4 for x in times)  # noise -> tone at 2.0 s
    segs = [f for f in os.listdir(tmp_path) if ".seg" in f]
    assert len(segs) == len(times) + 1


def test_stretch_cli_scales_duration_preserving_pitch(three_section_wav):
    path, y, sr = three_section_wav
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert stretch_main([path, "0.5"]) == 0
    out_path = buf.getvalue().strip()
    sr2, out = wavfile.read(out_path)
    assert sr2 == 22050
    assert abs(len(out) - 2 * len(y)) < sr // 2
    # the 330 Hz opening tone stays 330 Hz
    seg = out[: sr].astype(np.float32)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1 / sr)[spec[1:].argmax() + 1]
    assert abs(f - 330.0) < 15.0


def test_stretch_cli_rejects_nonpositive_rate(three_section_wav):
    path, *_ = three_section_wav
    with pytest.raises(SystemExit) as e:
        stretch_main([path, "0"])
    assert e.value.code == 2


def test_time_stretch_functional_inverse():
    import mimikit_tpu as mmk

    y = np.sin(np.linspace(0, 400, 16000)).astype(np.float32)
    f = mmk.TimeStretch(rate=2.0, n_fft=1024, hop_length=256)
    out = f(y)
    assert len(out) == 8000
    assert len(f.inv(out)) == 16000


def test_time_stretch_jax_path_matches_np():
    import jax.numpy as jnp

    import mimikit_tpu as mmk

    sr = 16000
    y = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    f = mmk.TimeStretch(rate=0.5, n_fft=1024, hop_length=256)
    a = f(y)
    b = np.asarray(f(jnp.asarray(y)))
    assert a.shape == b.shape == (2 * sr,)
    # f32 phase accumulation drifts slightly vs the f64 host path; both
    # must stay pitch-exact
    assert np.abs(a - b).max() < 5e-2
    for out in (a, b):
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        fd = np.fft.rfftfreq(len(out), 1 / sr)[spec[1:].argmax() + 1]
        assert abs(fd - 440.0) < 15.0
