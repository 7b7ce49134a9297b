"""Metric/audio logging surfaces (reference ``loops/logger.py``)."""
import numpy as np

from mimikit_tpu.loops.logger import AudioLogger, EpochMetrics, LossLogger


def test_epoch_metrics_averages_and_nan_guard():
    import pytest

    m = EpochMetrics(print_fn=lambda *_: None)
    m.on_epoch_start()
    m.log_output({"loss": 2.0, "acc": 0.5})
    m.log_output({"loss": 4.0, "acc": 1.0})
    avg = m.averages()
    assert avg["loss"] == 3.0 and avg["acc"] == 0.75
    with pytest.raises(RuntimeError):
        m.check_loss(float("nan"))


def test_loss_logger_h5_roundtrip(tmp_path):
    import h5py

    path = str(tmp_path / "logs" / "metrics.h5")
    logger = LossLogger(path)
    logger.log_metrics({"loss": 1.5, "lr": 1e-3}, step=0)
    logger.log_metrics({"loss": 1.25}, step=1)
    logger.log_metrics({"loss": 1.0}, step=1)  # overwrite same step
    with h5py.File(path, "r") as f:
        assert float(f["0/loss"][0]) == 1.5
        assert float(f["0/lr"][0]) == 1e-3
        assert float(f["1/loss"][0]) == 1.0


def test_audio_logger_write_and_template(tmp_path):
    from scipy.io import wavfile

    tmpl = str(tmp_path / "out" / "epoch={epoch}_p={prompt_idx}.wav")
    logger = AudioLogger(sr=8000, file_template=tmpl)
    y = np.sin(np.linspace(0, 40, 4000)).astype(np.float32)
    path = logger.write(y, epoch=3, prompt_idx=7)
    assert path.endswith("epoch=3_p=7.wav")
    sr, audio = wavfile.read(path)
    assert sr == 8000 and len(audio) == 4000

    # mp3 template falls back to wav when no encoder is available
    tmpl2 = str(tmp_path / "out" / "take_{epoch}.mp3")
    path2 = AudioLogger(sr=8000, file_template=tmpl2).write(y, epoch=1)
    import os

    assert os.path.exists(path2)


def test_audio_logger_rejects_multichannel():
    import pytest

    logger = AudioLogger(sr=8000)
    with pytest.raises(ValueError):
        logger.to_numpy(np.zeros((2, 100, 3)))
