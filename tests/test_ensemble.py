"""Ensemble generation chaining two real checkpoints across sample rates
(reference ``tests/test_ensemble.py``)."""
import numpy as np
import pytest

import mimikit_tpu as mmk

from .test_utils import RandSignal


def _train_ckpt(tmp_path, net, ds_cfg, name):
    db = ds_cfg.create(mode="w")
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path / name),
        limit_train_batches=2,
        batch_size=2,
        batch_length=8,
        max_epochs=1,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=net)
    loop.run()
    return mmk.Checkpoint(id=loop.hash_, epoch=1, root_dir=str(tmp_path / name))


def test_ensemble_generation(tmp_path):
    # SampleRNN @ 16k
    ds16 = mmk.DatasetConfig(
        sources=("0", "1"),
        filename=str(tmp_path / "db16.h5"),
        extractors=(
            mmk.Extractor(name="signal", functional=RandSignal(16000, 32000)),
        ),
    )
    io16 = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(sr=16000, q_levels=32, mlp_dim=16),
        extractor=ds16.extractors[0],
    )
    srnn = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(4, 2, 2), hidden_dim=16, io_spec=io16)
    )
    ck1 = _train_ckpt(tmp_path, srnn, ds16, "srnn")

    # WaveNet @ 22050
    ds22 = mmk.DatasetConfig(
        sources=("0", "1"),
        filename=str(tmp_path / "db22.h5"),
        extractors=(
            mmk.Extractor(name="signal", functional=RandSignal(22050, 44100)),
        ),
    )
    io22 = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            sr=22050, q_levels=32, mlp_dim=16, input_module_type="embedding"
        ),
        extractor=ds22.extractors[0],
    )
    wn = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(io_spec=io22, blocks=(3,), dims_dilated=(16,))
    )
    ck2 = _train_ckpt(tmp_path, wn, ds22, "wn")

    base_sr = 22050
    stream = iter(
        [
            dict(generator=ck1, seconds=0.1, temperature=1.0),
            dict(generator=ck2, seconds=0.1, temperature=0.5),
            dict(generator=ck1, seconds=0.1, temperature=None),
        ]
    )
    prompt = np.random.uniform(-1, 1, (1, 4410)).astype(np.float32)
    ens = mmk.EnsembleGenerator(
        prompt, max_seconds=0.5, base_sr=base_sr, stream=stream
    )
    out = ens.run()
    assert out.shape == (1, int(0.5 * base_sr))
    # the generated region extends beyond the prompt
    assert np.any(out[:, 4410:] != 0)
