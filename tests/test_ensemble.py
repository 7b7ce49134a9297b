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


def test_nearest_next_neighbor_steps():
    """NNN: DTW-match a prompt into a corpus, then play successive frames."""
    corpus = np.random.rand(50, 8).astype(np.float32)
    nnn = mmk.NearestNextNeighbor(feature=lambda x: x, snd=corpus)
    prompt_frames = corpus[10:14]  # exact subsequence -> should match at 14
    out1 = nnn.generate_step((prompt_frames[None],), t=100)
    assert out1.shape == (1, 1, 8)
    start = nnn._starts[0] - 1
    # consecutive step continues the corpus walk
    out2 = nnn.generate_step((prompt_frames[None],), t=101)
    assert np.allclose(out2[0, 0], corpus[start + 1])


def test_voting_ensemble_weights():
    class Const:
        def __init__(self, v):
            self.v = v

        def before_generate(self, *a):
            pass

        def after_generate(self, *a):
            return None

        def generate_step(self, inputs, *, t=0, **kw):
            return np.full((1, 1), self.v, np.float32)

    ens = mmk.VotingEnsemble([Const(1.0), Const(3.0)], weights=[1, 1])
    out = ens.generate_step((np.zeros((1, 4)),), t=0)
    assert np.allclose(out, 2.0)  # mean of 1 and 3
