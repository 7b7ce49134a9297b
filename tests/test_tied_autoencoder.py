"""TiedAE forward shapes under kernel/pad permutations
(reference ``tests/test_tied_autoencoder.py``)."""
import numpy as np
import pytest

import mimikit_tpu as mmk


@pytest.mark.parametrize(
    "given_kernel_sizes", [(3, 5, 7), (7, 5, 3), (3, 3, 3)]
)
@pytest.mark.parametrize("given_pad", [True, False])
def test_forward(given_pad, given_kernel_sizes):
    under_test = mmk.TiedAE.from_config(
        mmk.TiedAE.Config(
            io_spec=mmk.IOSpec.magspec_io(
                mmk.IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64)
            ),
            kernel_sizes=given_kernel_sizes,
            dims=(32, 16, 8),
            independence_reg=0.25,
            causal_pad=given_pad,
        )
    )
    assert isinstance(under_test, mmk.TiedAE)

    signal = np.random.randn(4, 4096).astype(np.float32)
    spec_in = under_test.config.io_spec.inputs[0].transform(signal)

    output = under_test.forward((spec_in,))
    assert isinstance(output, tuple)
    assert output[0].shape == spec_in.shape


def test_tiedae_trains_and_monitors(tmp_path):
    """TiedAE under TrainARMLoop with the EncodeDecodeLoop monitor
    (the reference's autoencoder training path, SURVEY §2.8)."""
    import os

    from .test_utils import make_db_config

    ds_cfg = make_db_config(tmp_path, filename="tied.h5")
    db = ds_cfg.create(mode="w")
    io = mmk.IOSpec.magspec_io(
        mmk.IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64),
        extractor=ds_cfg.extractors[0],
    )
    ae = mmk.TiedAE.from_config(
        mmk.TiedAE.Config(io_spec=io, kernel_sizes=(3,), dims=(16,))
    )
    cfg = mmk.TrainARMConfig(
        root_dir=str(tmp_path),
        limit_train_batches=2,
        batch_size=2,
        batch_length=8,
        max_epochs=1,
        every_n_epochs=1,
        CHECKPOINT_TRAINING=True,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="wav",
        prompt_length_sec=0.05,
        n_examples=1,
    )
    loop = mmk.TrainARMLoop.from_config(cfg, dataset=db, network=ae)
    loop.run()
    content = os.listdir(os.path.join(str(tmp_path), loop.hash_))
    assert "epoch=1.ckpt" in content
    outputs = os.listdir(os.path.join(str(tmp_path), loop.hash_, "outputs"))
    assert ".wav" in {os.path.splitext(o)[-1] for o in outputs}
