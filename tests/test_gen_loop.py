"""GenerateLoopV2 integration with a 2-input/2-target fake ARM
(reference ``tests/test_gen_loop.py``)."""
import numpy as np

import mimikit_tpu as mmk

from .test_utils import TestARM, make_db_config


def test_should_run(tmp_path):
    ds_cfg = make_db_config(tmp_path, filename="gen-test.h5")
    db = ds_cfg.create(mode="w")
    extractor = ds_cfg.extractors[0]
    net = TestARM(
        TestARM.Config(
            io_spec=mmk.IOSpec(
                inputs=(
                    mmk.InputSpec(
                        extractor_name=extractor.name,
                        transform=mmk.Normalize(),
                        module=mmk.LinearIO(),
                    ).bind_to(extractor),
                    mmk.InputSpec(
                        extractor_name=extractor.name,
                        transform=mmk.MuLawCompress(256),
                        module=mmk.LinearIO(),
                    ).bind_to(extractor),
                ),
                targets=(
                    mmk.TargetSpec(
                        extractor_name=extractor.name,
                        transform=mmk.Normalize(),
                        module=mmk.LinearIO(),
                        objective=mmk.Objective("none"),
                    ).bind_to(extractor),
                    mmk.TargetSpec(
                        extractor_name=extractor.name,
                        transform=mmk.MuLawCompress(256),
                        module=mmk.LinearIO(),
                        objective=mmk.Objective("none"),
                    ).bind_to(extractor),
                ),
            )
        )
    )

    loop = mmk.GenerateLoopV2.from_config(
        mmk.GenerateLoopV2.Config(
            prompts_position_sec=(None,),
            batch_size=1,
            output_duration_sec=0.01,
            prompts_length_sec=0.01,
            display_waveform=False,
        ),
        db,
        net,
    )
    assert isinstance(loop, mmk.GenerateLoopV2)
    ran = False
    for outputs in loop.run():
        ran = True
        assert len(outputs) == 2
        assert isinstance(outputs[0], np.ndarray)
        # the generated region must have been filled in
        assert np.all(outputs[0][:, -loop.n_steps :] != 0)
    assert ran


def test_device_stepwise_matches_host_loop():
    """The device-resident stepwise scan (networks exposing
    ``stepwise_step_fn``) is token-identical to the reference-semantics
    host loop, including multi-step ``until`` writes (seq2seq emits ``hop``
    frames per visited step) and the truncated final write."""
    n_fft, hop_length = 256, 64
    s2s = mmk.Seq2SeqLSTMNetwork.from_config(
        mmk.Seq2SeqLSTMNetwork.Config(
            io_spec=mmk.IOSpec.magspec_io(
                mmk.IOSpec.MagSpecIOConfig(n_fft=n_fft, hop_length=hop_length)
            ),
            model_dim=32, hop=4,
        )
    )
    s2s.seed(0)
    B = 2
    prompts = (
        np.abs(np.random.RandomState(0).randn(B, 8, n_fft // 2 + 1))
        .astype(np.float32),
    )
    s2s._ensure_params(prompts)
    # n_steps=13 NOT a multiple of hop=4: pins the truncated final write
    loop = mmk.GenerateLoopV2(
        mmk.GenerateLoopV2.Config(), s2s, 13, dataloader=None
    )
    orig = s2s.stepwise_step_fn
    s2s.stepwise_step_fn = lambda p: None  # force the host loop
    host = loop._stepwise(prompts, np.arange(B), {})
    s2s.stepwise_step_fn = orig
    assert loop._device_step_fn({}) is not None
    dev = loop._stepwise(prompts, np.arange(B), {})
    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        assert h.shape == d.shape
        np.testing.assert_allclose(h, d, rtol=1e-5, atol=1e-5)
    # unsupported sampler params must still route to the host loop
    assert s2s.stepwise_step_fn({"not_a_knob": 1}) is None
