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
