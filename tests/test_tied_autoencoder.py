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
