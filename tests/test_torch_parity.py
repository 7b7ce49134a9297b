"""Torch-numerics parity — executed in an isolated subprocess.

torch and jaxlib both bundle LLVM/OpenMP; loading torch into the main suite
process makes later XLA:CPU compilations segfault. The actual assertions
live in ``torch_parity_impl.py``.
"""
import os
import subprocess
import sys


def test_torch_parity_subprocess():
    impl = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torch_parity_impl.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-m", "pytest", impl, "-q", "-x"],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
