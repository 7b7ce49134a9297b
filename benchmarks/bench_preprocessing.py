"""Feature-pipeline throughput: STFT / mel / mu-law vs the 100x-realtime
target (BASELINE.md).  Run on the TPU backend; prints one JSON line per op.
"""
import json
import sys
import time

import numpy as np


def timeit(fn, *args, n=5):
    from _timing import timeit as _t

    return _t(fn, *args, n=n)


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    import mimikit_tpu as mmk
    from mimikit_tpu.features import dsp

    sr = 22050
    seconds = 120
    y = jnp.asarray(
        np.random.uniform(-1, 1, sr * seconds).astype(np.float32)
    )

    results = {}

    stft = lambda x: dsp.stft_jax(x, 2048, 512, True, "hann")
    results["stft_2048"] = seconds / timeit(stft, y)

    mag = mmk.MagSpec(2048, 512)
    S = mag.jax_func(y)
    mel = mmk.MelSpec(n_mels=128, sr=sr, n_fft=2048)
    results["melspec_128"] = seconds / timeit(mel.jax_func, S)

    mu = mmk.MuLawCompress(256)
    results["mulaw_jnp"] = seconds / timeit(mu.jax_func, y)

    from mimikit_tpu.ops import pallas_kernels as pk

    results["mulaw_pallas"] = seconds / timeit(pk.mulaw_compress, y)

    gla = mmk.GLA(2048, 512, n_iter=32)
    gla_seconds = 8
    results["griffinlim_32it"] = gla_seconds / timeit(
        gla.jax_func, S[: 1 + gla_seconds * sr // 512], n=2
    )

    entries = [
        {
            "metric": f"preproc_{k}_x_realtime",
            "value": round(v, 1),
            "unit": "x_realtime",
            "vs_baseline": round(v / 100.0, 2),
        }
        for k, v in results.items()
    ]
    for e in entries:
        print(json.dumps(e))
    from _timing import write_bench_json

    path = write_bench_json("preproc", entries)
    print(f"# backend={jax.default_backend()} wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
