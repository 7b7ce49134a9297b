"""Decode throughput vs stream count: single-stream latency through batched
throughput for the flagship SampleRNN config."""
import json
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from _timing import fence, read_rtt
    import jax

    import mimikit_tpu as mmk

    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(sr=16000, q_levels=256, mlp_dim=256)
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(16, 8, 8), hidden_dim=256, io_spec=io)
    )
    net.seed(0)
    rf = net.rf
    n_steps = int(os.environ.get("BENCH_STEPS", "2048"))

    for batch in (1, 8, 64, 256):
        prompts = (
            np.random.randint(0, 256, (batch, 2 * rf)).astype(np.int32),
        )
        out = net.generate(prompts, n_steps=n_steps, temperature=0.9)
        rtt = read_rtt(out)
        t0 = time.time()
        n_rep = 3
        for i in range(n_rep):
            out = net.generate(
                prompts, n_steps=n_steps, temperature=0.9,
                rng=jax.random.PRNGKey(i),
            )
        fence(out)
        dt = max((time.time() - t0 - rtt) / n_rep, 1e-9)
        print(
            json.dumps(
                {
                    "metric": f"samplernn3_decode_b{batch}",
                    "value": round(batch * n_steps / dt, 1),
                    "unit": "samples/s",
                    "vs_baseline": round(batch * n_steps / dt / 50000.0, 2),
                }
            )
        )
        print(
            f"# b={batch}: {n_steps/dt:.0f} steps/s,"
            f" {dt/n_steps*1e6:.1f} us/step",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
