"""Environment health probe: is the device/tunnel fit for benchmarking?

Measures the three quantities that calibrate every artifact refresh
(CLAUDE.md "calibrate suspicious numbers"):

* read RTT — one ~35 ms round-trip when healthy;
* MXU throughput — a 20-matmul f32 chain, ~200 TFLOPs effective on a
  healthy v5e (single-pass bf16 multiplies at default precision);
* dispatch latency — the wall of 64 TINY chained ops read once, the
  quantity that degraded 10-30x during the 2026-08-21 session while the
  matmul chain stayed at full speed (short-kernel artifacts like the
  preproc suite are garbage in that state: mu-law measured -97% with 81%
  spread on unchanged code).

Prints one JSON line; exit 1 if the environment fails the healthy
thresholds, so refresh scripts can gate on it::

    python benchmarks/probe_env.py && python benchmarks/bench_preprocessing.py
"""
import json
import sys
import time


def main():
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))

    import jax
    import jax.numpy as jnp

    from _timing import fence, read_rtt

    x = jnp.ones((4096, 4096), jnp.float32)

    @jax.jit
    def chain(v):
        for _ in range(20):
            v = v @ v * 1e-4
        return v

    t0 = time.time()
    y = chain(x)
    fence(y)
    compile_s = time.time() - t0
    # min of several reads: a single contaminated RTT sample both hides
    # real stalls and corrupts every derived number (an inflated RTT
    # subtraction once produced 657 "TFLOPs" and NEGATIVE dispatch
    # latency — above hardware peak, i.e. self-evidently junk)
    rtt = min(read_rtt(y) for _ in range(5))

    ts = []
    for _ in range(5):
        t0 = time.time()
        a = chain(x); b = chain(a); c = chain(b); d = chain(c)
        fence(d)
        ts.append((time.time() - t0 - rtt) / 4)
    tflops = 20 * 2 * 4096 ** 3 / sorted(ts)[2] / 1e12

    # dispatch-latency probe: small independent jitted calls, value-read
    # fence at the end — dominated by per-dispatch RPC overhead
    s = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def tiny(v):
        return v * 1.0001 + 1e-6

    r = tiny(s); fence(r)
    t0 = time.time()
    for _ in range(64):
        r = tiny(r)
    fence(r)
    dispatch_ms = (time.time() - t0 - rtt) / 64 * 1e3

    # physical-consistency guard: >450 TFLOPs (above v5e peak) or a
    # negative dispatch latency means the RTT subtraction itself was
    # contaminated — the measurement is junk, not healthy
    consistent = 0.0 <= dispatch_ms and tflops <= 450.0
    healthy = (
        consistent and rtt < 0.08 and tflops > 120 and dispatch_ms < 2.0
    )
    print(json.dumps({
        "metric": "env_health",
        "rtt_ms": round(rtt * 1e3, 2),
        "matmul_tflops": round(tflops, 1),
        "dispatch_ms": round(dispatch_ms, 3),
        "compile_s": round(compile_s, 1),
        "healthy": healthy,
    }))
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
