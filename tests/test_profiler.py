"""Profiling surface (new vs the reference — SURVEY.md §5.1 notes the
reference only has tqdm + wall clock)."""
import os

import numpy as np

from mimikit_tpu.loops.profiler import StepTimer, annotate, trace


def test_step_timer_summary():
    t = StepTimer("decode")
    for _ in range(5):
        with t:
            np.dot(np.ones((64, 64)), np.ones((64, 64)))
    s = t.summary()
    assert s["n"] == 4  # first (warm-up) dropped
    assert s["mean_ms"] >= 0 and s["p95_ms"] >= s["p50_ms"] >= 0
    assert "decode" in t.report()


def test_step_timer_block_and_stop():
    import jax.numpy as jnp

    t = StepTimer()
    with t:
        pass  # __exit__ records once...
    t._t0 = None
    t.times.clear()
    t._t0 = __import__("time").perf_counter()
    out = t.block_and_stop(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert out.shape == (8, 8)
    assert len(t.times) == 1


def test_step_timer_agrees_with_timeit():
    """StepTimer (fence-based since round 3) and the benchmark harness's
    ``timeit`` must agree on a known-FLOPs matmul chain — pinning that no
    public timing API can reproduce the dispatch-latency overstatement
    CLAUDE.md documents (VERDICT r2 weak #3)."""
    import time

    import jax
    import jax.numpy as jnp

    from mimikit_tpu.timing import read_rtt, timeit

    @jax.jit
    def chain(x):
        for _ in range(30):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((256, 256), jnp.float32) * 0.01
    per_call = timeit(chain, x, n=3, min_seconds=0.2)

    t = StepTimer("chain")
    rtt = read_rtt(chain(x))
    for _ in range(4):
        t._t0 = time.perf_counter()
        t.block_and_stop(chain(x))
    mean_s = t.summary(drop_first=1)["mean_ms"] / 1e3 - rtt
    # both fence on a value read; StepTimer pays per-call fence jitter, so
    # allow a loose band — the failure mode being pinned is >100x, not 2x
    assert mean_s < 20 * per_call + 0.05
    assert per_call < 20 * max(mean_s, 1e-4) + 0.05


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with trace(logdir), annotate("matmul"):
        (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
    # xplane protobuf dump lands under plugins/profile/<run>/
    found = []
    for dirpath, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "trace produced no files"
