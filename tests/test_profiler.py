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
