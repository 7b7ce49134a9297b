"""Honest device timing — shim over :mod:`mimikit_tpu.timing`.

The canonical fence/timeit implementation lives in the package so the
public profiler (``mimikit_tpu.loops.profiler``) shares it; see that
module's docstring for why ``jax.block_until_ready`` cannot be trusted
through the device tunnel.
"""
from mimikit_tpu.timing import fence, read_rtt, step_flops, timeit  # noqa: F401


def write_bench_json(name: str, results: list) -> str:
    """Write a driver-consumable artifact ``BENCH_<name>.json`` at the repo
    root: {"results": [...], "backend": ...} — one entry per metric, same
    schema as bench.py's JSON line."""
    import json
    import os

    import jax

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_{name}.json",
    )
    with open(path, "w") as fp:
        json.dump(
            {"backend": jax.default_backend(), "results": results}, fp, indent=1
        )
    return path
