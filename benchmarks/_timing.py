"""Honest device timing — shim over :mod:`mimikit_tpu.timing`.

The canonical fence/timeit implementation lives in the package so the
public profiler (``mimikit_tpu.loops.profiler``) shares it; see that
module's docstring for why ``jax.block_until_ready`` cannot be trusted
through the device tunnel.
"""
from mimikit_tpu.timing import (  # noqa: F401
    fence,
    read_rtt,
    step_flops,
    timeit,
    timeit_stats,
)


def write_bench_json(name: str, results: list) -> str:
    """Write a driver-consumable artifact ``BENCH_<name>.json`` at the repo
    root: {"results": [...], "backend": ...} — one entry per metric, same
    schema as bench.py's JSON line.

    Artifact-integrity discipline (VERDICT r4 #1): before overwriting, the
    previous artifact is loaded and each entry gains a
    ``delta_vs_prev_pct`` field; any move beyond +-10% WITHOUT a ``note``
    explaining it is flagged loudly on stderr and marked
    ``needs_note: true`` so ``benchmarks/check_artifacts.py`` (and a human
    diff) cannot miss it.  This is what would have caught round 4's
    contended-tunnel refresh (samplernn f32 2.24 vs 1.72 ms in the docs).
    """
    import json
    import os
    import sys

    import jax

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_{name}.json",
    )
    prev = {}
    try:
        with open(path) as fp:
            for e in json.load(fp).get("results", []):
                prev[e.get("metric")] = e.get("value")
    except Exception:
        pass
    for e in results:
        old = prev.get(e.get("metric"))
        if old:
            delta = 100.0 * (e["value"] - old) / old
            e["delta_vs_prev_pct"] = round(delta, 1)
            if abs(delta) > 10.0 and "note" not in e:
                e["needs_note"] = True
                print(
                    f"# WARNING {e['metric']} moved {delta:+.1f}% vs the"
                    f" previous artifact ({old} -> {e['value']}) with no"
                    " 'note' — explain or re-measure before committing",
                    file=sys.stderr,
                )
    with open(path, "w") as fp:
        json.dump(
            {"backend": jax.default_backend(), "results": results}, fp, indent=1
        )
    return path
