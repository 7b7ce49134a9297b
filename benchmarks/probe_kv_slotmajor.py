"""TPU probe: slot-major KV-ring kernel (round 5) vs the r4 stream-major
numbers, through the public stream_tokens API.

Measures ms per 1600-sample chunk at the bench config (8L/d256/rf64) for
the given B:bf16 cases (default: the VERDICT r4 #2 targets).  Also
asserts the fused gate engaged and prints per-chunk p50/p95 so the
realtime claim carries its tail.  r4 baselines (stream-major): b1 57.4,
b4 60.8, b16 106.5, b32 ~192 ms/chunk.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import mimikit_tpu as mmk

    io3 = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            sr=16000, q_levels=256, mlp_dim=128, input_module_type="embedding"
        )
    )
    tf = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=io3, model_dim=256, n_heads=8, feedforward_dim=1024,
            num_layers=8, rf=64,
        )
    )
    tf.seed(0)

    chunk = 1600
    cases = []
    for c in sys.argv[1:]:
        parts = c.split(":")
        if len(parts) != 2 or not parts[0].isdigit() or parts[1] not in ("0", "1"):
            print(f"usage: probe_kv_slotmajor.py [B:bf16 ...] (got {c!r})",
                  file=sys.stderr)
            return 2
        cases.append(parts)
    cases = cases or [("16", "0"), ("32", "0"), ("8", "0")]
    os.environ["MMK_DECODE_KV"] = "1"
    os.environ["MMK_PALLAS_DECODE"] = "auto"
    n_chunks = int(os.environ.get("PROBE_CHUNKS", "20"))
    for B, bf16 in cases:
        B = int(B)
        os.environ["MMK_DECODE_BF16"] = bf16
        prompts = (np.random.randint(0, 256, (B, 64)).astype(np.int32),)
        it = mmk.stream_tokens(tf, prompts, chunk, temperature=0.9)
        t_c = time.time()
        next(it)  # compile + warm
        compile_s = time.time() - t_c
        lats = []
        for _ in range(n_chunks):
            t0 = time.time()
            next(it)
            lats.append(time.time() - t0)
        lats_ms = np.sort(np.asarray(lats)) * 1e3
        print(json.dumps({
            "metric": f"kv_slotmajor{'_bf16' if bf16 == '1' else ''}_b{B}_ms_per_100ms_chunk",
            "value": round(float(np.mean(lats_ms)), 2),
            "p50_ms": round(float(np.percentile(lats_ms, 50)), 2),
            "p95_ms": round(float(np.percentile(lats_ms, 95)), 2),
            "max_ms": round(float(lats_ms[-1]), 2),
            "x_realtime_per_stream": round(100.0 / float(np.mean(lats_ms)), 2),
            "aggregate_samples_per_sec": round(
                B * chunk / (float(np.mean(lats_ms)) / 1e3), 1
            ),
            "fused_gate": bool(tf._use_pallas_kv(B, False, bf16 == "1")),
            "pallas": (
                bool(tf._use_pallas_kv(B, False, bf16 == "1"))
                and not getattr(tf, "_pallas_kv_disabled", False)
            ),
            "first_call_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
