"""Targeted TPU probe: bf16 fused KV-ring serving vs f32, b16/b32.

Measures the same quantity as bench_decode's kv_stream entries (wall ms
per 1600-sample chunk through the public stream_tokens API; arrival of
the host numpy chunk == completion, so no fence subtleties).  Run with
MMK_COMPILE_CACHE=1 — each new (B, bf16) kernel variant is a fresh
~2-5 min Mosaic compile through the tunnel, paid once per machine.
"""
import json
import os
import sys
import time

os.environ.setdefault("MMK_COMPILE_CACHE", "1")

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
            print(f"usage: probe_kv_bf16.py [B:bf16 ...] e.g. 16:1 32:0 "
                  f"(got {c!r})", file=sys.stderr)
            return 2
        cases.append(parts)
    cases = cases or [("16", "1"), ("32", "1"), ("16", "0")]
    os.environ["MMK_DECODE_KV"] = "1"
    os.environ["MMK_PALLAS_DECODE"] = "auto"
    for B, bf16 in cases:
        B = int(B)
        os.environ["MMK_DECODE_BF16"] = bf16
        prompts = (np.random.randint(0, 256, (B, 64)).astype(np.int32),)
        it = mmk.stream_tokens(tf, prompts, chunk, temperature=0.9)
        t_c = time.time()
        next(it)  # compile + warm
        compile_s = time.time() - t_c
        n_chunks = 5
        t0 = time.time()
        for _ in range(n_chunks):
            next(it)
        per_chunk = (time.time() - t0) / n_chunks
        print(json.dumps({
            "metric": f"transformer8l_kv_stream{'_bf16' if bf16 == '1' else ''}_b{B}_ms_per_100ms_chunk",
            "value": round(per_chunk * 1e3, 2),
            "unit": "ms",
            "x_realtime_per_stream": round(0.1 / per_chunk, 2),
            "aggregate_samples_per_sec": round(B * chunk / per_chunk, 1),
            # 'pallas' alone would also read true when the VMEM gate
            # routed onto the pure-jax ring scan (advisor r4) — record
            # the gate decision so a rejection is never mislabeled as a
            # fused-kernel measurement
            "fused_gate": bool(tf._use_pallas_kv(B, False, bf16 == "1")),
            "pallas": (
                bool(tf._use_pallas_kv(B, False, bf16 == "1"))
                and not getattr(tf, "_pallas_kv_disabled", False)
            ),
            "first_call_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
