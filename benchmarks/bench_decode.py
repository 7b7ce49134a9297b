"""Decode throughput artifacts: Pallas fused kernels vs the scan decoders.

Writes ``BENCH_decode.json`` at the repo root (one entry per config) and
prints each entry as a JSON line.  Baselines: 50k samples/s/chip for the
3-tier SampleRNN north star; 1M samples/s for WaveNet-10.
"""
import json
import os
import sys
import time

import numpy as np


def bench(net, B, n_steps, prior_t, q, flag, reps=3, env=()):
    import jax

    from _timing import fence, read_rtt

    os.environ["MMK_PALLAS_DECODE"] = flag
    for k, v in env:
        os.environ[k] = v
    prompts = (np.random.randint(0, q, (B, prior_t)).astype(np.int32),)
    net._ensure_params(prompts)
    out = net.generate(prompts, n_steps=n_steps, temperature=0.9)
    fence(out[0])
    rtt = read_rtt(out[0])

    def run(k):
        # pipeline the reps: fence once at the end so the ~35 ms tunnel
        # round-trip is paid once, not per rep (see bench.py)
        t0 = time.time()
        for i in range(k):
            o = net.generate(
                prompts, n_steps=n_steps, temperature=0.9,
                rng=jax.random.PRNGKey(i),
            )
        fence(o[0])
        return max((time.time() - t0 - rtt) / k, 1e-9)

    per_rep = run(reps)
    if per_rep * reps < 1.0:
        # too fast for the fence's ms-scale jitter: re-run with enough reps
        # that the timed region dominates the round-trip
        reps = min(int(1.0 / per_rep) + 1, 512)
        per_rep = run(reps)
    # repeat discipline (VERDICT r4 #1) with one-sided robustness: tunnel
    # stalls only ADD time, so when regions disagree >25% keep sampling
    # (up to 7) and take the median of the LOWEST three — same estimator
    # as mimikit_tpu.timing.timeit_stats; the spread still exposes the
    # contamination
    dts = sorted([per_rep, run(reps), run(reps)])
    while len(dts) < 7 and (dts[-1] - dts[0]) / dts[len(dts) // 2] > 0.25:
        dts = sorted(dts + [run(reps)])
    dt = dts[len(dts) // 2] if len(dts) <= 3 else sorted(dts[:3])[1]
    spread_pct = round(100.0 * (dts[-1] - dts[0]) / dt, 1)
    for k, _ in env:
        os.environ.pop(k, None)
    routing = getattr(net, "_use_pallas_decode", None)
    used_pallas = bool(routing and routing(B, prior_t, n_steps, argmax=False))
    split = getattr(net, "_pallas_batch_split", None)
    if not used_pallas and split is not None:
        # batches past the kernel's VMEM envelope decode as pipelined
        # sub-batch kernel dispatches — still the fused path
        used_pallas = split(B, prior_t, n_steps, argmax=False) is not None
    if getattr(net, "_pallas_disabled", False):
        # routing said yes but the kernel failed at compile/run time and
        # generate() silently fell back to the scan — report the truth
        used_pallas = False
    return B * n_steps / dt, dt * 1e6 / n_steps, used_pallas, spread_pct


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    import mimikit_tpu as mmk
    from _timing import write_bench_json

    results = []

    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(sr=16000, q_levels=256, mlp_dim=256)
    )
    srnn = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(16, 8, 8), hidden_dim=256, io_spec=io)
    )
    srnn.seed(0)

    io2 = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            sr=16000, q_levels=256, mlp_dim=128, input_module_type="embedding"
        )
    )
    wn = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io2, blocks=(10,), dims_dilated=(128,), skips_dim=128,
            residuals_dim=128, pad_side=0,
        )
    )
    wn.seed(0)

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

    jb = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=mmk.IOSpec.mulaw_io(
                mmk.IOSpec.MuLawIOConfig(sr=16000, q_levels=256, mlp_dim=128)
            ),
            frame_sizes=(32, 16, 4), model_dim=128, n_heads=8,
            feedforward_dim=256, num_layers=2, rf=128, input_dropout=0.0,
        )
    )
    jb.seed(0)

    cases = [
        # (name, net, B, n_steps, prior_t, flag, baseline)
        ("samplernn3_pallas_b1", srnn, 1, 16384, 32, "auto", 50_000.0),
        ("samplernn3_scan_b1", srnn, 1, 16384, 32, "0", 50_000.0),
        ("samplernn3_pallas_b256", srnn, 256, 16384, 32, "auto", 50_000.0),
        ("samplernn3_pallas_b512", srnn, 512, 16384, 32, "auto", 50_000.0),
        ("samplernn3_pallas_b1024", srnn, 1024, 16384, 32, "auto", 50_000.0),
        ("samplernn3_scan_b256", srnn, 256, 16384, 32, "0", 50_000.0),
        ("wavenet10_pallas_b8", wn, 8, 2048, wn.rf + 8, "auto", 1e6),
        ("wavenet10_pallas_b24", wn, 24, 2048, wn.rf + 8, "auto", 1e6),
        # past b24 the dilation rings outgrow scoped VMEM: auto now routes
        # wide batches to the CHUNKED state-carrying kernel (large-dilation
        # rings in HBM, one DMA'd row per step — ops/pallas_decode.py:
        # make_wavenet_pallas_chunked), which beats the scan 3-4x where the
        # old batch-split conceded (r3: split b128 3.6M vs scan 4.7M)
        ("wavenet10_pallas_b64", wn, 64, 2048, wn.rf + 8, "auto", 1e6),
        ("wavenet10_pallas_b128", wn, 128, 2048, wn.rf + 8, "auto", 1e6),
        ("wavenet10_pallas_b256", wn, 256, 2048, wn.rf + 8, "auto", 1e6),
        ("wavenet10_scan_b64", wn, 64, 2048, wn.rf + 8, "0", 1e6),
        ("wavenet10_scan_b128", wn, 128, 2048, wn.rf + 8, "0", 1e6),
        ("wavenet10_scan_b256", wn, 256, 2048, wn.rf + 8, "0", 1e6),
        ("transformer8l_pallas_b1", tf, 1, 4096, 64, "auto", 16000.0),
        ("transformer8l_scan_b1", tf, 1, 4096, 64, "0", 16000.0),
        # batched flat-transformer kernel: forced (flag=1) to map the
        # kernel-vs-scan frontier — auto routes B>1 to the scan
        ("transformer8l_pallas_b16", tf, 16, 4096, 64, "1", 16000.0),
        ("transformer8l_scan_b16", tf, 16, 4096, 64, "0", 16000.0),
        # aggregate-scaling sweep (VERDICT r3 weak #5: nothing showed the
        # per-stream rate vs realtime — see per_stream fields below)
        ("transformer8l_scan_b32", tf, 32, 4096, 64, "0", 16000.0),
        ("transformer8l_scan_b64", tf, 64, 4096, 64, "0", 16000.0),
        # bf16 window refeed (MMK_DECODE_BF16): the decode is MXU-bound —
        # ~17 GFLOP/step at b16 — so bf16's 2x matmul rate is the whole
        # remaining lever.  NOTE the physics bound: even at bf16 peak
        # (197 TFLOPS) 17.2 GFLOP/step = 87 us/step = 11.5k samples/s per
        # stream < 16 kHz realtime — window-refeed semantics CANNOT serve
        # live audio per stream at this depth; only a KV-cache mode
        # (different PE semantics, PARITY divergence) could.
        ("transformer8l_scan_bf16_b16", tf, 16, 4096, 64, "0", 16000.0,
         (("MMK_DECODE_BF16", "1"),)),
        ("transformer8l_scan_bf16_b32", tf, 32, 4096, 64, "0", 16000.0,
         (("MMK_DECODE_BF16", "1"),)),
        # hierarchical tiers: the fused tier-pyramid kernel batches streams
        # too (frame-major block-diag attention) up to its VMEM envelope
        ("jukebox3_pallas_b1", jb, 1, 4096, 128, "auto", 16000.0),
        ("jukebox3_win_b1", jb, 1, 4096, 128, "0", 16000.0),
        ("jukebox3_pallas_b16", jb, 16, 4096, 128, "auto", 16000.0),
        ("jukebox3_win_b16", jb, 16, 4096, 128, "0", 16000.0),
    ]
    for name, net, B, n_steps, prior_t, flag, base, *env in cases:
        sps, us, used_pallas, spread_pct = bench(
            net, B, n_steps, prior_t, 256, flag,
            env=env[0] if env else (),
        )
        entry = {
            "metric": f"{name}_samples_per_sec",
            "value": round(sps, 1),
            "unit": "samples/s",
            "vs_baseline": round(sps / base, 3),
            "us_per_step": round(us, 2),
            "spread_pct": spread_pct,
            "pallas": bool(used_pallas and flag != "0"),
            # serving honesty: aggregate samples/s hides that each of the B
            # streams must individually beat sr to serve live audio
            "per_stream_samples_per_sec": round(sps / B, 1),
            "x_realtime_per_stream": round(sps / B / 16000.0, 3),
        }
        results.append(entry)
        print(json.dumps(entry))

    # seq2seq block-AR decode: the fast path scans hop-frame blocks on
    # device (networks/s2s_lstm.py:generate) vs the host-driven stepwise
    # loop.  Frames carry hop_length samples -> samples/s-equivalent.
    import jax as _jax
    from mimikit_tpu.loops.generate import GenerateLoopV2

    n_fft, hop_length = 2048, 512
    s2s = mmk.Seq2SeqLSTMNetwork.from_config(
        mmk.Seq2SeqLSTMNetwork.Config(
            io_spec=mmk.IOSpec.magspec_io(
                mmk.IOSpec.MagSpecIOConfig(n_fft=n_fft, hop_length=hop_length)
            ),
            model_dim=512, hop=8,
        )
    )
    s2s.seed(0)
    n_frames = 512
    for name, B, fast in (("fast_b1", 1, True), ("fast_b16", 16, True),
                          ("stepwise_b1", 1, False)):
        prompts = (
            np.abs(np.random.randn(B, 16, n_fft // 2 + 1)).astype(np.float32),
        )
        s2s._ensure_params(prompts)
        # stepwise now rides the device-resident scan (one dispatch; the
        # final np.asarray is a value read, so arrival == completion)
        steps = n_frames if fast else 256
        if fast:
            from _timing import fence, read_rtt

            out = s2s.generate(prompts, n_steps=steps)
            fence(out[0])
            rtt = read_rtt(out[0])

            def run(k):
                t0 = time.time()
                for i in range(k):
                    o = s2s.generate(
                        prompts, n_steps=steps, rng=_jax.random.PRNGKey(i)
                    )
                fence(o[0])
                return max((time.time() - t0 - rtt) / k, 1e-9)

            dt = run(3)
            k = 3
            if dt * 3 < 1.0:
                k = min(int(1.0 / dt) + 1, 512)
                dt = run(k)
            dt = sorted([dt, run(k), run(k)])[1]
        else:
            loop = GenerateLoopV2(
                GenerateLoopV2.Config(), s2s, steps, dataloader=None
            )
            loop._stepwise(prompts, np.arange(B), {})  # warm the jit
            t0 = time.time()
            loop._stepwise(prompts, np.arange(B), {})
            dt = max(time.time() - t0, 1e-9)
        fps = B * steps / dt
        entry = {
            "metric": f"seq2seq_{name}_frames_per_sec",
            "value": round(fps, 1),
            "unit": "frames/s",
            # realtime factor at sr=22050 with hop_length samples per frame
            "vs_baseline": round(fps * hop_length / 22050.0, 2),
            "samples_per_sec_eq": round(fps * hop_length, 1),
        }
        results.append(entry)
        print(json.dumps(entry))

    # streaming latency: 100 ms audio chunks from the state-carrying stream
    # (the serving path — loops/streaming.py).  Reported as wall ms per
    # 1600-sample chunk and the realtime factor that implies.
    os.environ["MMK_PALLAS_DECODE"] = "auto"
    chunk = 1600
    # jukebox single-stream serving rides the fused tier-pyramid kernel
    # through the same streaming API (window re-feed per chunk, exact)
    stream_cases = (
        ("samplernn3_stream_b1", srnn, 1, 32, 20, ()),
        ("samplernn3_stream_b64", srnn, 64, 32, 20, ()),
        ("jukebox3_stream_b1", jb, 1, 128, 20, ()),
        # round 4: WaveNet wide-batch streaming rides the chunked
        # state-carrying kernel (dilation rings stay on device)
        ("wavenet10_stream_b64", wn, 64, wn.rf + 8, 20, ()),
        # round 4: KV-ring transformer serving (MMK_DECODE_KV=1) — O(1)
        # per step vs the window refeed's O(rf); streaming-transformer
        # semantics, PARITY divergence #10.
        #
        # b16 step anatomy (VERDICT r4 #2; v5e, 2026-08-21 A/B at 1600
        # steps/chunk, p50 chunk walls, ~35 ms of each is tunnel RTT):
        #   layer fori_loop + replicated rows + stream-major . 147.5 ms
        #   fori_loop + NO row replication + slot-major ...... 131.6 ms
        #   unrolled layers + replicated rows ................ 135.3 ms
        #   bf16 weights (fori, replicated) .................. 129.2 ms
        # Decomposition: device step time grows 14 us (b1) -> ~60 us
        # (b16) while per-op row counts barely matter (dropping the 8x
        # row replication moved only ~10%) — the wide-B wall is ATTEND
        # TRAFFIC over the (B*rf, d) ring space (B*rf = 1024 rows x 2
        # attends x 8 layers per step: score mask/exp/divide + two
        # selector matmuls each), which scales linearly in B and no
        # layout change removes.  The fori_loop's dynamically-indexed
        # weight loads cost ~10% at b16 (vs ~0 at b1 — re-measured, the
        # r4 "+5% at b4" underestimated wide batches).  What actually
        # clears the 100 ms deadline is the r5 read-behind pipeline:
        # cadence = kernel time only (86.4 ms mean, p95 90.7, 0
        # underruns), because the RTT + host conversion overlap the next
        # chunk's compute.  Same-day calibration: matmul chain 202
        # TFLOPs (full speed), read RTT 35.05 ms; kernel-execution walls
        # ran ~25% above the r4 baselines all session (environment-level,
        # not code — the delta notes on the entries carry this).
        ("transformer8l_kv_stream_b1", tf, 1, 64, 20,
         (("MMK_DECODE_KV", "1"),)),
        ("transformer8l_kv_stream_b4", tf, 4, 64, 20,
         (("MMK_DECODE_KV", "1"),)),
        ("transformer8l_kv_stream_b16", tf, 16, 64, 20,
         (("MMK_DECODE_KV", "1"),)),
        # b32 is the aggregate-throughput point of the fused KV sweep
        # (~267k samples/s); per-stream drops to ~0.5x realtime
        ("transformer8l_kv_stream_b32", tf, 32, 64, 20,
         (("MMK_DECODE_KV", "1"),)),
        # bf16 WEIGHTS in the fused KV kernel (MMK_DECODE_BF16).  Under
        # the r5 read-behind pipeline the chunk cadence IS the kernel
        # time (the tunnel RTT that made bf16 look like "a wash from b4
        # up" in r4 is hidden), so the kernel-side bf16 saving shows
        # directly.  The ring cannot go bf16 at all: Mosaic rejects
        # 1-row dynamic bf16 stores (see make_transformer_kv_ring_pallas).
        ("transformer8l_kv_stream_bf16_b1", tf, 1, 64, 20,
         (("MMK_DECODE_KV", "1"), ("MMK_DECODE_BF16", "1"))),
        ("transformer8l_kv_stream_bf16_b16", tf, 16, 64, 20,
         (("MMK_DECODE_KV", "1"), ("MMK_DECODE_BF16", "1"))),
    )
    # the r5 read-behind pipeline moves every stream entry well past the
    # 10% delta gate — one shared note explains the mechanism
    pipeline_note = (
        "r5 read-behind streaming pipeline: chunk k+1 is dispatched "
        "before chunk k's host read, so the ~35 ms tunnel round-trip "
        "and numpy conversion overlap the next chunk's device compute "
        "(tokens identical, pinned; MMK_STREAM_PIPELINE=0 opts out). "
        "KV wide-batch entries additionally drop the 8x activation-row "
        "replication (B % 8 == 0 rows are already sublane-aligned)."
    )
    for name, net, B, prior_t, n_chunks, env in stream_cases:
        for k, v in env:
            os.environ[k] = v
        prompts = (np.random.randint(0, 256, (B, prior_t)).astype(np.int32),)
        it = mmk.stream_tokens(net, prompts, chunk, temperature=0.9)
        next(it)  # compile + warm
        # tail latency is the binding constraint for realtime serving
        # (VERDICT r4 #7): one 150 ms chunk at a 100 ms deadline is an
        # audible dropout even if the MEAN clears realtime — record every
        # chunk's wall latency, report p50/p95/max and the underrun count
        lats = []
        for _ in range(n_chunks):
            t0 = time.time()
            next(it)  # host numpy chunk: arrival == completion
            lats.append(time.time() - t0)
        for k, _ in env:
            os.environ.pop(k, None)
        lats_ms = np.sort(np.asarray(lats)) * 1e3
        per_chunk = float(np.mean(lats))
        deadline_ms = chunk / 16.0  # 16 kHz -> 100 ms of audio per chunk
        entry = {
            "metric": f"{name}_ms_per_100ms_chunk",
            "value": round(per_chunk * 1e3, 2),
            "unit": "ms",
            "vs_baseline": round(0.1 / per_chunk, 2),
            "x_realtime_per_stream": round(0.1 / per_chunk, 2),
            "p50_ms": round(float(np.percentile(lats_ms, 50)), 2),
            "p95_ms": round(float(np.percentile(lats_ms, 95)), 2),
            "max_ms": round(float(lats_ms[-1]), 2),
            "underruns": int((lats_ms > deadline_ms).sum()),
            "n_chunks": n_chunks,
            "note": pipeline_note,
        }
        if "_kv_" in name:
            # a degraded kernel silently rides the pure-jax ring scan —
            # record whether the fused kernel really served this entry
            entry["pallas"] = not getattr(net, "_pallas_kv_disabled", False)
        results.append(entry)
        print(json.dumps(entry))

    path = write_bench_json("decode", results)
    print(f"# backend={jax.default_backend()} wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
