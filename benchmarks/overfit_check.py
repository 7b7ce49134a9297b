"""End-to-end quality smoke: overfit SampleRNN on a pure tone on the TPU and
verify the generated audio reproduces the tone's dominant frequency.

This is the full production path — extraction, device batching, jitted
training, scan decoding, mu-law inversion — with a falsifiable acoustic
outcome.
"""
import json
import os
import sys
import tempfile

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scipy.io import wavfile

    import mimikit_tpu as mmk

    sr, freq = 16000, 440.0
    tmp = tempfile.mkdtemp()
    t = np.arange(sr * 4) / sr
    sig = (0.6 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    wav = os.path.join(tmp, "tone.wav")
    wavfile.write(wav, sr, (sig * 32767).astype(np.int16))

    cfg = mmk.DatasetConfig(
        sources=(wav,), filename=os.path.join(tmp, "db.h5"),
        extractors=(mmk.Extractor.signal(sr=sr),),
    )
    db = cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(sr=sr, q_levels=256, mlp_dim=128),
        extractor=cfg.extractors[0],
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(16, 8, 8), hidden_dim=128, io_spec=io)
    )
    train = mmk.TrainARMConfig(
        root_dir=os.path.join(tmp, "trainings"),
        batch_size=16,
        batch_length=1024,
        tbptt_chunk_length=sr,
        max_epochs=6,
        max_lr=2e-3,
        every_n_epochs=100,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        CHECKPOINT_TRAINING=False,
        trainer_kwargs={"device_batching": True},
    )
    loop = mmk.TrainARMLoop.from_config(train, db, net)
    loop.run()
    final_loss = loop.metrics.averages().get("loss", float("nan"))

    prompts = (
        mmk.MuLawCompress(256)(sig[: sr // 4])[None, :].astype(np.int32),
    )
    out = net.generate(prompts, n_steps=sr, temperature=0.7)
    audio = np.asarray(mmk.MuLawExpand(256)(np.asarray(out[0][0, sr // 4 :])))

    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    freqs = np.fft.rfftfreq(len(audio), 1 / sr)
    dominant = float(freqs[spec.argmax()])
    ok = abs(dominant - freq) < 25.0
    print(
        json.dumps(
            {
                "metric": "overfit_tone_dominant_freq_hz",
                "value": round(dominant, 1),
                "unit": "Hz",
                "vs_baseline": round(dominant / freq, 3),
            }
        )
    )
    print(
        f"# final_loss={final_loss:.3f} target={freq}Hz ok={ok}",
        file=sys.stderr,
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
