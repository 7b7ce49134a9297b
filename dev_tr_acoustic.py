"""Transformer acoustic experiment: variants of training-noise / decode temp."""
import json, os, sys, tempfile
import numpy as np

def run(variant, input_dropout, temp, epochs=100, rf=128, num_layers=4):
    from scipy.io import wavfile
    import mimikit_tpu as mmk

    sr, freq = 16000, 440.0
    tmp = tempfile.mkdtemp()
    t = np.arange(sr * 4) / sr
    sig = (0.6 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    wav = os.path.join(tmp, "tone.wav")
    wavfile.write(wav, sr, (sig * 32767).astype(np.int16))
    cfg = mmk.DatasetConfig(sources=(wav,), filename=os.path.join(tmp, "db.h5"),
                            extractors=(mmk.Extractor.signal(sr=sr),))
    db = cfg.create(mode="w")
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(sr=sr, q_levels=256, mlp_dim=128,
                                 input_module_type="embedding"),
        extractor=cfg.extractors[0])
    net = mmk.SimpleTransformer.from_config(mmk.SimpleTransformer.Config(
        io_spec=io, model_dim=128, n_heads=8, feedforward_dim=256,
        num_layers=num_layers, rf=rf, input_dropout=input_dropout))
    train = mmk.TrainARMConfig(
        root_dir=os.path.join(tmp, "trainings"), batch_size=16,
        batch_length=512, max_epochs=epochs, max_lr=2e-3, every_n_epochs=1000,
        MONITOR_TRAINING=False, OUTPUT_TRAINING="", CHECKPOINT_TRAINING=False)
    loop = mmk.TrainARMLoop.from_config(train, db, net)
    loop.run()
    loss = loop.metrics.averages().get("loss", float("nan"))
    train_sig = np.asarray(cfg.get(mode="r").signal[: sr // 4])
    prompts = (mmk.MuLawCompress(256)(train_sig)[None, :].astype(np.int32),)
    out = net.generate(prompts, n_steps=sr, temperature=temp)
    audio = np.asarray(mmk.MuLawExpand(256)(np.asarray(out[0][0, sr // 4:])))
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    freqs = np.fft.rfftfreq(len(audio), 1 / sr)
    spec[0] = 0.0
    dom = float(freqs[spec.argmax()])
    print(f"{variant}: loss={loss:.3f} dominant={dom:.1f}Hz ok={abs(dom-freq)<25}",
          flush=True)
    return dom

if __name__ == "__main__":
    which = sys.argv[1]
    if which == "baseline":
        run("baseline temp=0.35", 0.0, 0.35)
    elif which == "greedy":
        run("id=0 greedy", 0.0, None)
    elif which == "drop":
        run("id=0.2 temp=0.35", 0.2, 0.35)
    elif which == "dropgreedy":
        run("id=0.2 greedy", 0.2, None)
