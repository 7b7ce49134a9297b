"""Serving recipe (TPU-native addition — the reference has no serving
story): train briefly, then stream unbounded audio in bounded-latency
chunks, and fan a stream batch out across every available chip.

Two APIs this demo exercises:

* ``mmk.stream_audio(net, prompts, chunk_steps)`` — an infinite generator
  of audio chunks; SampleRNN streams through the state-carrying fused
  kernel (the concatenated stream is token-identical to one long decode),
  window-determined nets re-feed their decoder's window (also exact).
* ``mmk.parallel.sharded_generate(net, prompts, n_steps, devices=...)`` —
  batch-of-streams decoding sharded across devices (params replicated,
  async per-slice dispatches, zero collectives).
"""


def demo(sources=None, sample_rate=16000, db_path="train-serving.h5",
         n_chunks=10, chunk_seconds=0.1, **overrides):
    import os

    import numpy as np

    import mimikit_tpu as mmk

    if sources is None:
        sources = tuple(mmk.FileWalker(mmk.SOUND_FILE_REGEX, "./"))
    if os.path.exists(db_path):
        os.remove(db_path)

    signal = mmk.Extractor.signal(sr=sample_rate)
    ds = mmk.DatasetConfig(
        sources=sources, filename=db_path, extractors=(signal,)
    )
    ds.create(mode="w")
    dataset = ds.get(mode="r")

    io = mmk.IOSpec.mulaw_io(
        extractor=signal,
        config=mmk.IOSpec.MuLawIOConfig(sr=sample_rate, mlp_dim=128),
    )
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(
            frame_sizes=(16, 8, 8), hidden_dim=128, io_spec=io
        )
    )
    train = dict(
        batch_size=16,
        batch_length=1024,
        tbptt_chunk_length=sample_rate,
        max_epochs=4,
        max_lr=2e-3,
        every_n_epochs=100,
        MONITOR_TRAINING=False,
        OUTPUT_TRAINING="",
        CHECKPOINT_TRAINING=False,
        root_dir="trainings-serving",
    )
    train.update(
        {k: v for k, v in overrides.items() if k in mmk.TrainARMConfig.__dataclass_fields__}
    )
    loop = mmk.TrainARMLoop.from_config(
        mmk.TrainARMConfig(**train), dataset, net
    )
    loop.run()

    # --- unbounded low-latency streaming -----------------------------------
    prompt = np.asarray(dataset.signal[: sample_rate // 4])
    tokens = mmk.MuLawCompress(io.inputs[0].elem_type.size)(prompt)
    chunk_steps = int(chunk_seconds * sample_rate)
    stream = mmk.stream_audio(net, (tokens[None, :].astype(np.int32),),
                              chunk_steps, temperature=0.7)
    chunks = [next(stream) for _ in range(n_chunks)]
    audio = np.concatenate([np.asarray(c[0]) for c in chunks])
    print(f"streamed {len(chunks)} chunks = {len(audio) / sample_rate:.2f} s "
          f"of audio at {chunk_seconds * 1e3:.0f} ms/chunk granularity")

    # --- batch-of-streams sharded across every chip ------------------------
    import jax

    devices = jax.devices()
    B = max(len(devices), 2) * 2
    prompts = (np.tile(tokens[None, :], (B, 1)).astype(np.int32),)
    outs = mmk.parallel.sharded_generate(
        net, prompts, chunk_steps, temperature=0.7, devices=devices
    )
    print(f"decoded {B} streams across {len(devices)} device(s): "
          f"{outs[0].shape}")
    return audio, outs
