"""Chunked long-form generation (reference ``loops/generate_chunks.py``):
loop fixed-length generations, feeding the tail back as the next prompt,
storing tracks in an h5 file, with a temperature random walk."""
from __future__ import annotations

import numpy as np

__all__ = ["generate_chunks", "main"]


def generate_chunks(
    checkpoint,
    out_filename: str = "chunked_outputs.h5",
    batch_size: int = 64,
    n_chunks: int = 10,
    chunk_seconds: float = 30.0,
    prompt_seconds: float = 5.0,
    temp_lo: float = 0.85,
    temp_hi: float = 0.999,
    positions=None,
    seed: int = 0,
):
    """Generate ``n_chunks`` x ``chunk_seconds`` continuations per stream."""
    import h5py

    import mimikit_tpu as mmk

    rng = np.random.RandomState(seed)
    dataset, network = checkpoint.dataset, checkpoint.network
    feature = checkpoint.network_config.io_spec.targets[0]
    sr = feature.sr
    prompt_len = int(sr * prompt_seconds)

    if positions is None:
        max_i = dataset.signal.shape[0] - prompt_len
        positions = rng.randint(0, max_i, size=batch_size)
    temperature = rng.uniform(temp_lo, temp_hi, size=batch_size)

    config = mmk.GenerateLoopV2.Config(
        output_duration_sec=chunk_seconds,
        prompts_length_sec=prompt_seconds,
        prompts_position_sec=tuple(float(p) / sr for p in positions),
        batch_size=batch_size,
        downsampling=getattr(checkpoint.training_config, "downsampling", 1),
        display_waveform=False,
        yield_inversed_outputs=False,
        parameters=dict(temperature=temperature),
    )
    seed_batch = next(
        iter(mmk.GenerateLoopV2.get_dataloader(config, dataset, network))
    )
    tracks = np.asarray(seed_batch[1])

    with h5py.File(out_filename, "w") as f:
        f.create_dataset("0", data=tracks)
        for i in range(1, n_chunks):
            prompts = tracks[:, -prompt_len:]
            # temperature random walk, clipped to the working range
            temperature = np.clip(
                temperature + rng.randn(batch_size) * 0.1, temp_lo, temp_hi
            )
            config.parameters["temperature"] = temperature
            loop = mmk.GenerateLoopV2(
                config,
                network,
                int(sr * chunk_seconds),
                [[np.ones(1), prompts]],
            )
            for output in loop.run():
                new = np.asarray(output[0])[:, prompt_len:]
                tracks = np.concatenate([tracks, new], axis=1)
                f.create_dataset(str(i), data=new)
                break
            f.flush()
    return tracks


def main():
    """Script-style entry mirroring the reference's usage."""
    import mimikit_tpu as mmk

    ckpt = mmk.Checkpoint(root_dir="./trainings", id="srnn_1min_chunk", epoch=20)
    tracks = generate_chunks(ckpt)
    feature = ckpt.network_config.io_spec.targets[0]
    logger = mmk.AudioLogger(sr=feature.sr)
    for i, track in enumerate(tracks):
        logger.display(feature.inv(track))
