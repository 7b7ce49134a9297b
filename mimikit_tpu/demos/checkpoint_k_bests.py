"""Generate many outputs from a checkpoint and rank them by the cumulative
entropy of their nearest-neighbor sequence
(reference ``demos/checkpoint_k_bests.py``)."""


def demo(
    root_dir="./",
    ckpt_id=None,
    epoch=1,
    n_trials=500,
    k_bests=10,
    output_duration_sec=30.0,
    prompts_position_sec=(1.1, 8.5, 46.3),
    batch_size=32,
):
    import numpy as np

    import mimikit_tpu as mmk

    if ckpt_id is None:
        path = next(iter(mmk.FileWalker(mmk.CHECKPOINT_REGEX, root_dir)), None)
        if path is None:
            raise RuntimeError(f"no checkpoint found under {root_dir}")
        ckpt = mmk.Checkpoint.from_path(path)
    else:
        ckpt = mmk.Checkpoint(root_dir=root_dir, id=ckpt_id, epoch=epoch)

    dataset, network = ckpt.dataset, ckpt.network
    S = network.config.io_spec.inputs[0].transform(np.asarray(dataset.signal[:]))

    loop = mmk.GenerateLoopV2.from_config(
        mmk.GenerateLoopV2.Config(
            output_duration_sec=output_duration_sec,
            prompts_length_sec=1.0,
            prompts_position_sec=tuple(prompts_position_sec),
            batch_size=batch_size,
            display_waveform=False,
            yield_inversed_outputs=True,
        ),
        dataset,
        network,
    )
    saved = {}
    n_done = 0
    for outputs in loop.run():
        outs = np.asarray(outputs[0])
        for out in outs:
            _, nn = mmk.nearest_neighbor(out[:, None] if out.ndim == 1 else out, S[:, None] if S.ndim == 1 else S)
            hx = float(mmk.cum_entropy(nn, neg_diff=False))
            saved[hx] = out
            n_done += 1
        if n_done >= n_trials:
            break
    bests = [saved[k] for k in sorted(saved, reverse=True)[:k_bests]]
    return bests
