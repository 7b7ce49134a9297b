"""Ensemble generation recipe (reference ``demos/ensemble_generator.py``).

The reference drives the event stream with the external ``pbind`` pattern
library; here the in-repo equivalent (``models/patterns.py``: Pseq/Pbind/
Pwhite/Prand/inf) provides the same random/cycled event scheduling — pass
your own ``stream`` to override.
"""


def demo(root_dir="./", total_seconds=10.0, output_sr=22050, stream=None):
    import mimikit_tpu as mmk

    checkpoints = {}
    for i, path in enumerate(mmk.FileWalker(mmk.CHECKPOINT_REGEX, root_dir)):
        checkpoints[i] = mmk.Checkpoint.from_path(path)
    if not checkpoints:
        raise RuntimeError(f"no checkpoints found under {root_dir}")

    db = checkpoints[0].dataset
    prompt_positions = (0, output_sr // 2, output_sr)
    prompt_length = output_sr

    prompts = next(
        iter(
            db.serve(
                (
                    mmk.Input(
                        data="signal",
                        getter=mmk.AsSlice(shift=0, length=prompt_length),
                    ),
                ),
                shuffle=False,
                batch_size=len(prompt_positions),
                sampler=mmk.IndicesSampler(indices=prompt_positions,
                                           N=len(prompt_positions),
                                           max_i=db.signal.shape[0] - prompt_length),
            )
        )
    )[0]

    if stream is None:
        # the reference demo's pattern, spelled with the in-repo pbind
        # equivalent (demos/ensemble_generator.py:40-56 in the reference)
        keys = sorted(checkpoints)
        binds = [
            mmk.Pbind(
                "generator", checkpoints[keys[0]],
                "seconds", mmk.Pwhite(lo=3.0, hi=5.0, repeats=1, seed=42),
            )
        ]
        if len(keys) > 1:
            binds.append(
                mmk.Pbind(
                    "generator", checkpoints[keys[1]],
                    "temperature", mmk.Pwhite(lo=0.25, hi=1.5, seed=43),
                    "seconds", mmk.Pwhite(lo=0.1, hi=1.0, repeats=1, seed=44),
                )
            )
        stream = mmk.Pseq(binds, mmk.inf).asStream()

    ensemble = mmk.EnsembleGenerator(
        prompts, total_seconds, output_sr, stream, print_events=False
    )
    outputs = ensemble.run()
    logger = mmk.AudioLogger(sr=output_sr)
    logger.display_batch(outputs)
    return outputs
