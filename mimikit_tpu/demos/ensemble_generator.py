"""Ensemble generation recipe (reference ``demos/ensemble_generator.py``).

The reference drives the event stream with the ``pbind`` pattern library;
here a plain generator stands in (same event dicts) so the demo has no extra
dependency — pass your own ``stream`` for pattern-based scheduling.
"""


def demo(root_dir="./", total_seconds=10.0, output_sr=22050, stream=None):
    import numpy as np

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
        rng = np.random.RandomState(42)

        def _stream():
            keys = sorted(checkpoints)
            while True:
                yield dict(
                    generator=checkpoints[keys[0]],
                    seconds=float(rng.uniform(3.0, 5.0)),
                )
                if len(keys) > 1:
                    yield dict(
                        generator=checkpoints[keys[1]],
                        seconds=float(rng.uniform(0.1, 1.0)),
                        temperature=float(rng.uniform(0.25, 1.5)),
                    )

        stream = _stream()

    ensemble = mmk.EnsembleGenerator(
        prompts, total_seconds, output_sr, stream, print_events=False
    )
    outputs = ensemble.run()
    logger = mmk.AudioLogger(sr=output_sr)
    logger.display_batch(outputs)
    return outputs
