"""Segment a file into samples with the multi-resolution Samplifyer
(reference ``demos/samplify.py``)."""


def demo(path="./my-file.wav", sr=22050):
    import mimikit_tpu as mmk

    y = mmk.FileToSignal(sr=sr, duration=None)(path)

    # the more overlap -> the more precise in time
    # the more grad_lag -> the smoother -> fewer attack/decay pairs
    samplifyer = mmk.Samplifyer(
        levels_def=[
            dict(n_fft=2048, overlap=8, grad_max_lag=15),
            dict(n_fft=1024, overlap=8, grad_max_lag=9),
            dict(n_fft=512, overlap=8, grad_max_lag=7),
            dict(n_fft=256, overlap=4, grad_max_lag=7),
        ]
    )
    samplifyer.fit(y)
    try:
        from ..views.segment_selector import segment_selector_view

        return samplifyer, segment_selector_view(samplifyer, sr)
    except ImportError:
        return samplifyer, None
