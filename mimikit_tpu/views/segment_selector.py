"""Score-threshold filtering of Samplifyer cuts
(reference ``views/segment_selector.py``)."""
from __future__ import annotations

import threading
from typing import Callable

import numpy as np

from ..extract.samplify import Samplifyer

__all__ = ["debounce", "segment_selector_view", "filter_cuts"]


def debounce(wait: float):
    """Postpone a function's execution until `wait` seconds passed since the
    last invocation (reference ``segment_selector.py:29-50``)."""

    def decorator(fn: Callable):
        timer = [None]

        def debounced(*args, **kwargs):
            def call_it():
                timer[0] = None
                fn(*args, **kwargs)

            if timer[0] is not None:
                timer[0].cancel()
            timer[0] = threading.Timer(wait, call_it)
            timer[0].start()

        return debounced

    return decorator


def filter_cuts(samplifyer: Samplifyer, threshold: float) -> np.ndarray:
    """cuts whose attack score exceeds the threshold"""
    mask = samplifyer.scores >= threshold
    return samplifyer.cuts[mask]


def segment_selector_view(samplifyer: Samplifyer, sr: int = 44100):
    from ..ui.config_view import require_ipywidgets

    require_ipywidgets()
    from ipywidgets import widgets as W

    threshold_w = W.FloatSlider(
        value=float(np.min(samplifyer.scores)) if len(samplifyer.scores) else 0.0,
        min=float(np.min(samplifyer.scores)) if len(samplifyer.scores) else 0.0,
        max=float(np.max(samplifyer.scores)) if len(samplifyer.scores) else 1.0,
        step=0.001,
        description="min score",
    )
    count = W.Label(value=f"{len(samplifyer.cuts)} segments")
    out = W.Output()

    @debounce(0.25)
    def update(ev):
        kept = filter_cuts(samplifyer, threshold_w.value)
        count.value = f"{len(kept)} segments"

    threshold_w.observe(update, "value")
    return W.VBox(children=(threshold_w, count, out))
