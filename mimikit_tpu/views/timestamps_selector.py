"""Waveform point picker (reference ``views/timestamps_selector.py``).

peaksjs_widget is optional; without it the selector exposes a programmatic
API (``add_point``/``points``) and a matplotlib preview.
"""
from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["TimeStampsSelector"]


class TimeStampsSelector:
    def __init__(self, array: np.ndarray, sr: int):
        self.array = np.asarray(array)
        self.sr = sr
        self._points: List[float] = []
        self.widget = self._build()

    def _build(self):
        try:
            from peaksjs_widget import PeaksJSWidget

            w = PeaksJSWidget(
                array=self.array, sr=self.sr, id_count=0, with_play_button=True
            )
            self._peaks = w
            return w
        except ImportError:
            self._peaks = None
        try:
            from ipywidgets import widgets as W

            out = W.Output()
            with out:
                import matplotlib.pyplot as plt

                plt.figure(figsize=(20, 2))
                plt.plot(self.array)
                plt.show()
            return out
        except ImportError:
            return None

    def add_point(self, seconds: float):
        self._points.append(float(seconds))
        return self

    @property
    def points(self) -> List[float]:
        if self._peaks is not None:
            return sorted(p["time"] for p in getattr(self._peaks, "points", []))
        return sorted(self._points)

    @property
    def positions_sec(self):
        return tuple(self.points)
