"""Waveform point picker (reference ``views/timestamps_selector.py``).

peaksjs_widget is optional.  Without it the selector is still fully
interactive using only ipywidgets + matplotlib (both in-image): the
waveform renders to a PNG with the cursor and picked points drawn on it,
a slider scrubs the cursor, and Add/Undo buttons manage the point list.
Headless (no ipywidgets at all) the programmatic API (``add_point`` /
``points``) keeps working.
"""
from __future__ import annotations

import io as _io
from typing import List

import numpy as np

__all__ = ["TimeStampsSelector"]


class TimeStampsSelector:
    def __init__(self, array: np.ndarray, sr: int):
        self.array = np.asarray(array)
        self.sr = sr
        self._points: List[float] = []
        self._cursor = 0.0
        self.widget = self._build()

    @property
    def duration(self) -> float:
        return self.array.shape[-1] / self.sr

    def _render_png(self) -> bytes:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = np.arange(self.array.shape[-1]) / self.sr
        fig, ax = plt.subplots(figsize=(12, 2.2), dpi=80)
        ax.plot(t, self.array, linewidth=0.5)
        ax.axvline(self._cursor, color="tab:red", linewidth=1.2)
        for p in self._points:
            ax.axvline(p, color="tab:green", linewidth=1.0, alpha=0.7)
        ax.set_xlim(0, max(self.duration, 1e-6))
        ax.set_yticks([])
        ax.set_xlabel("seconds")
        fig.tight_layout()
        buf = _io.BytesIO()
        fig.savefig(buf, format="png")
        plt.close(fig)
        return buf.getvalue()

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
        except ImportError:
            return None

        img = W.Image(value=self._render_png(), format="png")
        slider = W.FloatSlider(
            value=0.0,
            min=0.0,
            max=max(self.duration, 1e-6),
            step=1.0 / self.sr * 64,
            description="cursor (s)",
            continuous_update=False,
            readout_format=".3f",
            layout=W.Layout(width="60%"),
        )
        add = W.Button(description="add point", button_style="success")
        undo = W.Button(description="undo", button_style="warning")
        label = W.HTML()

        def refresh():
            img.value = self._render_png()
            label.value = "points: " + ", ".join(
                f"{p:.3f}s" for p in sorted(self._points)
            )

        def on_slide(change):
            self._cursor = float(change["new"])
            refresh()

        def on_add(_):
            self.add_point(self._cursor)
            refresh()

        def on_undo(_):
            if self._points:
                self._points.pop()
            refresh()

        slider.observe(on_slide, names="value")
        add.on_click(on_add)
        undo.on_click(on_undo)
        self._refresh = refresh
        refresh()
        return W.VBox([img, W.HBox([slider, add, undo]), label])

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
