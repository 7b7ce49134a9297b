"""Metrics accumulation + audio output logging.

Rebuild of ``/root/reference/mimikit/loops/logger.py``: epoch-averaged metric
printing with a hard NaN/inf guard, an h5 loss logger, and an
``AudioLogger`` writing waveforms (wav native; mp3/m4a via ffmpeg when
available) and displaying them in notebooks.
"""
from __future__ import annotations

import dataclasses as dtc
import os
from time import gmtime, time
from typing import Optional

import numpy as np

from ..features.audio_io import write_audio

__all__ = ["EpochMetrics", "LoggingHooks", "LossLogger", "AudioLogger"]


class EpochMetrics:
    """Accumulates per-batch metric dicts, prints epoch averages, raises on
    NaN/inf loss (reference ``LoggingHooks``, ``logger.py:25-90``)."""

    def __init__(self, print_fn=print):
        self.print = print_fn
        self._metrics = {}
        self._counts = {}
        self._fit_start = None

    def on_epoch_start(self):
        self._metrics = {}
        self._counts = {}

    def check_loss(self, loss_value: float):
        if not np.isfinite(loss_value):
            raise RuntimeError(f"loss is {loss_value}")

    def log_output(self, out: dict):
        for metric, val in out.items():
            v = float(val)
            self._metrics[metric] = self._metrics.get(metric, 0.0) + v
            self._counts[metric] = self._counts.get(metric, 0) + 1
        return out

    def averages(self) -> dict:
        return {
            k: v / self._counts[k] for k, v in self._metrics.items()
        }

    def flush_epoch(self, epoch: int, logger: Optional["LossLogger"] = None):
        to_print = "Epoch %i " % epoch
        avgs = self.averages()
        for k, v in avgs.items():
            to_print += "- %s : %.4f " % (k, v)
        self.print(to_print)
        if logger is not None:
            logger.log_metrics(avgs, epoch)
        return avgs

    def on_fit_start(self):
        self._fit_start = time()

    def on_fit_end(self):
        duration = time() - (self._fit_start or time())
        t = gmtime(duration)
        self.print(
            "Training finished after "
            f"{t[2] - 1} days {t[3]} hours {t[4]} mins {t[5]} seconds"
        )
        return duration


class LossLogger:
    """Appends metric rows to an h5 file, guarded to process 0."""

    def __init__(self, logs_file: str):
        self.logs_file = logs_file

    @property
    def _is_writer(self) -> bool:
        try:
            import jax

            return jax.process_index() == 0
        except Exception:
            return True

    def log_metrics(self, metrics: dict, step: int):
        if not self._is_writer:
            return
        import h5py

        os.makedirs(os.path.dirname(os.path.abspath(self.logs_file)), exist_ok=True)
        with h5py.File(self.logs_file, "a") as f:
            g = f.require_group(str(step))
            for k, v in metrics.items():
                if k in g:
                    del g[k]
                g.create_dataset(k, data=np.asarray([v]))


@dtc.dataclass
class AudioLogger:
    sr: int = 16000
    file_template: Optional[str] = None
    title_template: Optional[str] = None

    figsize = (30, 4)

    @staticmethod
    def format_template(template: str, **parameters) -> str:
        return template.format(**parameters)

    @staticmethod
    def to_numpy(audio) -> np.ndarray:
        audio = np.asarray(audio).squeeze()
        if audio.ndim > 1:
            raise ValueError(
                f"Expected `audio` array to have a single dimension, got {audio.ndim}."
            )
        return audio.astype(np.float32)

    def write(self, audio, **template_params) -> str:
        audio = self.to_numpy(audio)
        filename = self.format_template(self.file_template, **template_params)
        return write_audio(filename, audio, self.sr)

    def display(self, audio, **template_params):
        self.display_waveform(audio, **template_params)
        self.display_html(audio, **template_params)

    def display_batch(self, audio, **template_params):
        for y in audio:
            self.display(y, **template_params)

    def display_waveform(self, audio, **template_params):
        try:
            from matplotlib import pyplot as plt
        except ImportError:
            return
        audio = self.to_numpy(audio)
        plt.figure(figsize=self.figsize)
        plt.plot(audio)
        if template_params and self.title_template:
            plt.title(self.format_template(self.title_template, **template_params))
        plt.show(block=False)
        plt.close()

    def display_html(self, audio, **template_params):
        try:
            import IPython.display as ipd
        except ImportError:
            return
        audio = self.to_numpy(audio)
        try:
            ipd.display(ipd.Audio(audio, rate=self.sr))
        except Exception:
            pass


# API-compat alias: the reference's epoch-metric mixin name
LoggingHooks = EpochMetrics
