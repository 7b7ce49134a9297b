"""Per-functional config views (reference ``views/functionals.py``)."""
from __future__ import annotations

from .factory import auto_config_view

__all__ = [
    "magspec_view",
    "mulaw_view",
    "stft_view",
    "melspec_view",
    "mfcc_view",
    "functional_view",
]


def functional_view(func, title=None):
    """Generic view over any Functional's fields."""
    return auto_config_view(func, title=title or type(func).__name__)


def stft_view(cfg):
    return auto_config_view(
        cfg, title="STFT",
        fields=("n_fft", "hop_length", "coordinate", "center", "window"),
        labels={"n_fft": "N FFT", "hop_length": "Hop Length"},
    )


def magspec_view(cfg):
    return auto_config_view(
        cfg, title="MagSpec",
        fields=("n_fft", "hop_length", "center", "window"),
        labels={"n_fft": "N FFT", "hop_length": "Hop Length"},
    )


def mulaw_view(cfg):
    return auto_config_view(
        cfg, title="MuLaw",
        fields=("q_levels", "compression"),
        labels={"q_levels": "Quantization Levels"},
    )


def melspec_view(cfg):
    return auto_config_view(cfg, title="MelSpec", fields=("n_mels", "fmin", "fmax"))


def mfcc_view(cfg):
    return auto_config_view(cfg, title="MFCC", fields=("n_mfcc", "dct_type", "lifter"))
