"""Per-functional config views (reference ``views/functionals.py``)."""
from __future__ import annotations

from .factory import auto_config_view

__all__ = [
    "magspec_view",
    "mulaw_view",
    "stft_view",
    "melspec_view",
    "mfcc_view",
    "chroma_view",
    "autoconvolve_view",
    "f0_filter_view",
    "nearest_neighbor_filter_view",
    "harmonic_source_view",
    "percussive_source_view",
    "pca_view",
    "nmf_view",
    "factor_analysis_view",
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


def chroma_view(cfg):
    return auto_config_view(cfg, title="Chroma", fields=("n_chroma",))


def autoconvolve_view(cfg):
    return auto_config_view(cfg, title="AutoConvolve", fields=("window_size",))


def f0_filter_view(cfg):
    return auto_config_view(
        cfg, title="F0Filter",
        fields=("n_overtone", "n_undertone", "soft", "normalize"),
    )


def nearest_neighbor_filter_view(cfg):
    return auto_config_view(
        cfg, title="NearestNeighborFilter",
        fields=("n_neighbors", "metric", "aggregate"),
    )


def harmonic_source_view(cfg):
    return auto_config_view(
        cfg, title="HarmonicSource", fields=("kernel_size", "power", "margin")
    )


def percussive_source_view(cfg):
    return auto_config_view(
        cfg, title="PercussiveSource", fields=("kernel_size", "power", "margin")
    )


def pca_view(cfg):
    return auto_config_view(cfg, title="PCA", fields=("n_components",))


def nmf_view(cfg):
    return auto_config_view(
        cfg, title="NMF", fields=("n_components", "tol", "max_iter")
    )


def factor_analysis_view(cfg):
    return auto_config_view(
        cfg, title="FactorAnalysis", fields=("n_components", "tol", "max_iter")
    )
