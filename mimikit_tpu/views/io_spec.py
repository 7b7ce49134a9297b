"""IOSpec factory views (reference ``views/io_spec.py``)."""
from __future__ import annotations

from .factory import auto_config_view

__all__ = ["mulaw_io_view", "magspec_io_view"]


def mulaw_io_view(cfg):
    return auto_config_view(
        cfg,
        title="MuLaw IO",
        fields=(
            "sr", "q_levels", "compression", "input_module_type",
            "mlp_dim", "n_mlp_layers", "min_temperature",
        ),
        labels={
            "sr": "Sample Rate",
            "q_levels": "Quantization Levels",
            "mlp_dim": "MLP Dim",
        },
    )


def magspec_io_view(cfg):
    return auto_config_view(
        cfg,
        title="MagSpec IO",
        fields=("sr", "n_fft", "hop_length", "activation"),
        labels={"sr": "Sample Rate", "n_fft": "N FFT", "hop_length": "Hop Length"},
    )
