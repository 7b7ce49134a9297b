"""Training config view (reference ``views/train_arm.py``)."""
from __future__ import annotations

from .factory import auto_config_view

__all__ = ["train_arm_view"]


def train_arm_view(cfg):
    return auto_config_view(
        cfg,
        title="Training Config",
        fields=(
            "root_dir", "batch_size", "batch_length", "downsampling",
            "oversampling", "tbptt_chunk_length", "max_epochs",
            "limit_train_batches", "max_lr", "betas", "div_factor",
            "final_div_factor", "pct_start", "CHECKPOINT_TRAINING",
            "MONITOR_TRAINING", "every_n_epochs", "n_examples",
            "prompt_length_sec", "outputs_duration_sec", "temperature",
        ),
        labels={
            "root_dir": "Directory",
            "batch_size": "Batch Size",
            "batch_length": "Batch Length",
            "downsampling": "Batches downsampling",
            "oversampling": "Batch oversampling",
            "tbptt_chunk_length": "TBPTT length",
            "max_epochs": "Number of Epochs",
            "max_lr": "Learning Rate",
            "CHECKPOINT_TRAINING": "Save Checkpoints",
            "MONITOR_TRAINING": "Monitor Audio Outputs",
            "every_n_epochs": "Every n Epochs",
            "n_examples": "Number of Examples",
            "prompt_length_sec": "Prompt Length (sec)",
            "outputs_duration_sec": "Output Duration (sec)",
        },
    )
