"""Per-network config views (reference ``views/sample_rnn.py``,
``views/wavenet.py``): curated field selections over the auto factory."""
from __future__ import annotations

from .factory import auto_config_view

__all__ = ["sample_rnn_view", "wavenet_view", "seq2seq_view", "jukebox_view"]


def sample_rnn_view(cfg):
    return auto_config_view(
        cfg,
        title="SampleRNN Config",
        fields=(
            "frame_sizes", "hidden_dim", "rnn_class", "n_rnn", "rnn_dropout",
            "rnn_bias", "h0_init", "weight_norm", "inputs_mode",
        ),
        labels={
            "frame_sizes": "Frame Sizes",
            "hidden_dim": "Hidden Dim",
            "rnn_class": "Type of RNN",
            "n_rnn": "Num of RNN",
            "rnn_dropout": "RNN dropout",
            "rnn_bias": "use bias in RNNs",
            "h0_init": "Hidden initialization",
            "weight_norm": "use weight normalization",
        },
    )


def wavenet_view(cfg):
    return auto_config_view(
        cfg,
        title="WaveNet Config",
        fields=(
            "kernel_sizes", "blocks", "dims_dilated", "dims_1x1",
            "residuals_dim", "apply_residuals", "skips_dim", "groups",
            "act_f", "act_g", "pad_side", "stride", "bias",
            "use_fast_generate", "tie_io_weights",
        ),
        labels={
            "kernel_sizes": "Kernel Sizes",
            "dims_dilated": "Dilated Dims",
            "dims_1x1": "1x1 Dims",
            "skips_dim": "Skips Dim",
        },
    )


def seq2seq_view(cfg):
    return auto_config_view(
        cfg,
        title="Seq2Seq LSTM Config",
        fields=(
            "model_dim", "enc_downsampling", "enc_n_lstm",
            "enc_apply_residuals", "dec_upsampling", "dec_n_lstm",
            "dec_apply_residuals", "hop",
        ),
    )


def jukebox_view(cfg):
    return auto_config_view(
        cfg,
        title="JukeBox Config",
        fields=(
            "frame_sizes", "model_dim", "n_heads", "feedforward_dim",
            "num_layers", "dropout", "rf",
        ),
    )
