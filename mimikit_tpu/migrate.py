"""Import trained reference (torch) checkpoints.

The reference stores ``network/state_dict`` h5 banks of torch tensors
(``/root/reference/mimikit/checkpoint.py:64-91``).  This module maps those
parameter names/layouts onto the flax trees used here so a user can carry
trained models across.  Covers SampleRNN and WaveNet; imports are
validated against the actual reference package: WaveNet logits match to
float precision, SampleRNN generates sample-for-sample identically
(``tests/test_migrate.py``).

Seq2SeqLSTM checkpoints deliberately do NOT import: the reference's
"sum forward and backward" is ``y.view(..., H, 2).sum(-1)`` over torch's
``[fwd | bwd]`` CONCATENATED layout (``s2s_lstm_v2.py:100``) — it sums
adjacent feature pairs within a direction, not the two directions.  This
package implements the evident intent (fwd + bwd summed), so weights
trained through the reference's pair-scramble would not transfer
meaningfully.  Frame-domain models retrain in minutes.

The state dict can be given as a plain ``{name: np.ndarray}`` dict — no
torch import is required here (torch must never load next to jax in this
process; convert tensors in a subprocess if needed).
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = [
    "load_reference_state_dict",
    "samplernn_params_from_state_dict",
    "wavenet_params_from_state_dict",
]

_GATES = ("i", "f", "g", "o")  # torch's packed LSTM gate order


def load_reference_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read ``network/state_dict`` out of a reference ``.ckpt`` h5 bank."""
    import h5py

    out: Dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        grp = f["network/state_dict"]

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name.replace("/", ".")] = np.asarray(obj)

        grp.visititems(visit)
    return out


def _set(params, path, value, expect_shape=True):
    node = params
    parts = path.split("/")
    for p in parts[:-1]:
        node = node[p]
    old = node[parts[-1]]
    if expect_shape and tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {path}: have {tuple(old.shape)}, "
            f"importing {tuple(value.shape)}"
        )
    import jax.numpy as jnp

    node[parts[-1]] = jnp.asarray(value, old.dtype)


def samplernn_params_from_state_dict(net, sd: Dict[str, np.ndarray]):
    """Map a reference SampleRNN ``state_dict`` onto ``net``'s param tree.

    Covers: framed-linear tier inputs, the bottom tier's 1-channel conv
    input, torch nn.LSTM stacks (gates unpacked i/f/g/o; the two torch
    biases sum into flax's single hidden bias), linear up-samplers, and
    the MLP output head.  Returns the new params (also set on ``net``).
    """
    import jax

    if net.params is None:
        net.init_params(batch_size=1)

    def to_mutable(d):
        if isinstance(d, dict):
            return {k: to_mutable(v) for k, v in d.items()}
        return d

    params = to_mutable(jax.device_get(net.params))

    used = set()
    # flax LSTMCell keeps ONE bias on the hidden branch where torch has two
    # (bias_ih + bias_hh); stage both here and ASSIGN their sum afterwards —
    # accumulating onto the existing flax bias would silently corrupt a
    # re-import or an import into a non-fresh net
    staged_bias: Dict[str, np.ndarray] = {}

    def take(key):
        used.add(key)
        return np.asarray(sd[key])

    n_tiers = len(net.config.frame_sizes)
    for key in sd:
        m = re.fullmatch(r"tiers\.(\d+)\.input_module\.heads\.(\d+)\.2\.(weight|bias)", key)
        if m:
            i, h, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"tier_inputs_{i}/heads_{h}/core/Dense_0"
            v = take(key)
            _set(params, f"{base}/{'kernel' if kind == 'weight' else 'bias'}",
                 v.T if kind == "weight" else v)
            continue
        m = re.fullmatch(
            r"tiers\.(\d+)\.input_module\.heads\.(\d+)\.2\.2\.cv\.(weight|bias)", key
        )
        if m:
            i, h, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"tier_inputs_{i}/heads_{h}/core/Conv1dResampler_0/Dense_0"
            v = take(key)
            if kind == "weight":
                # torch Conv1d (out, in, k) -> dense on the flattened
                # (k, in) window: kernel[(k*in), out]
                o, c, k = v.shape
                _set(params, f"{base}/kernel",
                     v.transpose(2, 1, 0).reshape(k * c, o))
            else:
                _set(params, f"{base}/bias", v)
            continue
        m = re.fullmatch(r"tiers\.(\d+)\.rnn\.(weight|bias)_(ih|hh)_l(\d+)", key)
        if m:
            i, kind, which, l = (
                int(m.group(1)), m.group(2), m.group(3), int(m.group(4))
            )
            v = take(key)
            chunks = np.split(v, 4, axis=0)
            for g, chunk in zip(_GATES, chunks):
                if kind == "weight":
                    prefix = "i" if which == "ih" else "h"
                    _set(params, f"rnn_t{i}/l{l}/{prefix}{g}/kernel", chunk.T)
                else:
                    path = f"rnn_t{i}/l{l}/h{g}/bias"
                    if path in staged_bias:
                        staged_bias[path] = staged_bias[path] + chunk
                    else:
                        staged_bias[path] = chunk
            continue
        m = re.fullmatch(r"tiers\.(\d+)\.up_sampler\.fc\.(weight|bias)", key)
        if m:
            i, kind = int(m.group(1)), m.group(2)
            v = take(key)
            _set(params, f"up_t{i}/Dense_0/{'kernel' if kind == 'weight' else 'bias'}",
                 v.T if kind == "weight" else v)
            continue
        m = re.fullmatch(
            r"output_modules\.(\d+)\.estimator\.0\.fc\.(\d+)\.(weight|bias)", key
        )
        if m:
            j, fc_idx, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            dense_idx = fc_idx // 2  # torch Sequential interleaves activations
            base = f"outputs_{j}/estimator/core/Dense_{dense_idx}"
            v = take(key)
            _set(params, f"{base}/{'kernel' if kind == 'weight' else 'bias'}",
                 v.T if kind == "weight" else v)
            continue
        if key.endswith("min_temp") or ".h0" in key or ".c0" in key:
            used.add(key)  # static config / lazily-created initial states
            continue

    for path, value in staged_bias.items():
        _set(params, path, value)

    missing = set(sd) - used
    if missing:
        raise ValueError(
            f"unmapped reference parameters: {sorted(missing)[:8]}"
            f"{'...' if len(missing) > 8 else ''}"
        )
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    net.params = params
    return params


def wavenet_params_from_state_dict(net, sd: Dict[str, np.ndarray]):
    """Map a reference WaveNet ``state_dict`` onto ``net``'s param tree.

    Covers embedding and framed-linear inputs, dilated/1x1 gated convs,
    skip/residual 1x1 convs and the MLP head.  Returns the new params
    (also set on ``net``).
    """
    import jax
    import jax.numpy as jnp

    if net.params is None:
        net.init_params(batch_size=1)

    def to_mutable(d):
        if isinstance(d, dict):
            return {k: to_mutable(v) for k, v in d.items()}
        return d

    params = to_mutable(jax.device_get(net.params))
    used = set()

    def conv(v):
        return np.asarray(v).transpose(2, 1, 0)

    for key in sd:
        v = np.asarray(sd[key])
        m = re.fullmatch(r"input_modules\.(\d+)\.(\d+)\.weight", key)
        if m:
            j = int(m.group(1))
            base = params[f"input_modules_{j}"]["core"]
            if "Embed_0" in base:
                _set(params, f"input_modules_{j}/core/Embed_0/embedding", v)
            else:
                _set(params, f"input_modules_{j}/core/Dense_0/kernel", v.T)
            used.add(key)
            continue
        m = re.fullmatch(r"input_modules\.(\d+)\.(\d+)\.bias", key)
        if m:
            j = int(m.group(1))
            _set(params, f"input_modules_{j}/core/Dense_0/bias", v)
            used.add(key)
            continue
        m = re.fullmatch(
            r"layers\.(\d+)\.conv_(dil|1x1)\.(\d+)\.0\.(weight|bias)", key
        )
        if m:
            i, kind, d, what = (
                int(m.group(1)), m.group(2), int(m.group(3)), m.group(4)
            )
            base = f"layer{i}/conv_{kind}{d}"
            _set(params, f"{base}/{'kernel' if what == 'weight' else 'bias'}",
                 conv(v) if what == "weight" else v)
            used.add(key)
            continue
        m = re.fullmatch(r"layers\.(\d+)\.conv_(skip|res)\.(weight|bias)", key)
        if m:
            i, kind, what = int(m.group(1)), m.group(2), m.group(3)
            base = f"layer{i}/conv_{kind}"
            _set(params, f"{base}/{'kernel' if what == 'weight' else 'bias'}",
                 conv(v) if what == "weight" else v)
            used.add(key)
            continue
        m = re.fullmatch(
            r"output_modules\.(\d+)\.estimator\.0\.fc\.(\d+)\.(weight|bias)", key
        )
        if m:
            j, fc_idx, what = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"output_modules_{j}/estimator/core/Dense_{fc_idx // 2}"
            _set(params, f"{base}/{'kernel' if what == 'weight' else 'bias'}",
                 v.T if what == "weight" else v)
            used.add(key)
            continue
        if key.endswith("min_temp"):
            used.add(key)

    missing = set(sd) - used
    if missing:
        raise ValueError(
            f"unmapped reference parameters: {sorted(missing)[:8]}"
            f"{'...' if len(missing) > 8 else ''}"
        )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    net.params = params
    return params
