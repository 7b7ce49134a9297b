"""Import trained reference (torch) checkpoints.

The reference stores ``network/state_dict`` h5 banks of torch tensors
(``/root/reference/mimikit/checkpoint.py:64-91``).  This module maps those
parameter names/layouts onto the flax trees used here so a user can carry
trained models across.  Covers the full zoo — SampleRNN, WaveNet,
SimpleTransformer, JukeBox, Seq2SeqLSTM — each validated against the
actual reference package: logits match to float precision, SampleRNN
generates sample-for-sample identically (``tests/test_migrate.py``).

Two reference quirks are part of its trained functions and are reproduced
behind ``ref_compat`` config flags on the receiving nets: the seq2seq
bidirectional "sum" actually sums adjacent feature pairs of torch's
concatenated ``[fwd | bwd]`` output (``s2s_lstm_v2.py:100``), and the
JukeBox bottom tier's Conv1dResampler permutes time/features through a
bad reshape (``resamplers.py:40-42``) while its decoder layers silently
run ReLU instead of the configured Mish (a torch deepcopy/__setstate__
artifact).  Without the flags the nets implement the evident intent and
the reference weights would not transfer meaningfully.

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
    "transformer_params_from_state_dict",
    "seq2seq_params_from_state_dict",
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


# -- transformers (SimpleTransformer + JukeBox) ------------------------------

def _wn_effective(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch ``_weight_norm(v, g, dim=0)``: per-output-slice direction times
    magnitude.  For 1-D params (the reference weight-norms biases too) the
    per-slice norm degenerates to |v|."""
    axes = tuple(range(1, v.ndim))
    norms = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.reshape(norms.shape) * v / np.maximum(norms, 1e-24)).astype(
        v.dtype
    )


def _resolve_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold every ``X_g``/``X_v`` torch weight-norm pair into the effective
    plain tensor ``X`` (reference wraps input/up-sampler/output modules,
    ``transformers.py:222-231,349-354``)."""
    out: Dict[str, np.ndarray] = {}
    for key in sd:
        if key.endswith("_g"):
            continue
        if key.endswith("_v"):
            base = key[:-2]
            out[base] = _wn_effective(
                np.asarray(sd[base + "_g"]), np.asarray(sd[key])
            )
        else:
            out[key] = np.asarray(sd[key])
    return out


def _recompute_wn_scales(params) -> None:
    """After importing effective kernels, reset every flax ``WeightNorm``
    scale to the wrapped kernel's per-feature norm so
    ``scale * kernel/||kernel|| == kernel`` (the imported effective
    weight).  Mutates the nested-dict tree in place."""
    if not isinstance(params, dict):
        return
    for key, val in params.items():
        if key.startswith("WeightNorm_") and isinstance(val, dict):
            for scale_key in val:
                # e.g. "Dense_0/kernel/scale" — the wrapped layer is a
                # sibling of the WeightNorm collection
                parts = scale_key.split("/")
                layer, param = parts[0], parts[1]
                kernel = np.asarray(params[layer][param])
                axes = tuple(range(kernel.ndim - 1))
                val[scale_key] = np.sqrt(
                    np.sum(kernel.astype(np.float64) ** 2, axis=axes)
                ).astype(kernel.dtype)
        else:
            _recompute_wn_scales(val)


def _attn_qkv(params, base: str, W: np.ndarray, b: np.ndarray, n_heads: int):
    """torch packed in_proj (3d, d)/(3d,) -> flax query/key/value trees."""
    d = W.shape[1]
    hd = d // n_heads
    for name, Wp, bp in zip(
        ("query", "key", "value"), np.split(W, 3, axis=0), np.split(b, 3)
    ):
        _set(params, f"{base}/{name}/kernel", Wp.T.reshape(d, n_heads, hd))
        _set(params, f"{base}/{name}/bias", bp.reshape(n_heads, hd))


def _map_decoder_layer(params, flax_base: str, rest: str, v: np.ndarray,
                       n_heads: int, staged_qkv: dict) -> bool:
    """Map one ``model.layers.{i}.<rest>`` tensor into ``flax_base`` (a
    ``block{i}`` path).  in_proj weight/bias arrive separately so they are
    staged and flushed together by the caller."""
    attn_name = {"self_attn": "self_attn", "multihead_attn": "cross_attn"}
    m = re.fullmatch(r"(self_attn|multihead_attn)\.in_proj_(weight|bias)", rest)
    if m:
        tgt = f"{flax_base}/{attn_name[m.group(1)]}"
        staged_qkv.setdefault(tgt, {})[m.group(2)] = v
        st = staged_qkv[tgt]
        if "weight" in st and "bias" in st:
            _attn_qkv(params, tgt, st["weight"], st["bias"], n_heads)
            del staged_qkv[tgt]
        return True
    m = re.fullmatch(r"(self_attn|multihead_attn)\.out_proj\.(weight|bias)", rest)
    if m:
        tgt = f"{flax_base}/{attn_name[m.group(1)]}/out"
        if m.group(2) == "weight":
            d = v.shape[0]
            _set(params, f"{tgt}/kernel",
                 v.T.reshape(n_heads, d // n_heads, d))
        else:
            _set(params, f"{tgt}/bias", v)
        return True
    m = re.fullmatch(r"linear([12])\.(weight|bias)", rest)
    if m:
        dense = f"Dense_{int(m.group(1)) - 1}"
        _set(params, f"{flax_base}/{dense}/{'kernel' if m.group(2) == 'weight' else 'bias'}",
             v.T if m.group(2) == "weight" else v)
        return True
    m = re.fullmatch(r"norm([123])\.(weight|bias)", rest)
    if m:
        _set(params, f"{flax_base}/ln{m.group(1)}/{'scale' if m.group(2) == 'weight' else 'bias'}",
             v)
        return True
    return False


def _map_input_head(params, flax_head: str, sub: str, v: np.ndarray) -> bool:
    """Map one reference input-module head tensor.  ``sub`` is the part
    after ``heads.{h}.``, e.g. ``2.weight`` (FramedLinearIO), ``0.weight``
    (EmbeddingIO), ``2.2.cv.weight`` (FramedConv1dIO) or ``1.0.weight`` /
    ``1.1.cv.weight`` (EmbeddingConv1d)."""
    node = params
    for p in flax_head.split("/"):
        node = node[p]
    core = node["core"]
    m = re.fullmatch(r"\d+\.(weight|bias)", sub)
    if m:
        kind = m.group(1)
        if "Embed_0" in core and kind == "weight":
            _set(params, f"{flax_head}/core/Embed_0/embedding", v)
        else:
            _set(params, f"{flax_head}/core/Dense_0/{'kernel' if kind == 'weight' else 'bias'}",
                 v.T if kind == "weight" else v)
        return True
    m = re.fullmatch(r"\d+\.0\.weight", sub)
    if m:  # EmbeddingConv1d's embedding table
        _set(params, f"{flax_head}/core/Embed_0/embedding", v)
        return True
    m = re.fullmatch(r"\d+\.(?:\d+\.)?cv\.(weight|bias)", sub) or re.fullmatch(
        r"\d+\.\d+\.cv\.(weight|bias)", sub
    )
    if m:
        kind = m.group(1)
        base = f"{flax_head}/core/Conv1dResampler_0/Dense_0"
        if kind == "weight":
            o, c, k = v.shape
            # torch Conv1d (out, in, k) -> dense on the flattened (k, in)
            # window (time outer, channel inner)
            _set(params, f"{base}/kernel", v.transpose(2, 1, 0).reshape(k * c, o))
        else:
            _set(params, f"{base}/bias", v)
        return True
    return False


def transformer_params_from_state_dict(net, sd: Dict[str, np.ndarray]):
    """Map a reference SimpleTransformer or JukeBox ``state_dict`` onto
    ``net``'s param tree.

    Covers torch's packed q/k/v ``in_proj`` attention layout
    (``/root/reference/mimikit/networks/transformers.py:70-178`` via
    ``nn.TransformerDecoderLayer``), the JukeBox tier hierarchy with
    up-samplers (``:181-427``), and the reference's weight-norm
    parametrization (``_g``/``_v`` pairs folded into effective tensors,
    flax ``WeightNorm`` scales recomputed to reproduce them exactly).
    Returns the new params (also set on ``net``).
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
    sd = _resolve_weight_norm(sd)
    n_heads = int(net.config.n_heads)
    used = set()
    staged_qkv: dict = {}

    for key in sd:
        v = sd[key]
        # SimpleTransformer namespace
        m = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", key)
        if m and _map_decoder_layer(
            params, f"model/block{m.group(1)}", m.group(2), v, n_heads,
            staged_qkv,
        ):
            used.add(key)
            continue
        m = re.fullmatch(r"model\.norm\.(weight|bias)", key)
        if m:
            _set(params, f"model/final_ln/{'scale' if m.group(1) == 'weight' else 'bias'}", v)
            used.add(key)
            continue
        m = re.fullmatch(r"input_module\.heads\.(\d+)\.(.+)", key)
        if m and _map_input_head(
            params, f"input_heads_{m.group(1)}", m.group(2), v
        ):
            used.add(key)
            continue
        # JukeBox namespace
        m = re.fullmatch(r"tiers\.(\d+)\.model\.layers\.(\d+)\.(.+)", key)
        if m and _map_decoder_layer(
            params, f"tiers_{m.group(1)}/model/block{m.group(2)}",
            m.group(3), v, n_heads, staged_qkv,
        ):
            used.add(key)
            continue
        m = re.fullmatch(r"tiers\.(\d+)\.model\.norm\.(weight|bias)", key)
        if m:
            _set(params, f"tiers_{m.group(1)}/model/final_ln/{'scale' if m.group(2) == 'weight' else 'bias'}", v)
            used.add(key)
            continue
        m = re.fullmatch(r"tiers\.(\d+)\.input_module\.heads\.(\d+)\.(.+)", key)
        if m and _map_input_head(
            params, f"tiers_{m.group(1)}/input_module/heads_{m.group(2)}",
            m.group(3), v,
        ):
            used.add(key)
            continue
        m = re.fullmatch(r"tiers\.(\d+)\.up_sampler\.fc\.(weight|bias)", key)
        if m:
            _set(params, f"tiers_{m.group(1)}/up_sampler/Dense_0/{'kernel' if m.group(2) == 'weight' else 'bias'}",
                 v.T if m.group(2) == "weight" else v)
            used.add(key)
            continue
        # shared tail + deterministic/static buffers
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
        if key.endswith("min_temp") or key.endswith("pe.pe") or key == "pe.pe":
            used.add(key)  # static config / deterministic sinusoidal table
            continue

    assert not staged_qkv, f"in_proj weight/bias pair incomplete: {staged_qkv.keys()}"
    missing = set(sd) - used
    if missing:
        raise ValueError(
            f"unmapped reference parameters: {sorted(missing)[:8]}"
            f"{'...' if len(missing) > 8 else ''}"
        )
    _recompute_wn_scales(params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    net.params = params
    return params


# -- seq2seq (requires Config(ref_compat=True) to generate comparably) -------

def seq2seq_params_from_state_dict(net, sd: Dict[str, np.ndarray]):
    """Map a reference Seq2SeqLSTMNetwork ``state_dict`` onto ``net``'s
    param tree (``/root/reference/mimikit/networks/s2s_lstm_v2.py:53-304``).

    The reference's forward has two quirks its trained weights depend on:
    the bidirectional "sum" actually sums adjacent feature pairs of the
    concatenated [fwd|bwd] output (``:100``), and the encoder hidden seeds
    EVERY decoder layer (``:171``).  Build the receiving net with
    ``Seq2SeqLSTMNetwork.Config(ref_compat=True)`` to reproduce both;
    this function raises if the net was built without it.
    """
    import jax
    import jax.numpy as jnp

    if not getattr(net.config, "ref_compat", False):
        raise ValueError(
            "reference seq2seq checkpoints only transfer onto a net built "
            "with Config(ref_compat=True) — the reference's adjacent-pair "
            "direction sum (s2s_lstm_v2.py:100) is part of the trained "
            "function"
        )
    if net.params is None:
        net.init_params(batch_size=1)

    def to_mutable(d):
        if isinstance(d, dict):
            return {k: to_mutable(v) for k, v in d.items()}
        return d

    params = to_mutable(jax.device_get(net.params))
    sd = _resolve_weight_norm(sd)
    used = set()
    staged_bias: Dict[str, np.ndarray] = {}

    for key in sd:
        v = np.asarray(sd[key])
        m = re.fullmatch(
            r"(enc|dec)\.lstm\.(\d+)\.(weight|bias)_(ih|hh)_l0(_reverse)?", key
        )
        if m:
            side, n, kind, which, rev = (
                m.group(1), int(m.group(2)), m.group(3), m.group(4),
                m.group(5),
            )
            direction = "bwd" if rev else "fwd"
            base = f"{side}/lstm{n}/{direction}/l0"
            for g, chunk in zip(_GATES, np.split(v, 4, axis=0)):
                if kind == "weight":
                    prefix = "i" if which == "ih" else "h"
                    _set(params, f"{base}/{prefix}{g}/kernel", chunk.T)
                else:
                    path = f"{base}/h{g}/bias"
                    staged_bias[path] = staged_bias.get(path, 0) + chunk
            used.add(key)
            continue
        m = re.fullmatch(r"enc\.fc_out\.weight", key)
        if m:
            _set(params, "enc/fc_out/kernel", v.T)
            used.add(key)
            continue
        m = re.fullmatch(r"(enc|dec)\.fc\.fc\.(weight|bias)", key)
        if m:
            _set(params, f"{m.group(1)}/fc/Dense_0/{'kernel' if m.group(2) == 'weight' else 'bias'}",
                 v.T if m.group(2) == "weight" else v)
            used.add(key)
            continue
        m = re.fullmatch(
            r"(input|output)_module\.heads\.(\d+)\.(.+)", key
        )
        if m:
            side = (
                "input_module/heads_" if m.group(1) == "input"
                else "output_heads_"
            )
            if _map_input_head(params, f"{side}{m.group(2)}", m.group(3), v):
                used.add(key)
                continue
        if key.endswith("min_temp"):
            used.add(key)
            continue

    for path, value in staged_bias.items():
        _set(params, path, value)

    missing = set(sd) - used
    if missing:
        raise ValueError(
            f"unmapped reference parameters: {sorted(missing)[:8]}"
            f"{'...' if len(missing) > 8 else ''}"
        )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    net.params = params
    return params
