"""Fused Pallas decode kernels: the whole autoregressive loop in ONE kernel.

The ``lax.scan`` decoders (``networks/sample_rnn.py:413``,
``networks/wavenet.py``) already run a full generation as one XLA dispatch,
but every scan step still issues ~dozens of small HLO ops whose fixed
per-op overhead dominates at small batch — the 3-tier SampleRNN step is
~20 µs on v5e at B=1 (≈48k samples/s, just under the 50k/chip target).

This module fuses the entire decode loop into a single Pallas kernel: all
weights live in VMEM for the whole generation, the sample window, LSTM
carries and tier caches are VMEM scratch, and the per-step chain (framed
input matmul → gated LSTM → upsampler → MLP head → learned-temperature
logits → Gumbel/argmax sampling) runs as one fused program with zero
inter-op overhead.  This is the "Pallas fast-decode path" BASELINE.md
names (reference semantics: ``sample_rnn_v2.py:236-260``).

Scope: the flagship mu-law SampleRNN configuration (LSTM tiers, n_rnn=1,
single discrete framed-linear input, MLP head with learned temperature) —
``supports_pallas_decode`` gates exactly that; anything else falls back to
the scan decoder.  The argmax path is pinned against the scan decoder
token-for-token (``tests/test_pallas_decode.py``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "supports_pallas_decode",
    "samplernn_weight_pack",
    "make_samplernn_pallas_decoder",
    "supports_pallas_wavenet",
    "wavenet_weight_pack",
    "make_wavenet_pallas_decoder",
    "supports_pallas_transformer",
    "transformer_weight_pack",
    "make_transformer_pallas_decoder",
    "transformer_kv_weight_fuse",
    "make_transformer_kv_ring_pallas",
    "supports_pallas_jukebox",
    "jukebox_weight_pack",
    "make_jukebox_pallas_decoder",
]


def _head_is_plain_mish(t_mod) -> bool:
    """The fused kernels hardcode Mish on the MLP head's hidden layers
    (MLPIO's default); any other head activation (or a scaled/phase
    variant, which carries params) must fall back to the scan path —
    otherwise the kernel silently samples from different logits."""
    act = getattr(t_mod, "activation", None)
    if act is None:
        return False
    return (
        str(getattr(act, "act", "")) == "Mish"
        and not getattr(act, "scaled", False)
        and not getattr(act, "static", False)
    )


def supports_pallas_decode(net) -> bool:
    """True when ``net`` is a SampleRNN in the fused kernel's supported
    configuration."""
    cfg = net.config
    try:
        from ..features.functionals import Discrete
        from ..modules.io import FramedLinearIO
        from ..modules.heads import MLP  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    if str(cfg.rnn_class) != "lstm" or cfg.n_rnn != 1:
        return False
    if str(cfg.h0_init) != "zeros" or cfg.weight_norm:
        return False
    if str(cfg.inputs_mode) != "sum":
        return False
    if len(cfg.frame_sizes) < 2:
        return False
    io = cfg.io_spec
    if len(io.inputs) != 1 or len(io.targets) != 1:
        return False
    if not isinstance(io.inputs[0].elem_type, Discrete):
        return False
    if not isinstance(io.inputs[0].module, FramedLinearIO):
        return False
    t_mod = io.targets[0].module
    if type(t_mod).__name__ != "MLPIO" or t_mod.min_temperature is None:
        return False
    if not _head_is_plain_mish(t_mod):
        return False
    if getattr(t_mod, "n_hidden_layers", 0) not in (0, 1, 2):
        return False
    obj = io.targets[0].objective
    if str(getattr(obj, "objective_type", "")) != "categorical_dist":
        return False
    return True


def samplernn_weight_pack(params, frame_sizes: Tuple[int, ...], dtype=None):
    """Flatten the SampleRNN param tree into the kernel's argument list.

    Layout per non-bottom tier i: W_in (fs_i, H), b_in (1, H),
    Wi (H, 4H), Wh (H, 4H), b (1, 4H) [flax gate order i|f|g|o],
    W_up (H, up_i*H), b_up (1, up_i*H); then bottom W_bot (fs_-1, H),
    b_bot (1, H); then the head's dense chain W_k/b_k (last layer emits
    Q+1 logits, the extra one being the learned temperature).

    ``dtype=jnp.bfloat16`` stores the weights half-width in VMEM and the
    kernels run MXU-native bf16 x bf16 -> f32 dots (``MMK_PALLAS_BF16=1``)
    — faster and half the weight bandwidth, at bf16 logit precision.
    """
    out = []
    n = len(frame_sizes)
    for i in range(n - 1):
        d = params[f"tier_inputs_{i}"]["heads_0"]["core"]["Dense_0"]
        out += [d["kernel"], d["bias"][None, :]]
        cell = params[f"rnn_t{i}"]["l0"]
        Wi = jnp.concatenate(
            [cell[f"i{g}"]["kernel"] for g in "ifgo"], axis=1
        )
        Wh = jnp.concatenate(
            [cell[f"h{g}"]["kernel"] for g in "ifgo"], axis=1
        )
        b = jnp.concatenate([cell[f"h{g}"]["bias"] for g in "ifgo"])
        out += [Wi, Wh, b[None, :]]
        up = params[f"up_t{i}"]["Dense_0"]
        out += [up["kernel"], up["bias"][None, :]]
    bot = params[f"tier_inputs_{n-1}"]["heads_0"]["core"][
        "Conv1dResampler_0"
    ]["Dense_0"]
    out += [bot["kernel"], bot["bias"][None, :]]
    core = params["outputs_0"]["estimator"]["core"]
    k = 0
    while f"Dense_{k}" in core:
        d = core[f"Dense_{k}"]
        out += [d["kernel"], d["bias"][None, :]]
        k += 1
    if dtype is not None:
        out = [w.astype(dtype) for w in out]
    return out


@functools.lru_cache(maxsize=32)
def make_samplernn_pallas_decoder(
    frame_sizes: Tuple[int, ...],
    up_factors: Tuple[int, ...],
    hidden_dim: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    B: int,
    prior_t: int,
    n_steps: int,
    argmax: bool,
    interpret: bool = False,
    weight_dtype: str = "f32",
):
    """Build the fused decode kernel for one static configuration.

    Returns ``fn(weights_list, prompt_i32, seed_i32, temp_f32) ->
    (B, n_steps) int32`` (generated tokens only; caller concatenates the
    prompt back).  ``weight_dtype="bf16"`` expects bf16-packed weights and
    runs MXU-native bf16 dots (f32 accumulate).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs = tuple(frame_sizes)
    up = tuple(up_factors)
    H = hidden_dim
    Q = q_levels
    rf = fs[0]
    n_tiers = len(fs)
    n_weights = 7 * (n_tiers - 1) + 2 + 2 * n_head_dense
    wdt = jnp.bfloat16 if weight_dtype == "bf16" else jnp.float32

    def wdot(a, w_ref):
        return jnp.dot(
            a.astype(wdt), w_ref[:], preferred_element_type=jnp.float32
        )

    def wbias(b_ref):
        return b_ref[:].astype(jnp.float32)

    # prompt/out are TIME-MAJOR (T, B) and the tier caches SLOT-major
    # (up, B, H): Mosaic only allows dynamic indexing on non-lane
    # dimensions (lane offsets must be provably 128-aligned)
    def kernel(prompt_ref, temp_ref, seed_ref, *refs):
        w_refs = refs[:n_weights]
        out_ref = refs[n_weights]
        scratch = refs[n_weights + 1 :]
        win_ref = scratch[0]
        h_refs = scratch[1 : 1 + (n_tiers - 1)]
        c_refs = scratch[1 + (n_tiers - 1) : 1 + 2 * (n_tiers - 1)]
        tout_refs = scratch[1 + 2 * (n_tiers - 1) :]

        def tier_w(i):
            base = 7 * i
            return [w_refs[base + k] for k in range(7)]

        bot_W, bot_b = w_refs[7 * (n_tiers - 1)], w_refs[7 * (n_tiers - 1) + 1]
        head = w_refs[7 * (n_tiers - 1) + 2 :]

        if not argmax:
            pltpu.prng_seed(seed_ref[0])

        # init state: the window holds the first rf prompt samples
        win_ref[:] = prompt_ref[0:rf, :].T
        for r in h_refs + c_refs + tout_refs:
            r[:] = jnp.zeros_like(r)

        def mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        def body(t, _):
            xf = (win_ref[:].astype(jnp.float32) / Q - 0.5) * 2.0

            for i in range(n_tiers - 1):
                f = fs[i]
                W_in, b_in, Wi, Wh, b, W_up, b_up = tier_w(i)

                @pl.when((t % f) == 0)
                def _(i=i, f=f, W_in=W_in, b_in=b_in, Wi=Wi, Wh=Wh, b=b,
                      W_up=W_up, b_up=b_up):
                    x = wdot(xf[:, rf - f :], W_in) + wbias(b_in)
                    if i > 0:
                        idx = (t // f) % up[i - 1]
                        x = x + tout_refs[i - 1][pl.ds(idx, 1)][0]
                    gates = (
                        wdot(x, Wi)
                        + wdot(h_refs[i][:], Wh)
                        + wbias(b)
                    )
                    gi = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
                    gf = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
                    gg = jnp.tanh(gates[:, 2 * H : 3 * H])
                    go = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
                    c2 = gf * c_refs[i][:] + gi * gg
                    h2 = go * jnp.tanh(c2)
                    c_refs[i][:] = c2
                    h_refs[i][:] = h2
                    y_up = wdot(h2, W_up) + wbias(b_up)  # (B, up_i * H)
                    tout_refs[i][:] = jnp.swapaxes(
                        y_up.reshape(B, up[i], H), 0, 1
                    )

            # bottom tier: every step
            x = wdot(xf[:, rf - fs[-1] :], bot_W) + wbias(bot_b)
            idx = t % fs[-2]
            x = x + tout_refs[-1][pl.ds(idx, 1)][0]

            h = x
            for k in range(n_head_dense - 1):
                h = mish(wdot(h, head[2 * k]) + wbias(head[2 * k + 1]))
            logits = wdot(h, head[-2]) + wbias(head[-1])  # (B, Q + 1)
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits = logits / temp_ref[0, 0]
                bits = pltpu.prng_random_bits((B, Q))
                # keep 24 bits; route through int32 (mosaic has no
                # uint32 -> float32 cast)
                b24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
                gumbel = -jnp.log(-jnp.log(u))
                tok = jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)

            # teacher-force inside the prompt
            t_clip = jnp.minimum(t, prior_t - 1)
            tp = prompt_ref[pl.ds(t_clip, 1), :][0]
            tok = jnp.where(t < prior_t, tp, tok)

            @pl.when(t >= prior_t)
            def _():
                out_ref[pl.ds(t - prior_t, 1), :] = tok[None, :]

            win_ref[:] = jnp.concatenate(
                [win_ref[:, 1:], tok[:, None]], axis=1
            )
            return 0

        jax.lax.fori_loop(rf, prior_t + n_steps, body, 0, unroll=False)

    weight_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)
    ]
    scratch_shapes = (
        [pltpu.VMEM((B, rf), jnp.int32)]
        + [pltpu.VMEM((B, H), jnp.float32) for _ in range(2 * (n_tiers - 1))]
        + [pltpu.VMEM((u, B, H), jnp.float32) for u in up]
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, B), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prompt
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            *weight_specs,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def fn(weights, prompt, seed, temperature):
        out_t = call(
            prompt.astype(jnp.int32).T,
            jnp.asarray(temperature, jnp.float32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            *weights,
        )
        return out_t.T  # back to (B, n_steps)

    return fn


# -- WaveNet ------------------------------------------------------------------

def supports_pallas_wavenet(net) -> bool:
    """True for the standard gated WaveNet shape: kernel-2 dilated layers,
    Tanh×Sigmoid gates, skip accumulation, plain residuals, one embedding
    input and one learned-temperature MLP head (the reference's mu-law
    flagship, ``wavenet_v2.py:185-293``)."""
    cfg = net.config
    try:
        from ..features.functionals import Discrete
        from ..modules.io import EmbeddingIO
    except Exception:  # pragma: no cover
        return False
    if cfg.dims_1x1 or cfg.groups != 1 or cfg.stride != 1:
        return False
    if cfg.with_affine_residuals or cfg.layerwise_inputs:
        return False
    if cfg.reverse_layer_order or cfg.tie_io_weights or not cfg.bias:
        return False
    if str(cfg.act_f) != "Tanh" or str(cfg.act_g) != "Sigmoid":
        return False
    if cfg.skips_dim is None or len(cfg.dims_dilated) != 1:
        return False
    if cfg.residuals_dim is not None and cfg.residuals_dim != cfg.dims_dilated[0]:
        return False
    for lc in type(net).get_layers_cfg(cfg):
        if lc["kernel_size"] != 2:
            return False
    io = cfg.io_spec
    if len(io.inputs) != 1 or len(io.targets) != 1:
        return False
    if not isinstance(io.inputs[0].elem_type, Discrete):
        return False
    if not isinstance(io.inputs[0].module, EmbeddingIO):
        return False
    t_mod = io.targets[0].module
    if type(t_mod).__name__ != "MLPIO" or t_mod.min_temperature is None:
        return False
    if not _head_is_plain_mish(t_mod):
        return False
    obj = io.targets[0].objective
    if str(getattr(obj, "objective_type", "")) != "categorical_dist":
        return False
    return True


def wavenet_weight_pack(params, n_layers: int, has_res: Tuple[bool, ...]):
    """Flatten the WaveNet param tree: embedding table, then per layer
    K0/K1 (the two taps of the kernel-2 dilated conv, each (D, 2*Dinner)),
    conv bias, skip kernel/bias, [res kernel/bias], then the head chain."""
    out = [params["input_modules_0"]["core"]["Embed_0"]["embedding"]]
    for i in range(n_layers):
        lp = params[f"layer{i}"]
        K = lp["conv_dil0"]["kernel"]  # (2, D, mult*Dinner)
        out += [K[0], K[1], lp["conv_dil0"]["bias"][None, :]]
        out += [
            lp["conv_skip"]["kernel"][0],
            lp["conv_skip"]["bias"][None, :],
        ]
        if has_res[i]:
            out += [
                lp["conv_res"]["kernel"][0],
                lp["conv_res"]["bias"][None, :],
            ]
    core = params["output_modules_0"]["estimator"]["core"]
    k = 0
    while f"Dense_{k}" in core:
        d = core[f"Dense_{k}"]
        out += [d["kernel"], d["bias"][None, :]]
        k += 1
    return out


@functools.lru_cache(maxsize=32)
def make_wavenet_pallas_decoder(
    dilations: Tuple[int, ...],
    has_res: Tuple[bool, ...],
    dim: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    B: int,
    prior_t: int,
    n_steps: int,
    argmax: bool,
    interpret: bool = False,
):
    """Fused WaveNet decode: the whole AR loop in one kernel with per-layer
    dilation-length ring buffers in VMEM (the Fast-WaveNet queues,
    reference ``wavenet_v2.py:368-445``, without the hook surgery)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(dilations)
    Q = q_levels
    D = dim
    rf = sum(dilations) + 1
    n_weights = 1 + sum(7 if r else 5 for r in has_res) + 2 * n_head_dense

    def kernel(prompt_ref, temp_ref, seed_ref, *refs):
        w_refs = list(refs[:n_weights])
        out_ref = refs[n_weights]
        rings = refs[n_weights + 1 :]

        emb = w_refs.pop(0)
        layer_w = []
        for r in has_res:
            n = 7 if r else 5
            layer_w.append(w_refs[:n])
            w_refs = w_refs[n:]
        head = w_refs

        if not argmax:
            pltpu.prng_seed(seed_ref[0])
        for r in rings:
            r[:] = jnp.zeros_like(r)

        def mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        def body(t, _):
            # push the sample at t-1, predict position t
            s = t - 1
            tok_in = prompt_ref[pl.ds(jnp.minimum(s, prior_t - 1), 1), :][0]

            @pl.when(s >= prior_t)
            def _():
                pass  # tok_in is overwritten below for generated samples

            gen = out_ref[pl.ds(jnp.maximum(s - prior_t, 0), 1), :][0]
            tok = jnp.where(s < prior_t, tok_in, gen)

            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
                == tok[:, None]
            ).astype(jnp.float32)
            x = jnp.dot(onehot, emb[:], preferred_element_type=jnp.float32)

            skips = jnp.zeros((B, layer_w[0][4].shape[-1]), jnp.float32)
            for i, d in enumerate(dilations):
                w = layer_w[i]
                K0, K1, b, Wsk, bsk = w[0], w[1], w[2], w[3], w[4]
                ptr = s % d
                old = rings[i][pl.ds(ptr, 1)][0]  # input at time s - d
                rings[i][pl.ds(ptr, 1)] = x[None]
                fg = (
                    jnp.dot(old, K0[:], preferred_element_type=jnp.float32)
                    + jnp.dot(x, K1[:], preferred_element_type=jnp.float32)
                    + b[:]
                )
                y = jnp.tanh(fg[:, :D]) * jax.nn.sigmoid(fg[:, D:])
                skips = skips + (
                    jnp.dot(y, Wsk[:], preferred_element_type=jnp.float32)
                    + bsk[:]
                )
                if has_res[i]:
                    Wr, br = w[5], w[6]
                    x = x + (
                        jnp.dot(y, Wr[:], preferred_element_type=jnp.float32)
                        + br[:]
                    )
                else:
                    x = y

            h = skips
            for k in range(n_head_dense - 1):
                h = mish(
                    jnp.dot(
                        h, head[2 * k][:], preferred_element_type=jnp.float32
                    )
                    + head[2 * k + 1][:]
                )
            logits = (
                jnp.dot(h, head[-2][:], preferred_element_type=jnp.float32)
                + head[-1][:]
            )
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits = logits / temp_ref[0, 0]
                bits = pltpu.prng_random_bits((B, Q))
                b24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
                nxt = jnp.argmax(
                    logits + (-jnp.log(-jnp.log(u))), axis=-1
                ).astype(jnp.int32)

            @pl.when(t >= prior_t)
            def _():
                out_ref[pl.ds(t - prior_t, 1), :] = nxt[None, :]

            return 0

        jax.lax.fori_loop(1, prior_t + n_steps, body, 0, unroll=False)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, B), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prompt (prior_t, B)
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)],
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((d, B, D), jnp.float32) for d in dilations
        ],
        interpret=interpret,
    )

    def fn(weights, prompt, seed, temperature):
        out_t = call(
            prompt.astype(jnp.int32).T,
            jnp.asarray(temperature, jnp.float32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            *weights,
        )
        return out_t.T

    return fn


# -- chunked WaveNet decode (state-carrying, HBM dilation rings) --------------

@functools.lru_cache(maxsize=32)
def make_wavenet_pallas_chunked(
    dilations: Tuple[int, ...],
    has_res: Tuple[bool, ...],
    ring_hbm: Tuple[bool, ...],
    dim: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    B: int,
    prior_t: int,
    chunk: int,
    argmax: bool,
    interpret: bool = False,
):
    """State-carrying fused WaveNet decode for wide stream batches.

    The whole-loop kernel (``make_wavenet_pallas_decoder``) keeps every
    dilation ring in VMEM scratch — ``4*B*D*sum(d)`` bytes, which blows the
    16 MiB scoped envelope past B≈24 for the 10-layer bench net (VERDICT r3
    weak #4: the fused path conceded b64+ to the scan).  Here the rings for
    large dilations (``ring_hbm[i]``) live in HBM as aliased kernel
    in/outputs; each step DMAs one (B, D) row per HBM layer in and the
    updated row out.  The DMA schedule is hazard-free by construction:

    - reads for step t are PREFETCHED during step t-1 (double-buffered
      landing slots, one semaphore per (layer, slot));
    - the row written at step t is next read at step t+d, and its write
      semaphore is consumed at step t+2 (before the staging slot's reuse),
      so every read's source row was written-and-waited ≥ d-2 steps
      earlier — requires d ≥ 4 for HBM rings (the builder asserts);
    - small-d rings stay in VMEM state (carried in/out like the SampleRNN
      chunked kernel), so the every-step d=1/2 rows never touch HBM.

    Per step that is ``2*B*D*4`` bytes per HBM layer (~1 µs at B=256 for
    five layers) fully overlapped with ~5 µs of layer matmuls.  Returns
    ``fn(weights, prompt_T, seed, temp, t0, state) -> (out_chunk_T,
    new_state)`` with ``state = [tok (8,B) i32, vmem rings..., hbm
    rings...]``; iteration i predicts absolute position t0+i and pushes
    the sample at t0+i-1 (prompt rows during warm-up, so ``out`` rows
    before ``prior_t`` echo the prompt).  Reference fast path this
    re-implements TPU-side: Fast-WaveNet queues,
    ``/root/reference/mimikit/networks/wavenet_v2.py:368-445``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(dilations)
    Q = q_levels
    D = dim
    n_weights = 1 + sum(7 if r else 5 for r in has_res) + 2 * n_head_dense
    assert chunk >= 2
    for d, h in zip(dilations, ring_hbm):
        assert not h or d >= 4, "HBM rings need d >= 4 (DMA hazard window)"
    vmem_ids = [i for i, h in enumerate(ring_hbm) if not h]
    hbm_ids = [i for i, h in enumerate(ring_hbm) if h]
    n_v, n_h = len(vmem_ids), len(hbm_ids)
    # state layout (both in and out): tok, vmem rings, hbm rings
    n_state = 1 + n_v + n_h

    def kernel(t0_ref, temp_ref, seed_ref, prompt_ref, *refs):
        w_refs = list(refs[:n_weights])
        state_in = refs[n_weights : n_weights + n_state]
        outs = refs[n_weights + n_state : n_weights + n_state + 1 + n_state]
        scratch = refs[n_weights + n_state + 1 + n_state :]

        tok_in = state_in[0]
        vrings_in = state_in[1 : 1 + n_v]
        out_ref = outs[0]
        tok_ref = outs[1]
        vrings = outs[2 : 2 + n_v]
        hrings = outs[2 + n_v :]  # ANY (HBM), aliased to state_in's

        rbufs = scratch[:n_h]
        wbufs = scratch[n_h : 2 * n_h]
        rsems = scratch[2 * n_h] if n_h else None
        wsems = scratch[2 * n_h + 1] if n_h else None

        emb = w_refs.pop(0)
        layer_w = []
        for r in has_res:
            n = 7 if r else 5
            layer_w.append(w_refs[:n])
            w_refs = w_refs[n:]
        head = w_refs

        if not argmax:
            pltpu.prng_seed(seed_ref[0])

        tok_ref[:] = tok_in[:]
        for src, dst in zip(vrings_in, vrings):
            dst[:] = src[:]

        t0 = t0_ref[0]

        def ring_row(t):
            # the row read AND overwritten at iteration t (sample index t-1)
            return t - 1

        def read_into(hk, t, slot):
            d = dilations[hbm_ids[hk]]
            ptr = ring_row(t) % d
            return pltpu.make_async_copy(
                hrings[hk].at[pl.ds(ptr, 1)],
                rbufs[hk].at[pl.ds(slot, 1)],
                rsems.at[hk, slot],
            )

        def write_from(hk, t, slot):
            d = dilations[hbm_ids[hk]]
            ptr = ring_row(t) % d
            return pltpu.make_async_copy(
                wbufs[hk].at[pl.ds(slot, 1)],
                hrings[hk].at[pl.ds(ptr, 1)],
                wsems.at[hk, slot],
            )

        # prefetch the first iteration's HBM rows
        for hk in range(n_h):
            read_into(hk, t0, 0).start()

        def mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        def body(i, _):
            t = t0 + i
            s = t - 1  # sample pushed this iteration
            slot = i % 2

            prev_gen = out_ref[pl.ds(jnp.maximum(i - 1, 0), 1), :][0]
            carried = tok_ref[pl.ds(0, 1), :][0]
            prev = jnp.where(i >= 1, prev_gen, carried)
            tokp = prompt_ref[pl.ds(jnp.minimum(s, prior_t - 1), 1), :][0]
            tok = jnp.where(s < prior_t, tokp, prev)

            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
                == tok[:, None]
            ).astype(jnp.float32)
            x = jnp.dot(onehot, emb[:], preferred_element_type=jnp.float32)

            skips = jnp.zeros((B, layer_w[0][4].shape[-1]), jnp.float32)
            vk = 0
            hk = 0
            for li, d in enumerate(dilations):
                w = layer_w[li]
                K0, K1, b, Wsk, bsk = w[0], w[1], w[2], w[3], w[4]
                if ring_hbm[li]:
                    read_into(hk, t, slot).wait()
                    old = rbufs[hk][pl.ds(slot, 1)][0]

                    # reclaim the staging slot (write issued at i-2), then
                    # stage x and fire the row update
                    @pl.when(i >= 2)
                    def _(hk=hk, t=t, slot=slot):
                        write_from(hk, t - 2, slot).wait()

                    wbufs[hk][pl.ds(slot, 1)] = x[None]
                    write_from(hk, t, slot).start()
                    hk += 1
                else:
                    ptr = (t - 1) % d
                    old = vrings[vk][pl.ds(ptr, 1)][0]
                    vrings[vk][pl.ds(ptr, 1)] = x[None]
                    vk += 1
                fg = (
                    jnp.dot(old, K0[:], preferred_element_type=jnp.float32)
                    + jnp.dot(x, K1[:], preferred_element_type=jnp.float32)
                    + b[:]
                )
                y = jnp.tanh(fg[:, :D]) * jax.nn.sigmoid(fg[:, D:])
                skips = skips + (
                    jnp.dot(y, Wsk[:], preferred_element_type=jnp.float32)
                    + bsk[:]
                )
                if has_res[li]:
                    Wr, br = w[5], w[6]
                    x = x + (
                        jnp.dot(y, Wr[:], preferred_element_type=jnp.float32)
                        + br[:]
                    )
                else:
                    x = y

            # prefetch the NEXT iteration's HBM rows (after this step's
            # writes were issued — different ring rows, no conflict)
            @pl.when(i + 1 < chunk)
            def _():
                for hk2 in range(n_h):
                    read_into(hk2, t0 + i + 1, (i + 1) % 2).start()

            h = skips
            for k in range(n_head_dense - 1):
                h = mish(
                    jnp.dot(
                        h, head[2 * k][:], preferred_element_type=jnp.float32
                    )
                    + head[2 * k + 1][:]
                )
            logits = (
                jnp.dot(h, head[-2][:], preferred_element_type=jnp.float32)
                + head[-1][:]
            )
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits = logits / temp_ref[0, 0]
                bits = pltpu.prng_random_bits((B, Q))
                b24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
                nxt = jnp.argmax(
                    logits + (-jnp.log(-jnp.log(u))), axis=-1
                ).astype(jnp.int32)

            # token at position t: prompt during warm-up, sampled after —
            # out rows are then uniformly "the sample at position t0+i",
            # which is exactly what the prev-token read above consumes
            tok_t = jnp.where(t < prior_t, prompt_ref[
                pl.ds(jnp.minimum(t, prior_t - 1), 1), :][0], nxt)
            out_ref[pl.ds(i, 1), :] = tok_t[None, :]
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

        # drain the last two iterations' in-flight row writes
        for hk in range(n_h):
            write_from(hk, t0 + chunk - 2, (chunk - 2) % 2).wait()
            write_from(hk, t0 + chunk - 1, (chunk - 1) % 2).wait()

        last = out_ref[pl.ds(chunk - 1, 1), :]
        tok_ref[:] = jnp.broadcast_to(last, (8, B))

    state_shapes = (
        [jax.ShapeDtypeStruct((8, B), jnp.int32)]
        + [
            jax.ShapeDtypeStruct((dilations[i], B, D), jnp.float32)
            for i in vmem_ids
        ]
        + [
            jax.ShapeDtypeStruct((dilations[i], B, D), jnp.float32)
            for i in hbm_ids
        ]
    )
    state_spaces = (
        [pltpu.VMEM] * (1 + n_v) + [pl.ANY] * n_h
    )

    # inputs: t0, temp, seed, prompt, weights..., state...; the HBM rings
    # are aliased to their output slots so the wrapper's scan threads ONE
    # buffer through every chunk (no per-chunk ring copies)
    n_in_pre = 4 + n_weights
    aliases = {
        n_in_pre + 1 + n_v + k: 2 + n_v + k for k in range(n_h)
    }

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((chunk, B), jnp.int32)] + state_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t0 (1,)
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prompt (prior_t, B)
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)],
            *[pl.BlockSpec(memory_space=sp) for sp in state_spaces],
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=sp) for sp in state_spaces],
        scratch_shapes=(
            [pltpu.VMEM((2, B, D), jnp.float32) for _ in range(2 * n_h)]
            + (
                [
                    pltpu.SemaphoreType.DMA((n_h, 2)),
                    pltpu.SemaphoreType.DMA((n_h, 2)),
                ]
                if n_h
                else []
            )
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )

    def init_state():
        return [jnp.zeros(s.shape, s.dtype) for s in state_shapes]

    def fn(weights, prompt_T, seed, temp, t0, state):
        outs = call(
            jnp.asarray(t0, jnp.int32).reshape(1),
            jnp.asarray(temp, jnp.float32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            prompt_T,
            *weights,
            *state,
        )
        return outs[0], outs[1:]

    fn.init_state = init_state
    fn.vmem_ids, fn.hbm_ids = tuple(vmem_ids), tuple(hbm_ids)
    return fn


# -- chunked SampleRNN decode (state-carrying, any batch size) ---------------

@functools.lru_cache(maxsize=32)
def make_samplernn_pallas_chunked(
    frame_sizes: Tuple[int, ...],
    up_factors: Tuple[int, ...],
    hidden_dim: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    B: int,
    prior_t: int,
    chunk: int,
    argmax: bool,
    interpret: bool = False,
    weight_dtype: str = "f32",
):
    """Like ``make_samplernn_pallas_decoder`` but processes ``chunk`` steps
    per kernel call with the decode state (window, LSTM carries, tier
    caches) carried IN and OUT — the output buffer no longer has to fit in
    VMEM with the weights, so large stream batches (the production bulk
    path) run fused too.  The wrapper scans the kernel over chunks.

    Returns ``fn(weights, prompt_T, seed, temp, t0, state) ->
    (out_chunk_T, new_state)`` where ``state = (win, (h...), (c...),
    (tout...))`` and t0 is the absolute step of the chunk's first
    iteration.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs = tuple(frame_sizes)
    up = tuple(up_factors)
    H = hidden_dim
    Q = q_levels
    rf = fs[0]
    n_tiers = len(fs)
    n_weights = 7 * (n_tiers - 1) + 2 + 2 * n_head_dense
    n_state = 1 + 2 * (n_tiers - 1) + len(up)
    wdt = jnp.bfloat16 if weight_dtype == "bf16" else jnp.float32

    def wdot(a, w_ref):
        return jnp.dot(
            a.astype(wdt), w_ref[:], preferred_element_type=jnp.float32
        )

    def wbias(b_ref):
        return b_ref[:].astype(jnp.float32)

    def kernel(t0_ref, temp_ref, seed_ref, prompt_ref, *refs):
        w_refs = refs[:n_weights]
        state_in = refs[n_weights : n_weights + n_state]
        outs = refs[n_weights + n_state :]
        out_ref = outs[0]
        state_out = outs[1:]

        win_in = state_in[0]
        h_in = state_in[1 : 1 + (n_tiers - 1)]
        c_in = state_in[1 + (n_tiers - 1) : 1 + 2 * (n_tiers - 1)]
        tout_in = state_in[1 + 2 * (n_tiers - 1) :]
        win_ref = state_out[0]
        h_refs = state_out[1 : 1 + (n_tiers - 1)]
        c_refs = state_out[1 + (n_tiers - 1) : 1 + 2 * (n_tiers - 1)]
        tout_refs = state_out[1 + 2 * (n_tiers - 1) :]

        def tier_w(i):
            base = 7 * i
            return [w_refs[base + k] for k in range(7)]

        bot_W, bot_b = w_refs[7 * (n_tiers - 1)], w_refs[7 * (n_tiers - 1) + 1]
        head = w_refs[7 * (n_tiers - 1) + 2 :]

        if not argmax:
            pltpu.prng_seed(seed_ref[0])

        win_ref[:] = win_in[:]
        for src, dst in zip(h_in + c_in + tout_in, h_refs + c_refs + tout_refs):
            dst[:] = src[:]

        def mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        t0 = t0_ref[0]

        def body(i, _):
            t = t0 + i
            xf = (win_ref[:].astype(jnp.float32) / Q - 0.5) * 2.0

            for k in range(n_tiers - 1):
                f = fs[k]
                W_in, b_in, Wi, Wh, b, W_up, b_up = tier_w(k)

                @pl.when((t % f) == 0)
                def _(k=k, f=f, W_in=W_in, b_in=b_in, Wi=Wi, Wh=Wh, b=b,
                      W_up=W_up, b_up=b_up):
                    x = wdot(xf[:, rf - f :], W_in) + wbias(b_in)
                    if k > 0:
                        idx = (t // f) % up[k - 1]
                        x = x + tout_refs[k - 1][pl.ds(idx, 1)][0]
                    gates = (
                        wdot(x, Wi)
                        + wdot(h_refs[k][:], Wh)
                        + wbias(b)
                    )
                    gi = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
                    gf = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
                    gg = jnp.tanh(gates[:, 2 * H : 3 * H])
                    go = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
                    c2 = gf * c_refs[k][:] + gi * gg
                    h2 = go * jnp.tanh(c2)
                    c_refs[k][:] = c2
                    h_refs[k][:] = h2
                    y_up = wdot(h2, W_up) + wbias(b_up)
                    tout_refs[k][:] = jnp.swapaxes(
                        y_up.reshape(B, up[k], H), 0, 1
                    )

            x = wdot(xf[:, rf - fs[-1] :], bot_W) + wbias(bot_b)
            idx = t % fs[-2]
            x = x + tout_refs[-1][pl.ds(idx, 1)][0]

            h = x
            for k in range(n_head_dense - 1):
                h = mish(wdot(h, head[2 * k]) + wbias(head[2 * k + 1]))
            logits = wdot(h, head[-2]) + wbias(head[-1])
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits = logits / temp_ref[0, 0]
                bits = pltpu.prng_random_bits((B, Q))
                b24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
                tok = jnp.argmax(
                    logits + (-jnp.log(-jnp.log(u))), axis=-1
                ).astype(jnp.int32)

            t_clip = jnp.minimum(t, prior_t - 1)
            tp = prompt_ref[pl.ds(t_clip, 1), :][0]
            tok = jnp.where(t < prior_t, tp, tok)

            out_ref[pl.ds(i, 1), :] = tok[None, :]
            win_ref[:] = jnp.concatenate(
                [win_ref[:, 1:], tok[:, None]], axis=1
            )
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

    state_shapes = (
        [jax.ShapeDtypeStruct((B, rf), jnp.int32)]
        + [
            jax.ShapeDtypeStruct((B, H), jnp.float32)
            for _ in range(2 * (n_tiers - 1))
        ]
        + [jax.ShapeDtypeStruct((u, B, H), jnp.float32) for u in up]
    )

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((chunk, B), jnp.int32)] + state_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t0 (1,)
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prompt (prior_t, B)
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)],
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_state)],
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_state),
        interpret=interpret,
    )

    def init_state():
        return [jnp.zeros(s.shape, s.dtype) for s in state_shapes]

    def fn(weights, prompt_T, seed, temp, t0, state):
        outs = call(
            jnp.asarray(t0, jnp.int32).reshape(1),
            jnp.asarray(temp, jnp.float32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            prompt_T,
            *weights,
            *state,
        )
        return outs[0], outs[1:]

    fn.init_state = init_state
    return fn


# -- shared block-diagonal attention ------------------------------------------
#
# The tier/window attentions decode over tiny-to-small row counts where
# per-(stream, head) (n, dH) dots are issue-latency-bound micro-ops.  The
# kernels instead tile K^T / V into block-diagonal matrices with static
# iota masks so ALL blocks' scores, per-block softmax (matmul segment-sums
# against block-ones selectors) and values run as 5 full-width ops.
# Because each block-diag column/row is zero outside its block's dH lanes,
# no cross-block terms appear and the head outputs land already
# concatenated on the lanes.  Two groupings:
#   stream_stride=1  — one stream's window per call (heads are the blocks)
#   stream_stride=B  — ALL streams in one call over frame-major rows
#                      (row i = frame i//B of stream i%B); blocks are
#                      (stream, head) pairs, masked by row/col stream
#                      equality, so the whole batch's attention is still
#                      5 ops — this is what makes batched fused decode
#                      beat the window scan (VERDICT r2 item 2).


def _bd_masks(R: int, nH: int, dH: int, d: int, stream_stride: int):
    """Static iota masks for block-diagonal attention over ``R`` rows.

    Per-block softmax max must be per (row, head) block, NOT per row: a
    global row max lets a head whose scores sit far below another head's
    underflow its whole block to 0/0 NaN.
    """
    C = nH * R
    f32 = jnp.float32
    rd = jax.lax.broadcasted_iota(jnp.int32, (d, C), 0)
    cd = jax.lax.broadcasted_iota(jnp.int32, (d, C), 1)
    kmask = (rd // dH == cd // R).astype(f32)
    rv = jax.lax.broadcasted_iota(jnp.int32, (C, d), 0)
    cv = jax.lax.broadcasted_iota(jnp.int32, (C, d), 1)
    vmask = (rv // R == cv // dH).astype(f32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    B = stream_stride
    causal = (ri // B) >= ((ci % R) // B)
    valid = causal if B == 1 else jnp.logical_and(
        causal, (ri % B) == (ci % B)
    )
    blockcol = ci // R  # head id of each score column
    ro = jax.lax.broadcasted_iota(jnp.int32, (C, nH), 0)
    co = jax.lax.broadcasted_iota(jnp.int32, (C, nH), 1)
    block_ones = (ro // R == co).astype(f32)
    return kmask, vmask, valid, blockcol, block_ones


def _bd_attend(q, k, v, masks, nH: int, big_neg: float):
    """Block-diagonal attention over one row group (see `_bd_masks`)."""
    kmask, vmask, valid, blockcol, block_ones = masks
    R = q.shape[0]
    kT = jnp.swapaxes(k, 0, 1)  # (d, R)
    Kblk = jnp.concatenate([kT] * nH, axis=1) * kmask  # (d, C)
    S = jnp.dot(q, Kblk, preferred_element_type=jnp.float32)  # (R, C)
    S = jnp.where(valid, S, big_neg)
    mb = jnp.concatenate(
        [
            jnp.max(
                jnp.where(blockcol == h, S, big_neg),
                axis=-1,
                keepdims=True,
            )
            + jnp.zeros((R, R), jnp.float32)
            for h in range(nH)
        ],
        axis=1,
    )  # (R, C) per-(row, head-block) max
    E = jnp.exp(S - mb)
    denom = jnp.dot(
        E, block_ones, preferred_element_type=jnp.float32
    )  # (R, nH)
    denom_b = jnp.dot(
        denom,
        jnp.swapaxes(block_ones, 0, 1),
        preferred_element_type=jnp.float32,
    )  # (R, C)
    P = E / denom_b
    Vblk = jnp.concatenate([v] * nH, axis=0) * vmask  # (C, d)
    return jnp.dot(P, Vblk, preferred_element_type=jnp.float32)  # (R, d)


# -- SimpleTransformer --------------------------------------------------------

def supports_pallas_transformer(net) -> bool:
    """True for the standard SimpleTransformer shape: post-norm ReLU decoder
    blocks (the core hardcodes both — ``networks/transformers.py:157``), one
    embedding input and one learned-temperature MLP head.  Mirrors the
    reference's generation semantics (``transformers.py:70-178`` in the
    reference): each step refeeds the last ``rf`` tokens with
    window-relative positional encoding — so the decode state is just the
    token window and the whole AR loop fits in one kernel."""
    cfg = net.config
    if type(net).__name__ != "SimpleTransformer":
        return False
    try:
        from ..features.functionals import Discrete
        from ..modules.io import EmbeddingIO
    except Exception:  # pragma: no cover
        return False
    if cfg.model_dim % cfg.n_heads != 0:
        return False
    io = cfg.io_spec
    if len(io.inputs) != 1 or len(io.targets) != 1:
        return False
    if not isinstance(io.inputs[0].elem_type, Discrete):
        return False
    if not isinstance(io.inputs[0].module, EmbeddingIO):
        return False
    t_mod = io.targets[0].module
    if type(t_mod).__name__ != "MLPIO" or t_mod.min_temperature is None:
        return False
    if not _head_is_plain_mish(t_mod):
        return False
    if getattr(t_mod, "weight_norm", False) or getattr(cfg, "weight_norm", False):
        return False
    obj = io.targets[0].objective
    if str(getattr(obj, "objective_type", "")) != "categorical_dist":
        return False
    return True


def transformer_weight_pack(params, num_layers: int, with_final_ln: bool):
    """Flatten the SimpleTransformer param tree into the kernel's argument
    list, stacking the per-layer tensors along a leading layer axis so the
    kernel indexes them with a static layer id.

    Attention kernels (d, nH, dH) flatten to (d, d) with head blocks
    contiguous on the columns; out kernels (nH, dH, d) flatten to (d, d)
    with head blocks contiguous on the rows — matching the head-major
    concat the kernel performs.
    """
    L = num_layers
    d = params["model"]["block0"]["ln1"]["scale"].shape[0]

    def attn(i, name):
        a = params["model"][f"block{i}"][name]
        per = []
        for part in ("query", "key", "value"):
            per += [
                a[part]["kernel"].reshape(d, -1),
                a[part]["bias"].reshape(1, -1),
            ]
        per += [
            a["out"]["kernel"].reshape(-1, d),
            a["out"]["bias"].reshape(1, -1),
        ]
        return per

    def stack(getter):
        return [
            jnp.stack([getter(i)[k] for i in range(L)])
            for k in range(len(getter(0)))
        ]

    out = [params["input_heads_0"]["core"]["Embed_0"]["embedding"]]
    out += stack(lambda i: attn(i, "self_attn"))
    out += stack(lambda i: attn(i, "cross_attn"))
    out += stack(
        lambda i: [
            params["model"][f"block{i}"][f"ln{k}"][p].reshape(1, -1)
            for k in (1, 2, 3)
            for p in ("scale", "bias")
        ]
    )
    out += stack(
        lambda i: [
            params["model"][f"block{i}"]["Dense_0"]["kernel"],
            params["model"][f"block{i}"]["Dense_0"]["bias"].reshape(1, -1),
            params["model"][f"block{i}"]["Dense_1"]["kernel"],
            params["model"][f"block{i}"]["Dense_1"]["bias"].reshape(1, -1),
        ]
    )
    if with_final_ln:
        out += [
            params["model"]["final_ln"]["scale"].reshape(1, -1),
            params["model"]["final_ln"]["bias"].reshape(1, -1),
        ]
    core = params["output_modules_0"]["estimator"]["core"]
    k = 0
    while f"Dense_{k}" in core:
        dd = core[f"Dense_{k}"]
        out += [dd["kernel"], dd["bias"][None, :]]
        k += 1
    return out


@functools.lru_cache(maxsize=32)
def make_transformer_pallas_decoder(
    model_dim: int,
    n_heads: int,
    feedforward_dim: int,
    num_layers: int,
    rf: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    with_final_ln: bool,
    B: int,
    n_steps: int,
    argmax: bool,
    interpret: bool = False,
):
    """Whole-AR-loop fused decode for SimpleTransformer.

    Reproduces the sliding-window scan decoder
    (``networks/transformers.py:_make_window_decoder``) step for step:
    embed the window, add window-relative sinusoidal PE, run the post-norm
    decoder stack (self-attn + cross-attn against the PE'd window + ReLU
    FFN), sample from the last position's learned-temperature logits,
    shift the window.  All weights stay in VMEM across the generation; the
    only carried state is the (B, rf) token window.

    Returns ``fn(weights_list, window_i32 (B, rf), seed, temp) ->
    (B, n_steps) int32`` (generated tokens only).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = model_dim
    nH = n_heads
    dH = d // nH
    ff = feedforward_dim
    L = num_layers
    Q = q_levels
    R = B * rf
    n_stacked = 22  # 8 self-attn + 8 cross-attn + 6 layer-norm
    n_weights = 1 + n_stacked + 4 + (2 if with_final_ln else 0) + 2 * n_head_dense

    # window-relative positional encoding: every step re-encodes positions
    # 0..rf-1 (reference semantics), so the table is static — passed as a
    # VMEM input (pallas kernels cannot capture array constants)
    from ..networks.transformers import sinusoidal_pe

    pe_win = np.tile(sinusoidal_pe(rf, d), (B, 1))  # (B*rf, d)
    big_neg = float(np.finfo(np.float32).min)
    inv_sqrt_dh = 1.0 / float(np.sqrt(dH))

    def kernel(temp_ref, seed_ref, win0_ref, pe_ref, *refs):
        w = list(refs[:n_weights])
        out_ref = refs[n_weights]
        win_ref = refs[n_weights + 1]

        embed = w.pop(0)
        self_w = [w.pop(0) for _ in range(8)]
        cross_w = [w.pop(0) for _ in range(8)]
        ln_w = [w.pop(0) for _ in range(6)]
        ffn_w = [w.pop(0) for _ in range(4)]
        final_w = [w.pop(0), w.pop(0)] if with_final_ln else None
        head = w

        if not argmax:
            pltpu.prng_seed(seed_ref[0])
        win_ref[:] = win0_ref[:]

        pe = pe_ref[:]

        def layer_norm(x, scale, bias):
            # flax LayerNorm formula (mean of squares minus squared mean)
            mean = jnp.mean(x, axis=-1, keepdims=True)
            mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
            var = jnp.maximum(0.0, mean2 - mean * mean)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        def mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        # per-stream block-diagonal attention over the rf-token window:
        # all nH heads' scores/softmax/values run as 5 full-width ops per
        # stream instead of nH (rf, dH) micro-dots (see _bd_attend) —
        # the rows stay stream-major, so the masks use stream_stride=1
        masks = _bd_masks(rf, nH, dH, d, 1)

        def attention(x, kv, l, wset):
            Wq, bq, Wk, bk, Wv, bv, Wo, bo = (t[l] for t in wset)
            q = jnp.dot(x, Wq, preferred_element_type=jnp.float32) + bq
            k = jnp.dot(kv, Wk, preferred_element_type=jnp.float32) + bk
            v = jnp.dot(kv, Wv, preferred_element_type=jnp.float32) + bv
            q = q * inv_sqrt_dh
            stream_outs = [
                _bd_attend(
                    q[s * rf : (s + 1) * rf, :],
                    k[s * rf : (s + 1) * rf, :],
                    v[s * rf : (s + 1) * rf, :],
                    masks,
                    nH,
                    big_neg,
                )
                for s in range(B)
            ]
            a = (
                stream_outs[0]
                if B == 1
                else jnp.concatenate(stream_outs, axis=0)
            )
            return jnp.dot(a, Wo, preferred_element_type=jnp.float32) + bo

        def body(t, _):
            toks = win_ref[:]  # (B, rf) int32
            # per-stream one-hot matmul lookup: Mosaic supports the
            # (1, rf) -> (rf, 1) shape cast but not (B, rf) -> (B*rf, 1)
            qiota = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
            xs = []
            for s in range(B):
                col = toks[s : s + 1, :].reshape(rf, 1)
                oh = (col == qiota).astype(jnp.float32)  # (rf, Q)
                xs.append(
                    jnp.dot(oh, embed[:], preferred_element_type=jnp.float32)
                )
            x = xs[0] if B == 1 else jnp.concatenate(xs, axis=0)  # (R, d)
            x = x + pe
            memory = x
            for l in range(L):
                sw = [self_w[i] for i in range(8)]
                cw = [cross_w[i] for i in range(8)]
                x = layer_norm(
                    x + attention(x, x, l, sw), ln_w[0][l], ln_w[1][l]
                )
                x = layer_norm(
                    x + attention(x, memory, l, cw), ln_w[2][l], ln_w[3][l]
                )
                h = (
                    jnp.dot(
                        x, ffn_w[0][l], preferred_element_type=jnp.float32
                    )
                    + ffn_w[1][l]
                )
                h = jnp.maximum(h, 0.0)
                x = layer_norm(
                    x
                    + jnp.dot(
                        h, ffn_w[2][l], preferred_element_type=jnp.float32
                    )
                    + ffn_w[3][l],
                    ln_w[4][l],
                    ln_w[5][l],
                )
            if with_final_ln:
                x = layer_norm(x, final_w[0][:], final_w[1][:])

            # last position of each stream
            if B == 1:
                last = x[rf - 1 : rf, :]
            else:
                last = jnp.concatenate(
                    [x[s * rf + rf - 1 : s * rf + rf, :] for s in range(B)],
                    axis=0,
                )  # (B, d)

            hh = last
            for kk in range(n_head_dense - 1):
                hh = mish(
                    jnp.dot(
                        hh, head[2 * kk][:],
                        preferred_element_type=jnp.float32,
                    )
                    + head[2 * kk + 1][:]
                )
            logits = (
                jnp.dot(hh, head[-2][:], preferred_element_type=jnp.float32)
                + head[-1][:]
            )  # (B, Q + 1)
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits = logits / temp_ref[0, 0]
                bits = pltpu.prng_random_bits((B, Q))
                b24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
                gumbel = -jnp.log(-jnp.log(u))
                tok = jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)

            out_ref[pl.ds(t, 1), :] = tok[None, :]
            win_ref[:] = jnp.concatenate(
                [win_ref[:, 1:], tok[:, None]], axis=1
            )
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0, unroll=False)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, B), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # initial window (B, rf)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PE table (B*rf, d)
            *[
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(n_weights)
            ],
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, rf), jnp.int32)],
        interpret=interpret,
    )

    def fn(weights, window, seed, temperature):
        out_t = call(
            jnp.asarray(temperature, jnp.float32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            window.astype(jnp.int32),
            jnp.asarray(pe_win),
            *weights,
        )
        return out_t.T  # (B, n_steps)

    return fn


# -- KV-ring streaming transformer decode -------------------------------------

def make_transformer_kv_ring_decoder(
    model_dim: int,
    n_heads: int,
    feedforward_dim: int,
    num_layers: int,
    rf: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    with_final_ln: bool,
    B: int,
    prior_t: int,
    chunk: int,
    argmax: bool,
):
    """O(1)-per-step streaming transformer decode: per-layer K/V ring
    caches over the last ``rf`` positions + ABSOLUTE sinusoidal positional
    encoding (computed analytically from the step index, so the stream is
    unbounded).

    This is a deliberate semantic DIVERGENCE from the reference's
    window-refeed decode (PARITY #10): the refeed re-encodes the window
    relative to its start and recomputes every position's representation
    each step (O(rf) — ~17 GFLOP/step for the 8-layer bench net, which no
    hardware can serve at 16 kHz per stream); the KV ring fixes each
    position's K/V when it is produced (standard streaming-transformer
    semantics) and costs O(1) per step.  Self-attention K/V come from each
    layer's input at production time; cross-attention K/V from the PE'd
    layer-0 input (the refeed's ``memory`` is the input window, so its
    cross K/V ring caches the input representations).  Post-norm stack
    only (the ``supports_pallas_transformer`` surface).

    Pure jax (scan) — runs on any backend and serves as the oracle for a
    fused kernel.  Returns ``fn(weights, prompt_T, rng, temp, t0, state)
    -> (out_chunk_T, new_state)`` with
    ``state = [tok (8, B) i32, selfK, selfV, crossK, crossV
    (L, rf, B, d) f32]``; iteration i pushes the token at position
    ``t0+i-1`` and predicts position ``t0+i`` (prompt rows echo during
    warm-up).  Weights = ``transformer_weight_pack`` output.
    """
    d = model_dim
    nH = n_heads
    dH = d // nH
    L = num_layers
    Q = q_levels
    inv_sqrt_dh = 1.0 / float(np.sqrt(dH))
    big_neg = float(np.finfo(np.float32).min)
    # analytic PE row for position p: sin/cos(p * div_term) interleaved
    div_term = np.exp(
        np.arange(0, d, 2).astype(np.float32) * (-np.log(10000.0) / d)
    )
    def pe_row(p):
        ang = p.astype(jnp.float32) * jnp.asarray(div_term)
        row = jnp.zeros((d,), jnp.float32)
        row = row.at[0::2].set(jnp.sin(ang))
        row = row.at[1::2].set(jnp.cos(ang)[: d // 2])
        return row

    def layer_norm(x, scale, bias):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mean2 - mean * mean)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def mish(v):
        return v * jnp.tanh(jax.nn.softplus(v))

    def attend(q, Kring, Vring, t):
        # q (B, d); rings (rf, B, d); window = positions [t-rf, t-1] with
        # only min(t, rf) slots valid during warm-up
        qh = q.reshape(B, nH, dH)
        kh = Kring.reshape(rf, B, nH, dH)
        vh = Vring.reshape(rf, B, nH, dH)
        scores = jnp.einsum("bhd,rbhd->bhr", qh, kh) * inv_sqrt_dh
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, rf), 2)
            < jnp.minimum(t, rf)
        )
        scores = jnp.where(valid, scores, big_neg)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhr,rbhd->bhd", p, vh)
        return out.reshape(B, d)

    def unpack(weights):
        w = list(weights)
        embed = w.pop(0)
        self_w = [w.pop(0) for _ in range(8)]
        cross_w = [w.pop(0) for _ in range(8)]
        ln_w = [w.pop(0) for _ in range(6)]
        ffn_w = [w.pop(0) for _ in range(4)]
        final_w = [w.pop(0), w.pop(0)] if with_final_ln else None
        return embed, self_w, cross_w, ln_w, ffn_w, final_w, w

    def fn(weights, prompt_T, rng, temp, t0, state):
        embed, self_w, cross_w, ln_w, ffn_w, final_w, head = unpack(weights)
        tok_c, sK, sV, cK, cV = state
        t0 = jnp.asarray(t0, jnp.int32)

        def body(carry, i):
            tok_c, sK, sV, cK, cV, rng = carry
            t = t0 + i
            s = t - 1  # position pushed this iteration
            prev = tok_c[0]
            tokp = prompt_T[jnp.minimum(s, prior_t - 1)]
            tok = jnp.where(s < prior_t, tokp, prev)

            x0 = embed[tok] + pe_row(s)[None, :]
            slot = s % rf
            x = x0
            for l in range(L):
                Wq, bq, Wk, bk, Wv, bv, Wo, bo = (t_[l] for t_ in self_w)
                k_new = x @ Wk + bk
                v_new = x @ Wv + bv
                sK = sK.at[l, slot].set(k_new)
                sV = sV.at[l, slot].set(v_new)
                q = x @ Wq + bq
                a = attend(q, sK[l], sV[l], t)
                x = layer_norm(
                    x + (a @ Wo + bo), ln_w[0][l], ln_w[1][l]
                )
                Wq, bq, Wk, bk, Wv, bv, Wo, bo = (t_[l] for t_ in cross_w)
                cK = cK.at[l, slot].set(x0 @ Wk + bk)
                cV = cV.at[l, slot].set(x0 @ Wv + bv)
                q = x @ Wq + bq
                a = attend(q, cK[l], cV[l], t)
                x = layer_norm(
                    x + (a @ Wo + bo), ln_w[2][l], ln_w[3][l]
                )
                h = jnp.maximum(x @ ffn_w[0][l] + ffn_w[1][l], 0.0)
                x = layer_norm(
                    x + (h @ ffn_w[2][l] + ffn_w[3][l]),
                    ln_w[4][l],
                    ln_w[5][l],
                )
            if final_w is not None:
                x = layer_norm(x, final_w[0][0], final_w[1][0])

            hh = x
            for k in range(n_head_dense - 1):
                hh = mish(hh @ head[2 * k] + head[2 * k + 1])
            logits = hh @ head[-2] + head[-1]
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(
                    sub, logits / temp, axis=-1
                ).astype(jnp.int32)

            tok_t = jnp.where(
                t < prior_t, prompt_T[jnp.minimum(t, prior_t - 1)], nxt
            )
            tok_c = jnp.broadcast_to(tok_t[None, :], (8, B))
            return (tok_c, sK, sV, cK, cV, rng), tok_t

        (tok_c, sK, sV, cK, cV, rng), out_T = jax.lax.scan(
            body, (tok_c, sK, sV, cK, cV, rng), jnp.arange(chunk)
        )
        return out_T, [tok_c, sK, sV, cK, cV]

    def init_state():
        return [
            jnp.zeros((8, B), jnp.int32),
            jnp.zeros((L, rf, B, d), jnp.float32),
            jnp.zeros((L, rf, B, d), jnp.float32),
            jnp.zeros((L, rf, B, d), jnp.float32),
            jnp.zeros((L, rf, B, d), jnp.float32),
        ]

    fn.init_state = init_state
    return fn


def transformer_kv_weight_fuse(weights, num_layers: int, with_final_ln: bool):
    """Re-pack ``transformer_weight_pack`` output for the fused KV kernel:
    self q/k/v kernels concatenate to one (L, d, 3d) matmul, and ALL
    layers' cross k/v kernels concatenate to one (d, 2*L*d) matmul — the
    cross K/V of every layer project the same PE'd input x0, so the kernel
    hoists them into a single MXU pass per step.  Pure jnp (runs under the
    caller's jit, once per trace)."""
    L = num_layers
    w = list(weights)
    embed = w.pop(0)
    self_w = [w.pop(0) for _ in range(8)]
    cross_w = [w.pop(0) for _ in range(8)]
    ln_w = [w.pop(0) for _ in range(6)]
    ffn_w = [w.pop(0) for _ in range(4)]
    final_w = [w.pop(0), w.pop(0)] if with_final_ln else []
    sWq, sbq, sWk, sbk, sWv, sbv, sWo, sbo = self_w
    cWq, cbq, cWk, cbk, cWv, cbv, cWo, cbo = cross_w
    # (L, d, d) x2 -> (d, 2*L*d) with per-layer [k|v] lane blocks
    cWkv_all = jnp.concatenate(
        [jnp.concatenate([cWk[l], cWv[l]], axis=1) for l in range(L)], axis=1
    )
    cbkv_all = jnp.concatenate(
        [jnp.concatenate([cbk[l], cbv[l]], axis=1) for l in range(L)], axis=1
    )
    out = [embed]
    out += [
        jnp.concatenate([sWq, sWk, sWv], axis=2),  # (L, d, 3d)
        jnp.concatenate([sbq, sbk, sbv], axis=2),  # (L, 1, 3d)
        sWo, sbo,
        cWq, cbq,
        cWkv_all,  # (d, 2*L*d)
        cbkv_all,  # (1, 2*L*d)
        cWo, cbo,
    ]
    out += ln_w + ffn_w + final_w + w
    return out


@functools.lru_cache(maxsize=16)
def make_transformer_kv_ring_pallas(
    model_dim: int,
    n_heads: int,
    feedforward_dim: int,
    num_layers: int,
    rf: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    with_final_ln: bool,
    B: int,
    prior_t: int,
    chunk: int,
    argmax: bool,
    bf16: bool = False,
    interpret: bool = False,
):
    """Fused-kernel version of ``make_transformer_kv_ring_decoder``: the
    whole O(1)-per-step KV-ring decode runs inside one Pallas kernel with
    weights + rings resident in VMEM, ``chunk`` steps per call, state
    carried across calls (the serving pattern of the chunked SampleRNN /
    WaveNet kernels).

    ``bf16=True`` stores the WEIGHTS — including biases and the
    layer-norm scale/bias — in bfloat16; dot products ACCUMULATE in f32
    (``preferred_element_type=f32``) and the softmax/LN arithmetic runs
    on f32 intermediates, but dot *inputs* are rounded to bf16 and the
    bf16 biases/affines inject bf16 rounding into the adds — slightly
    looser than a pure weights-only cast (in practice indistinguishable:
    TPU default precision already multiplies f32 operands via one bf16
    pass).  The step is
    VMEM-bandwidth-bound — each step streams all weights plus the whole
    ring through the MXU/VPU — and the weights are the bigger half of
    that traffic at moderate B, so halving their footprint is the lever
    (the MXU *rate* is unchanged: f32 operands already multiply in one
    bf16 pass at TPU default precision).  The K/V ring itself stays f32:
    its per-step write is ONE row per (layer, stream) at a dynamic slot
    offset, and Mosaic rejects single-row dynamic stores into bf16
    arrays (bf16 packs two rows per sublane tile —
    ``tpu.vector_store vector<1x...xbf16>`` fails to compile on v5e;
    probed 2026-08-20).  Tokens carry bf16 rounding and may drift from
    the f32 kernel (same documented divergence as ``MMK_DECODE_BF16`` on
    the window refeed).

    Why this exists: the pure-jax KV scan is dispatch-latency-bound at
    ~195 µs/step regardless of batch (each step issues ~150 small HLO ops)
    = 0.32x realtime per stream; the window-REFEED kernels are FLOPs-bound
    at O(rf)/step, which no hardware serves at 16 kHz for the 8-layer net
    (physics note in ``benchmarks/bench_decode.py``).  In-kernel, one step
    is ~140 small VMEM-resident matmuls with zero inter-op overhead.

    Layout: activations are REPLICATED to 8 rows per stream (rows 8s..8s+7
    identical) so every tensor keeps >=8 sublanes — per-row ops preserve
    the replication, and replication in/out of per-stream form is done
    with selector matmuls (Mosaic rejects sub-8-row broadcasts/reshapes).
    All four K/V rings merge into ONE stream-major ``(L*B*rf, 4d)`` VMEM
    array (row ``l*B*rf + s*rf + slot``, lanes ``[selfK|selfV|crossK|
    crossV]``) carried in -> out each call — a step then issues ONE ring
    row write per (layer, stream) instead of four, and every layer's
    cross K/V (all projections of the same PE'd x0) hoist into a single
    (8B, 2*L*d) matmul per step.  Attention over all B streams batches
    as: replicate q over each stream's ring rows (selector matmul),
    elementwise-multiply with the ring's K lanes, head-sum via a (d, nH)
    block selector, per-stream-per-head softmax (per-BLOCK max — the
    JukeBox 0/0-NaN lesson), expand probs back over lanes via the
    transposed selector, weight the V lanes elementwise, and segment-sum
    each stream's rf rows with one (8B, B*rf) selector matmul.

    Semantics == the oracle decoder (argmax token-identical, pinned in
    interpret mode); sampled draws use the TPU PRNG Gumbel path, an
    independent stream from the oracle's ``jax.random.categorical``.

    Returns ``fn(weights, prompt_T, seed, temp, t0, state) ->
    (out_chunk_T (chunk, B) i32, new_state)`` with ``state = [tok (8, B)
    i32, ring (L*B*rf, 4d) f32]``; weights =
    ``transformer_kv_weight_fuse(transformer_weight_pack(params))``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = model_dim
    nH = n_heads
    dH = d // nH
    L = num_layers
    Q = q_levels
    import os as _os

    # Activation row replication.  Narrow batches replicate each stream's
    # activation row 8x so every tensor keeps >= 8 sublanes (Mosaic
    # rejects sub-8-row broadcasts/reshapes; B=1 needs this).  At
    # B % 8 == 0 the B stream rows are ALREADY sublane-tile-aligned, so
    # rep drops to 1 and every per-step op shrinks 8x (b16: 128-row dots
    # -> 16-row dots) — the round-4 breakdown's "wide-B wall" was mostly
    # replicated-row throughput, not op-issue latency.  MMK_KV_NOREP=0
    # forces the replicated layout (probe A/B knob).
    rep = 1 if (B % 8 == 0 and _os.environ.get("MMK_KV_NOREP") != "0") else 8
    R8 = rep * B
    BR = B * rf
    # Wide batches use a SLOT-MAJOR ring layout (row = l*rf*B + slot*B + s
    # instead of l*B*rf + s*rf + slot): all B streams' rows for one slot
    # are contiguous, so the per-step ring update is ONE B-row dynamic
    # store instead of B single-row stores (128 -> 8 stores/step at B=16,
    # L=8), and the per-stream softmax max/sum becomes a log2(rf)
    # elementwise tree + two tiny selector matmuls instead of 2*B
    # slice+concat chains per attend (~512 -> ~130 small serial ops/step
    # at B=16 — the "serial small-op-latency-bound" wall the round-4
    # breakdown measured).  Gated on B % 8 == 0 (the B-row store stays
    # sublane-tile-aligned) and power-of-two rf (the tree halves evenly);
    # narrow batches keep the stream-major layout, which measured faster
    # at B<8 (fewer rows in flight beats fewer ops).  The layout is
    # kernel-internal: state is opaque to callers and the degrade path
    # restarts streams from the prompt.
    # MMK_KV_SLOT_MAJOR=0 forces stream-major (always safe); =1 forces
    # slot-major where the structural gate allows; default "auto" = the
    # gate below.  Probe knob for the layout A/B (benchmarks/
    # probe_kv_slotmajor.py) — the default is chosen from hardware
    # measurements, see the gate comment.
    _sm_env = _os.environ.get("MMK_KV_SLOT_MAJOR", "auto")
    slot_major = (
        B % 8 == 0 and rf >= 2 and (rf & (rf - 1)) == 0 and _sm_env != "0"
    )
    _unroll_layers = _os.environ.get("MMK_KV_UNROLL", "0") == "1"
    # operand dtype for weights + ring; every `.astype(dt)` below is a
    # no-op on the f32 path so the two variants share one kernel body
    dt = jnp.bfloat16 if bf16 else jnp.float32
    inv_sqrt_dh = 1.0 / float(np.sqrt(dH))
    big_neg = float(np.finfo(np.float32).min)
    # embed + fused self (4) + fused cross (6) + ln (6) + ffn (4)
    n_weights = 1 + 4 + 6 + 6 + 4 + (2 if with_final_ln else 0) + 2 * n_head_dense
    n_rings = 1

    def kernel(t0_ref, temp_ref, seed_ref, prompt_ref, pe_ref, *refs):
        w = list(refs[:n_weights])
        state_in = refs[n_weights : n_weights + 1 + n_rings]
        out_ref = refs[n_weights + 1 + n_rings]
        tok_ref = refs[n_weights + 2 + n_rings]
        ring = refs[n_weights + 3 + n_rings]
        ckv_scr = refs[n_weights + 4 + n_rings]  # (L, 8B, 2d) scratch

        embed = w.pop(0)
        sWqkv, sbqkv, sWo, sbo = (w.pop(0) for _ in range(4))
        cWq, cbq, cWkv, cbkv, cWo, cbo = (w.pop(0) for _ in range(6))
        ln_w = [w.pop(0) for _ in range(6)]
        ffn_w = [w.pop(0) for _ in range(4)]
        final_w = [w.pop(0), w.pop(0)] if with_final_ln else None
        head = w

        if not argmax:
            pltpu.prng_seed(seed_ref[0])

        # tok/ring inputs are aliased onto the outputs (in-place state):
        # the refs already hold the carried state — no entry copy.  The
        # old whole-ring copy materialized an (L*B*rf, 4d) stack
        # temporary that blew the 16 MiB scoped-VMEM limit at B>=4.
        del state_in

        t0 = t0_ref[0]

        # static selector / mask tensors (built once, live across the loop)
        f32 = jnp.float32
        rq = jax.lax.broadcasted_iota(jnp.int32, (BR, R8), 0)
        cq = jax.lax.broadcasted_iota(jnp.int32, (BR, R8), 1)
        # replicate each stream's q row over its rf ring rows; the 1/8
        # averages the 8 identical replicas and the score scale folds in
        # (ring row r belongs to stream r % B slot-major, r // rf
        # stream-major)
        stream_of = (rq % B) if slot_major else (rq // rf)
        REPQ = (stream_of == cq // rep).astype(f32) * (
            inv_sqrt_dh / float(rep)
        )
        rh = jax.lax.broadcasted_iota(jnp.int32, (d, nH), 0)
        ch = jax.lax.broadcasted_iota(jnp.int32, (d, nH), 1)
        SELH = (rh // dH == ch).astype(f32)  # head-block column selector
        rhT = jax.lax.broadcasted_iota(jnp.int32, (nH, d), 0)
        chT = jax.lax.broadcasted_iota(jnp.int32, (nH, d), 1)
        SELHT = (rhT == chT // dH).astype(f32)
        ro = jax.lax.broadcasted_iota(jnp.int32, (R8, BR), 0)
        co = jax.lax.broadcasted_iota(jnp.int32, (R8, BR), 1)
        # segment-sum + replicate
        OUTSEL = (
            (ro // rep == co % B) if slot_major else (ro // rep == co // rf)
        ).astype(f32)
        rb = jax.lax.broadcasted_iota(jnp.int32, (R8, B), 0)
        cb = jax.lax.broadcasted_iota(jnp.int32, (R8, B), 1)
        REPB = (rb // rep == cb).astype(f32)  # (B, x) rows -> (rep*B, x)
        riota = jax.lax.broadcasted_iota(jnp.int32, (BR, nH), 0)
        slotpos = (riota // B) if slot_major else jax.lax.rem(riota, rf)
        qiota = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1).astype(f32)
        if slot_major:
            # (B, rep*B) single-1 row picker: row s <- replicated row rep*s
            rp = jax.lax.broadcasted_iota(jnp.int32, (B, R8), 0)
            cp = jax.lax.broadcasted_iota(jnp.int32, (B, R8), 1)
            PICKB = (cp == rep * rp).astype(f32)
            # (BR, B) broadcast-back selector and its (B, BR) transpose
            rm = jax.lax.broadcasted_iota(jnp.int32, (BR, B), 0)
            cm = jax.lax.broadcasted_iota(jnp.int32, (BR, B), 1)
            MB = (rm % B == cm).astype(f32)
            rz = jax.lax.broadcasted_iota(jnp.int32, (B, BR), 0)
            cz = jax.lax.broadcasted_iota(jnp.int32, (B, BR), 1)
            ZS = (cz % B == rz).astype(f32)

        def layer_norm(x, scale, bias):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
            var = jnp.maximum(0.0, mean2 - mean * mean)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        def mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        def attend(q, k_off, l, vcount):
            # q (8B, d) replicated rows; the merged ring row-sliced at
            # layer l, K/V lane blocks at k_off / k_off + d
            Kl = ring[pl.ds(l * BR, BR), pl.ds(k_off, d)]  # (B*rf, d)
            Vl = ring[pl.ds(l * BR, BR), pl.ds(k_off + d, d)]
            Qrep = jnp.dot(REPQ, q, preferred_element_type=f32)  # (B*rf, d)
            S = jnp.dot(Kl * Qrep, SELH, preferred_element_type=f32)
            S = jnp.where(slotpos < vcount, S, big_neg)  # (B*rf, nH)
            # per-stream-per-head max (a global max can underflow a weak
            # stream's whole block to 0/0)
            if slot_major:
                # rows slot*B+s: halving the row range maxes slot k with
                # slot k+half FOR ALL streams at once — log2(rf)
                # elementwise ops instead of 2*B slice+concat chains,
                # then tiny selector matmuls broadcast/segment-sum
                X = S
                while X.shape[0] > B:
                    h = X.shape[0] // 2
                    X = jnp.maximum(X[:h], X[h:])
                Mexp = jnp.dot(MB, X, preferred_element_type=f32)
                E = jnp.exp(S - Mexp)
                Zb = jnp.dot(ZS, E, preferred_element_type=f32)
                P = E / jnp.dot(MB, Zb, preferred_element_type=f32)
            else:
                # broadcast back by add-zeros
                zero_blk = jnp.zeros((rf, nH), f32)
                Mexp = jnp.concatenate(
                    [
                        jnp.max(
                            S[s * rf : (s + 1) * rf, :], axis=0,
                            keepdims=True
                        )
                        + zero_blk
                        for s in range(B)
                    ],
                    axis=0,
                )
                E = jnp.exp(S - Mexp)
                Zexp = jnp.concatenate(
                    [
                        jnp.sum(
                            E[s * rf : (s + 1) * rf, :], axis=0,
                            keepdims=True
                        )
                        + zero_blk
                        for s in range(B)
                    ],
                    axis=0,
                )
                P = E / Zexp
            Pd = jnp.dot(P, SELHT, preferred_element_type=f32)  # (B*rf, d)
            return jnp.dot(OUTSEL, Vl * Pd, preferred_element_type=f32)

        def ring_write(l, slot, rows):
            # rows (8B, 4d) [selfK|selfV|crossK|crossV]
            if slot_major:
                # pick row rep*s per stream (single-1 selector: exact —
                # identity skip at rep=1) and store ALL B streams' rows
                # contiguously in one sublane-aligned B-row dynamic store
                rows_B = (
                    rows
                    if rep == 1
                    else jnp.dot(PICKB, rows, preferred_element_type=f32)
                )
                ring[pl.ds(l * BR + slot * B, B), :] = rows_B
            else:
                # store each stream's (replicated) row at its slot —
                # ONE write per stream
                for s in range(B):
                    ring[pl.ds(l * BR + s * rf + slot, 1), :] = rows[
                        rep * s : rep * s + 1, :
                    ]

        def body(i, _):
            t = t0 + i
            s_pos = t - 1  # position pushed this iteration
            slot = jax.lax.rem(s_pos, rf)
            vcount = jnp.minimum(t, rf)

            prev_gen = out_ref[pl.ds(jnp.maximum(i - 1, 0), 1), :]
            carried = tok_ref[pl.ds(0, 1), :]
            prev = jnp.where(i >= 1, prev_gen, carried)  # (1, B)
            tokp = prompt_ref[pl.ds(jnp.minimum(s_pos, prior_t - 1), 1), :]
            tok = jnp.where(s_pos < prior_t, tokp, prev)  # (1, B) i32

            tokcol = tok.reshape(B, 1).astype(f32)
            tok8 = (
                tokcol
                if rep == 1
                else jnp.dot(REPB, tokcol, preferred_element_type=f32)
            )
            oh = (tok8 == qiota).astype(dt)  # (8B, Q)
            x0 = jnp.dot(oh, embed[:], preferred_element_type=f32)
            x0 = x0 + pe_ref[pl.ds(i, 1), :]
            # every layer's cross K/V project the same x0: ONE matmul,
            # per-layer [k|v] lane blocks (8B, 2*L*d), staged into a 3D
            # scratch (static lane slices here; the layer loop below then
            # indexes the MAJOR dim dynamically — Mosaic rejects dynamic
            # LANE offsets but not dynamic major-dim loads)
            ckv_all = (
                jnp.dot(x0.astype(dt), cWkv[:], preferred_element_type=f32)
                + cbkv[:]
            )
            for sl in range(L):
                ckv_scr[pl.ds(sl, 1), :, :] = ckv_all[
                    :, 2 * sl * d : 2 * (sl + 1) * d
                ].reshape(1, R8, 2 * d)

            # one lax.fori_loop over layers instead of an unrolled body:
            # 8x smaller Mosaic program -> minutes less compile time (the
            # unrolled kernel took 300-700 s to compile on v5e); weights
            # are dynamically indexed on their (major) layer dim
            def wl(ref, l):
                v = ref[pl.ds(l, 1)]
                return v.reshape(v.shape[1:])

            def layer_body(l, x):
                qkv = (
                    jnp.dot(
                        x.astype(dt), wl(sWqkv, l),
                        preferred_element_type=f32,
                    )
                    + wl(sbqkv, l)
                )  # (8B, 3d)
                ring_write(
                    l, slot,
                    jnp.concatenate(
                        [qkv[:, d:], wl(ckv_scr, l)], axis=1
                    ),
                )
                a = attend(qkv[:, :d], 0, l, vcount)
                x = layer_norm(
                    x
                    + jnp.dot(
                        a.astype(dt), wl(sWo, l), preferred_element_type=f32
                    )
                    + wl(sbo, l),
                    wl(ln_w[0], l),
                    wl(ln_w[1], l),
                )
                q = (
                    jnp.dot(
                        x.astype(dt), wl(cWq, l), preferred_element_type=f32
                    )
                    + wl(cbq, l)
                )
                a = attend(q, 2 * d, l, vcount)
                x = layer_norm(
                    x
                    + jnp.dot(
                        a.astype(dt), wl(cWo, l), preferred_element_type=f32
                    )
                    + wl(cbo, l),
                    wl(ln_w[2], l),
                    wl(ln_w[3], l),
                )
                h = (
                    jnp.dot(
                        x.astype(dt), wl(ffn_w[0], l),
                        preferred_element_type=f32,
                    )
                    + wl(ffn_w[1], l)
                )
                h = jnp.maximum(h, 0.0)
                return layer_norm(
                    x
                    + jnp.dot(
                        h.astype(dt), wl(ffn_w[2], l),
                        preferred_element_type=f32,
                    )
                    + wl(ffn_w[3], l),
                    wl(ln_w[4], l),
                    wl(ln_w[5], l),
                )

            # MMK_KV_UNROLL=1 restores the statically-unrolled layer body
            # (pre-31b5fa3): the fori_loop's dynamically-indexed weight
            # loads cost ~20% of the step at wide B (b16 measured; the
            # fori_loop change was only re-measured at b1/b4 where it is
            # ~0/+5%) in exchange for an L-times-smaller Mosaic program
            # (minutes less first-compile — amortized away by the
            # default-on persistent compile cache).
            if _unroll_layers:
                x = x0
                for _l in range(L):
                    x = layer_body(_l, x)
            else:
                x = jax.lax.fori_loop(0, L, layer_body, x0)
            if with_final_ln:
                x = layer_norm(x, final_w[0][:], final_w[1][:])

            if B == 1:
                last = x[0:1, :]
            elif rep == 1:
                last = x  # rows ARE the streams — nothing to pick
            elif slot_major:
                # one picker matmul instead of B slice+concat ops
                last = jnp.dot(PICKB, x, preferred_element_type=f32)
            else:
                last = jnp.concatenate(
                    [x[rep * s : rep * s + 1, :] for s in range(B)], axis=0
                )  # (B, d)
            hh = last
            for kk in range(n_head_dense - 1):
                hh = mish(
                    jnp.dot(
                        hh.astype(dt), head[2 * kk][:],
                        preferred_element_type=f32,
                    )
                    + head[2 * kk + 1][:]
                )
            logits = (
                jnp.dot(
                    hh.astype(dt), head[-2][:], preferred_element_type=f32
                )
                + head[-1][:]
            )  # (B, Q + 1)
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits = logits / temp_ref[0, 0]
                bits = pltpu.prng_random_bits((B, Q))
                b24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = b24.astype(f32) * (1.0 / (1 << 24)) + 1e-12
                nxt = jnp.argmax(
                    logits + (-jnp.log(-jnp.log(u))), axis=-1
                ).astype(jnp.int32)

            tok_t = jnp.where(
                t < prior_t,
                prompt_ref[pl.ds(jnp.minimum(t, prior_t - 1), 1), :][0],
                nxt,
            )
            out_ref[pl.ds(i, 1), :] = tok_t[None, :]
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

        last = out_ref[pl.ds(chunk - 1, 1), :]
        tok_ref[:] = jnp.broadcast_to(last, (8, B))

    state_shapes = [
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((L * BR, 4 * d), jnp.float32),
    ]

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((chunk, B), jnp.int32)]
        + state_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t0 (1,)
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prompt (prior_t, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # PE chunk (chunk, d)
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)],
            *[
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(1 + n_rings)
            ],
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM)
            for _ in range(2 + n_rings)
        ],
        # the hoisted cross-K/V products staged per layer for the
        # dynamic-major-dim reads inside the layer fori_loop
        scratch_shapes=[pltpu.VMEM((L, R8, 2 * d), jnp.float32)],
        # carry tok/ring in place: inputs (t0, temp, seed, prompt, pe,
        # weights..., tok, ring) -> outputs (out, tok, ring).  Aliasing
        # keeps the ring out of the scoped-VMEM stack (16 MiB on v5e),
        # which bounded the old copy-through version at B<=3.
        input_output_aliases={
            5 + n_weights: 1,
            5 + n_weights + 1: 2,
        },
        interpret=interpret,
    )

    # analytic absolute PE rows for the chunk's pushed positions
    div_term = np.exp(
        np.arange(0, d, 2).astype(np.float32) * (-np.log(10000.0) / d)
    )

    def pe_chunk(t0):
        p = (t0 - 1 + jnp.arange(chunk)).astype(jnp.float32)
        ang = p[:, None] * jnp.asarray(div_term)[None, :]
        pe = jnp.zeros((chunk, d), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(ang))
        return pe.at[:, 1::2].set(jnp.cos(ang)[:, : d // 2])

    def fn(weights, prompt_T, seed, temp, t0, state):
        if bf16:
            # cast under the caller's jit (fuses with the weight re-pack);
            # only the bf16 copies reach VMEM as kernel operands
            weights = [
                w.astype(jnp.bfloat16) if w.dtype == jnp.float32 else w
                for w in weights
            ]
        t0 = jnp.asarray(t0, jnp.int32)
        outs = call(
            t0.reshape(1),
            jnp.asarray(temp, jnp.float32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            prompt_T.astype(jnp.int32),
            pe_chunk(t0),
            *weights,
            *state,
        )
        return outs[0], list(outs[1:])

    def init_state():
        return [jnp.zeros(s.shape, s.dtype) for s in state_shapes]

    fn.init_state = init_state
    return fn


def supports_pallas_jukebox(net) -> bool:
    """True for the standard JukeBox shape: framed-linear mu-law inputs,
    Mish/ReLU post-norm tier blocks with sinusoidal PE, linear up-samplers,
    framed-conv bottom tier and one learned-temperature MLP head — exactly
    the configuration ``JukeBox.from_config`` builds from ``mulaw_io``
    (reference semantics ``transformers.py:262-421`` in the reference).
    ``ref_compat`` is excluded: its Conv1dResampler scramble permutes the
    bottom input in a way the kernel does not reproduce."""
    cfg = net.config
    if type(net).__name__ != "JukeBox":
        return False
    try:
        from ..features.functionals import Discrete
        from ..modules.io import FramedLinearIO
    except Exception:  # pragma: no cover
        return False
    if getattr(cfg, "ref_compat", False) or getattr(cfg, "weight_norm", False):
        return False
    if cfg.with_layer_norm or cfg.norm_first or cfg.dropout:
        return False
    if cfg.positional_encoding is None:
        return False
    if str(cfg.layer_activation) not in ("Mish", "ReLU"):
        return False
    if cfg.model_dim % cfg.n_heads != 0 or len(cfg.frame_sizes) < 2:
        return False
    fs = tuple(cfg.frame_sizes)
    W = net._window_len()
    if (W - fs[0]) <= 0:
        return False
    for i, f in enumerate(fs[:-1]):
        if (W - fs[0]) % f:
            return False
        nxt = fs[i + 1] if i < len(fs) - 2 else 1
        if f % nxt:
            return False
    io = cfg.io_spec
    if len(io.inputs) != 1 or len(io.targets) != 1:
        return False
    if not isinstance(io.inputs[0].elem_type, Discrete):
        return False
    if not isinstance(io.inputs[0].module, FramedLinearIO):
        return False
    act = getattr(io.inputs[0].module, "activation", None)
    if act is not None and str(getattr(act, "act", "Identity")) != "Identity":
        return False
    t_mod = io.targets[0].module
    if type(t_mod).__name__ != "MLPIO" or t_mod.min_temperature is None:
        return False
    if not _head_is_plain_mish(t_mod):
        return False
    if getattr(t_mod, "weight_norm", False):
        return False
    obj = io.targets[0].objective
    if str(getattr(obj, "objective_type", "")) != "categorical_dist":
        return False
    return True


def jukebox_weight_pack(params, n_tiers: int, num_layers: int,
                        tier_rows: Tuple[int, ...] = (),
                        head_rows: int = 1):
    """Flatten the JukeBox param tree into the kernel's argument list:
    per non-bottom tier [input Dense, stacked attn/ln/ffn layers, up
    Dense], then the bottom framed Dense, then the MLP head.  Layer
    stacking/flattening follows ``transformer_weight_pack``, except the
    q/k/v projections fuse into one (d, 3d) matmul per attention, and
    every bias/LN row is PRE-TILED to its consumer's row count
    (``tier_rows[i]`` = B*n_frames_i, ``head_rows`` = B): Mosaic rejects
    (1, X) -> (rows, X) sublane broadcasts onto sub-8-row tiles
    ("Invalid input layout"), so the kernel adds are shape-exact."""
    L = num_layers

    def rows_for(t):
        return tier_rows[t] if t < len(tier_rows) else 1

    def tile_rows(x, rows):
        # tile the second-to-last (row) axis: (1, X) -> (rows, X),
        # stacked (L, 1, X) -> (L, rows, X)
        reps = (1,) * (x.ndim - 2) + (rows, 1)
        return jnp.tile(x, reps)

    def attn(tp, i, name):
        a = tp["model"][f"block{i}"][name]
        d = a["out"]["kernel"].shape[-1]
        Wqkv = jnp.concatenate(
            [
                a[part]["kernel"].reshape(d, -1)
                for part in ("query", "key", "value")
            ],
            axis=1,
        )
        bqkv = jnp.concatenate(
            [
                a[part]["bias"].reshape(1, -1)
                for part in ("query", "key", "value")
            ],
            axis=1,
        )
        return [
            Wqkv,
            bqkv,
            a["out"]["kernel"].reshape(-1, d),
            a["out"]["bias"].reshape(1, -1),
        ]

    def stack(getter):
        return [
            jnp.stack([getter(i)[k] for i in range(L)])
            for k in range(len(getter(0)))
        ]

    out = []
    for t in range(n_tiers - 1):
        rows = rows_for(t)
        tp = params[f"tiers_{t}"]
        din = tp["input_module"]["heads_0"]["core"]["Dense_0"]
        out += [din["kernel"], tile_rows(din["bias"].reshape(1, -1), rows)]
        for name in ("self_attn", "cross_attn"):
            a = stack(lambda i, tp=tp, name=name: attn(tp, i, name))
            a[1] = tile_rows(a[1], rows)  # bqkv
            a[3] = tile_rows(a[3], rows)  # bo
            out += a
        out += [
            tile_rows(s, rows)
            for s in stack(
                lambda i, tp=tp: [
                    tp["model"][f"block{i}"][f"ln{k}"][p].reshape(1, -1)
                    for k in (1, 2, 3)
                    for p in ("scale", "bias")
                ]
            )
        ]
        ffn = stack(
            lambda i, tp=tp: [
                tp["model"][f"block{i}"]["Dense_0"]["kernel"],
                tp["model"][f"block{i}"]["Dense_0"]["bias"].reshape(1, -1),
                tp["model"][f"block{i}"]["Dense_1"]["kernel"],
                tp["model"][f"block{i}"]["Dense_1"]["bias"].reshape(1, -1),
            ]
        )
        ffn[1] = tile_rows(ffn[1], rows)
        ffn[3] = tile_rows(ffn[3], rows)
        out += ffn
        up = tp["up_sampler"]["Dense_0"]
        out += [up["kernel"], tile_rows(up["bias"].reshape(1, -1), rows)]
    bot = params[f"tiers_{n_tiers - 1}"]["input_module"]["heads_0"]["core"]
    bot = bot["Conv1dResampler_0"]["Dense_0"]
    out += [bot["kernel"], tile_rows(bot["bias"].reshape(1, -1), head_rows)]
    core = params["output_modules_0"]["estimator"]["core"]
    k = 0
    while f"Dense_{k}" in core:
        dd = core[f"Dense_{k}"]
        out += [dd["kernel"], tile_rows(dd["bias"][None, :], head_rows)]
        k += 1
    return out


@functools.lru_cache(maxsize=16)
def make_jukebox_pallas_decoder(
    frame_sizes: Tuple[int, ...],
    model_dim: int,
    n_heads: int,
    feedforward_dim: int,
    num_layers: int,
    window: int,
    q_levels: int,
    n_head_dense: int,
    min_temperature: float,
    layer_activation: str,
    pe_max_len: int,
    B: int,
    n_steps: int,
    argmax: bool,
    interpret: bool = False,
    carry_window: bool = False,
):
    """Whole-AR-loop fused decode for JukeBox's tier pyramid.

    Reproduces the sliding-window scan decoder step for step (incl. the
    one-token decode lead, ``JukeBox._decode_win_lead``): linearize the
    window, run every non-bottom tier (framed Dense → +upper → +PE →
    post-norm self/cross/FFN blocks → tanh → linear up-sample), then —
    because eval only reads the LAST bottom position — one framed Dense
    over the window's final ``fs_bottom`` tokens plus the last up-sampled
    row, the learned-temperature MLP head, and the sampled token shifts
    the window.  All weights stay in VMEM across the generation; the only
    carried state is the (B, W) token window whose final slot is the
    never-read placeholder for the position being predicted.

    Tier activations live FRAME-MAJOR: row ``r*B + s`` is frame ``r`` of
    stream ``s``.  That makes the framing and tier de-interleave op counts
    independent of B (whole-(B, f) sublane concats instead of single-row
    gathers) and lets one stream×head block-diagonal attention
    (``_bd_attend`` with ``stream_stride=B``) cover the entire batch in 5
    full-width ops — the fused kernel then scales to multi-stream serving
    instead of falling back to the window scan.

    Returns ``fn(weights_list, window_i32 (B, W), seed, temp) ->
    (B, n_steps) int32`` (generated tokens only); with
    ``carry_window=True`` returns ``(tokens, final_window)`` so a stream
    can continue EXACTLY from the carried window without re-feeding.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs = tuple(int(f) for f in frame_sizes)
    fs0 = fs[0]
    d = model_dim
    nH = n_heads
    dH = d // nH
    ff = feedforward_dim
    L = num_layers
    Q = q_levels
    W = window
    n_up = len(fs) - 1  # non-bottom tiers
    span = W - fs0  # tokens each tier reads past its leading context
    n_frames = [span // f for f in fs[:-1]]
    t_up = [
        fs[i] // (fs[i + 1] if i < n_up - 1 else 1) for i in range(n_up)
    ]
    fs_b = fs[-1]
    # 2 input-Dense + per-layer (4 self + 4 cross [qkv fused] + 6 ln +
    # 4 ffn) + 2 up
    per_tier = 2 + 18 + 2
    n_weights = n_up * per_tier + 2 + 2 * n_head_dense

    from ..networks.transformers import sinusoidal_pe

    pe_tabs = [
        np.repeat(sinusoidal_pe(pe_max_len, d)[:n], B, axis=0)
        for n in n_frames
    ]  # per tier: (n_i*B, d) frame-major — row r*B+s carries pe[r]
    big_neg = float(np.finfo(np.float32).min)
    inv_sqrt_dh = 1.0 / float(np.sqrt(dH))

    def kernel(temp_ref, seed_ref, win0_ref, *refs):
        pes = list(refs[: n_up])
        w = list(refs[n_up : n_up + n_weights])
        out_ref = refs[n_up + n_weights]
        win_ref = refs[n_up + n_weights + 1]

        tiers = []
        for _ in range(n_up):
            tiers.append(
                dict(
                    w_in=w.pop(0), b_in=w.pop(0),
                    self_w=[w.pop(0) for _ in range(4)],
                    cross_w=[w.pop(0) for _ in range(4)],
                    ln_w=[w.pop(0) for _ in range(6)],
                    ffn_w=[w.pop(0) for _ in range(4)],
                    w_up=w.pop(0), b_up=w.pop(0),
                )
            )
        w_bot, b_bot = w.pop(0), w.pop(0)
        head = w

        if not argmax:
            pltpu.prng_seed(seed_ref[0])
        win_ref[:] = win0_ref[:]

        def layer_norm(x, scale, bias):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
            var = jnp.maximum(0.0, mean2 - mean * mean)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        def mish(v):
            return v * jnp.tanh(jax.nn.softplus(v))

        ffn_act = mish if layer_activation == "Mish" else (
            lambda v: jnp.maximum(v, 0.0)
        )

        # static attention masks per distinct tier frame count, built ONCE
        # in the kernel prologue (loop-invariant; rebuilding them inside
        # the step body costs pure VPU work on the latency-bound path);
        # stream_stride=B covers the whole frame-major batch in one call
        masks = {n: _bd_masks(B * n, nH, dH, d, B) for n in set(n_frames)}

        def attention(x, kv, l, wset, n, is_self):
            Wqkv, bqkv, Wo, bo = (t[l] for t in wset)
            if is_self:
                qkv = (
                    jnp.dot(x, Wqkv, preferred_element_type=jnp.float32)
                    + bqkv
                )
                q, k, v = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]
            else:
                q = (
                    jnp.dot(
                        x, Wqkv[:, :d], preferred_element_type=jnp.float32
                    )
                    + bqkv[:, :d]
                )
                kv2 = (
                    jnp.dot(
                        kv, Wqkv[:, d:], preferred_element_type=jnp.float32
                    )
                    + bqkv[:, d:]
                )
                k, v = kv2[:, :d], kv2[:, d:]
            q = q * inv_sqrt_dh
            a = _bd_attend(q, k, v, masks[n], nH, big_neg)
            return jnp.dot(a, Wo, preferred_element_type=jnp.float32) + bo

        def body(t, _):
            toks = win_ref[:]  # (B, W) int32
            lin = (toks.astype(jnp.float32) / Q - 0.5) * 2.0

            x_up = None  # (n_next*B, d) frame-major rows for the tier below
            for i in range(n_up):
                tw = tiers[i]
                f, n = fs[i], n_frames[i]
                # Frame gather-free AND layout-legal: a (1, n*f)->(n, f)
                # reshape is a lane re-tiling Mosaic rejects
                # ("unsupported shape cast"), sublane-concatenating raw
                # lane slices trips "offset mismatch on non-concat
                # dimension", and a concat-spelled rotate merely inherits
                # operand 0's lane offset.  pltpu.roll is a PHYSICAL
                # rotate: each frame lands at lane 0, then the aligned
                # (B, f) pieces stack on sublanes frame-major — n concat
                # operands regardless of B.
                parts = []
                for r in range(n):
                    a = (fs0 - f) + r * f
                    rolled = lin if a == 0 else pltpu.roll(lin, W - a, 1)
                    parts.append(rolled[:, :f])  # (B, f) at lane 0
                x = (
                    parts[0]
                    if n == 1
                    else jnp.concatenate(parts, axis=0)
                )  # (n*B, f) frame-major
                x = (
                    jnp.dot(
                        x, tw["w_in"][:], preferred_element_type=jnp.float32
                    )
                    + tw["b_in"][:]
                )
                if x_up is not None:
                    x = x + x_up
                x = x + pes[i][:]
                memory = x
                for l in range(L):
                    x = layer_norm(
                        x + attention(x, x, l, tw["self_w"], n, True),
                        tw["ln_w"][0][l], tw["ln_w"][1][l],
                    )
                    x = layer_norm(
                        x
                        + attention(x, memory, l, tw["cross_w"], n, False),
                        tw["ln_w"][2][l], tw["ln_w"][3][l],
                    )
                    h = (
                        jnp.dot(
                            x, tw["ffn_w"][0][l],
                            preferred_element_type=jnp.float32,
                        )
                        + tw["ffn_w"][1][l]
                    )
                    h = ffn_act(h)
                    x = layer_norm(
                        x
                        + jnp.dot(
                            h, tw["ffn_w"][2][l],
                            preferred_element_type=jnp.float32,
                        )
                        + tw["ffn_w"][3][l],
                        tw["ln_w"][4][l], tw["ln_w"][5][l],
                    )
                x = jnp.tanh(x)
                up = (
                    jnp.dot(
                        x, tw["w_up"][:], preferred_element_type=jnp.float32
                    )
                    + tw["b_up"][:]
                )  # (n*B, t_i*d) frame-major
                tf_up = t_up[i]
                if i < n_up - 1:
                    # de-interleave (n*B, t*d) -> (nxt*B, d) with lane
                    # rotates + whole-(B, d) sublane slices (a reshape is
                    # a lane re-tiling Mosaic rejects); next-tier frame m
                    # reads chunk m%t of up-frame m//t — nxt concat
                    # operands regardless of B thanks to frame-major rows
                    nxt = n_frames[i + 1]
                    rolls = [
                        up
                        if j == 0
                        else pltpu.roll(up, (tf_up - j) * d, 1)
                        for j in range(tf_up)
                    ]  # chunk j of every row, rotated to lane 0
                    x_up = jnp.concatenate(
                        [
                            rolls[m % tf_up][
                                (m // tf_up) * B : (m // tf_up) * B + B,
                                :d,
                            ]
                            for m in range(nxt)
                        ],
                        axis=0,
                    )  # (nxt*B, d) frame-major
                else:
                    # the bottom consumes only the LAST up-sampled frame —
                    # one contiguous (B, d) slice in frame-major layout
                    lastroll = (
                        up if tf_up == 1 else pltpu.roll(up, d, 1)
                    )
                    up_last = lastroll[(n - 1) * B : n * B, :d]  # (B, d)

            # bottom tier: eval reads only the LAST framed position —
            # the final fs_b real tokens (the window's last slot is the
            # placeholder, never read) plus the last up-sampled row
            off_b = W - 1 - fs_b
            bot_in = pltpu.roll(lin, W - off_b, 1)[:, :fs_b]  # lane 0
            bot = (
                jnp.dot(bot_in, w_bot[:], preferred_element_type=jnp.float32)
                + b_bot[:]
            )  # (B, d)
            hh = bot + up_last
            for kk in range(n_head_dense - 1):
                hh = mish(
                    jnp.dot(
                        hh, head[2 * kk][:],
                        preferred_element_type=jnp.float32,
                    )
                    + head[2 * kk + 1][:]
                )
            logits = (
                jnp.dot(hh, head[-2][:], preferred_element_type=jnp.float32)
                + head[-1][:]
            )  # (B, Q + 1)
            l_temp = jax.nn.sigmoid(logits[:, Q : Q + 1])
            logits = logits[:, :Q] / jnp.maximum(l_temp, min_temperature)

            if argmax:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits = logits / temp_ref[0, 0]
                bits = pltpu.prng_random_bits((B, Q))
                b24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32
                )
                u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
                gumbel = -jnp.log(-jnp.log(u))
                tok = jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)

            out_ref[pl.ds(t, 1), :] = tok[None, :]
            # next window: drop the oldest token, the generated token
            # fills the old placeholder slot, fresh placeholder appended
            win_ref[:] = jnp.concatenate(
                [
                    win_ref[:, 1 : W - 1],
                    tok[:, None],
                    jnp.zeros((B, 1), jnp.int32),
                ],
                axis=1,
            )
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0, unroll=False)

    # with carry_window the (B, W) window is the kernel's second OUTPUT
    # (same ref position as the scratch it replaces, so the body is
    # identical); a stream then chains kernel calls with the window kept
    # on-device
    out_shape = [jax.ShapeDtypeStruct((n_steps, B), jnp.int32)]
    scratch_shapes = []
    if carry_window:
        out_shape.append(jax.ShapeDtypeStruct((B, W), jnp.int32))
    else:
        scratch_shapes.append(pltpu.VMEM((B, W), jnp.int32))

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # initial window (B, W)
            *[
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(n_up + n_weights)
            ],
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def fn(weights, window_toks, seed, temperature):
        outs = call(
            jnp.asarray(temperature, jnp.float32).reshape(1, 1),
            jnp.asarray(seed, jnp.int32).reshape(1),
            window_toks.astype(jnp.int32),
            *[jnp.asarray(p) for p in pe_tabs],
            *weights,
        )
        if carry_window:
            return outs[0].T, outs[1]  # (B, n_steps), (B, W)
        return outs[0].T  # (B, n_steps)

    return fn


# -- runtime fallback ---------------------------------------------------------

def pallas_generate_or_fallback(net, prompts, n_steps, temperature, rng):
    """Run ``net._pallas_generate``; if the kernel fails at compile/run time
    (an ungated Mosaic edge case on this backend), disable the fused path
    for this net instance and return None so the caller falls through to
    its scan decoder.  In forced interpret mode (tests pin kernel
    semantics on CPU) failures re-raise instead of silently hiding bugs.
    """
    import os
    import warnings

    try:
        return net._pallas_generate(prompts, n_steps, temperature, rng)
    except Exception as e:  # noqa: BLE001 — any kernel failure routes to scan
        if (
            jax.default_backend() == "cpu"
            and os.environ.get("MMK_PALLAS_DECODE") == "1"
        ):
            raise
        warnings.warn(
            f"fused pallas decode failed ({type(e).__name__}: {e}); "
            "falling back to the scan decoder for this network"
        )
        net._pallas_disabled = True
        return None
