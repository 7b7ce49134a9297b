"""Causal transformer networks: SimpleTransformer + JukeBox tiers.

Rebuild of ``/root/reference/mimikit/networks/transformers.py``.  The
reference wraps torch's ``TransformerDecoder`` self-attending over its own
input (tgt = memory = src) with a causal mask; here each decoder block is a
flax module with causal self-attention + causal cross-attention over the same
sequence + FFN — batch-first throughout (no permutes; XLA prefers it).
"""
from __future__ import annotations

import dataclasses as dtc
import os
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..io_spec import IOSpec

from ..features.item_spec import ItemSpec, Step
from ..features.functionals import Discrete
from ..modules.activations import _PLAIN
from ..modules.io import (
    EmbeddingConv1d,
    FramedConv1dIO,
    FramedLinearIO,
    ZipReduceVariables,
)
from ..modules.resamplers import LinearResampler
from .arm import ARM, NetworkConfig

__all__ = ["PositionalEncoding", "SimpleTransformer", "TransformerTier", "JukeBox"]


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len)[:, None].astype(np.float32)
    div_term = np.exp(
        np.arange(0, d_model, 2).astype(np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
    return pe


class PositionalEncoding(nn.Module):
    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, train: bool = False):
        # table follows the activation dtype (an f32 table would re-promote
        # a bf16 mixed-precision path at the very first add)
        pe = jnp.asarray(sinusoidal_pe(self.max_len, self.d_model), x.dtype)
        x = x + pe[None, : x.shape[1], :]
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DecoderBlock(nn.Module):
    """torch TransformerDecoderLayer equivalent: self-attn, cross-attn
    (memory == the same sequence here), FFN; post- or pre-norm.

    With ``decode=True`` both attentions run incrementally against their
    flax KV caches (queries are single steps; since memory is the same
    sequence, cross-attention caches behave exactly like self-attention's).
    """

    model_dim: int
    n_heads: int
    feedforward_dim: int
    dropout: float = 0.0
    activation: str = "ReLU"
    norm_first: bool = False
    decode: bool = False

    @nn.compact
    def __call__(self, x, memory, mask, train: bool = False):
        act = _PLAIN[str(self.activation)]

        def attn(q, kv, name):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads,
                qkv_features=self.model_dim,
                dropout_rate=self.dropout,
                deterministic=not train,
                decode=self.decode,
                name=name,
            )(q, kv, mask=mask)

        def drop(v):
            if self.dropout > 0:
                return nn.Dropout(self.dropout, deterministic=not train)(v)
            return v

        # eps matches torch nn.LayerNorm (imported reference checkpoints
        # reproduce logits to float precision)
        ln1 = nn.LayerNorm(epsilon=1e-5, name="ln1")
        ln2 = nn.LayerNorm(epsilon=1e-5, name="ln2")
        ln3 = nn.LayerNorm(epsilon=1e-5, name="ln3")

        if self.norm_first:
            x = x + drop(attn(ln1(x), ln1(x), "self_attn"))
            x = x + drop(attn(ln2(x), memory, "cross_attn"))
            h = nn.Dense(self.feedforward_dim)(ln3(x))
            h = drop(act(h))
            x = x + drop(nn.Dense(self.model_dim)(h))
        else:
            x = ln1(x + drop(attn(x, x, "self_attn")))
            x = ln2(x + drop(attn(x, memory, "cross_attn")))
            h = nn.Dense(self.feedforward_dim)(x)
            h = drop(act(h))
            x = ln3(x + drop(nn.Dense(self.model_dim)(h)))
        return x


class DecoderStack(nn.Module):
    model_dim: int
    n_heads: int
    feedforward_dim: int
    num_layers: int
    dropout: float = 0.0
    activation: str = "ReLU"
    norm_first: bool = False
    with_layer_norm: bool = False
    decode: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.decode:
            # incremental: x is one step, causality comes from the KV cache
            mask = None
        else:
            T = x.shape[1]
            mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        memory = x
        for i in range(self.num_layers):
            x = DecoderBlock(
                self.model_dim,
                self.n_heads,
                self.feedforward_dim,
                self.dropout,
                self.activation,
                self.norm_first,
                decode=self.decode,
                name=f"block{i}",
            )(x, memory, mask, train=train)
        if self.with_layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)
        return x


class SimpleTransformerCore(nn.Module):
    cfg: dict
    input_heads: Tuple[nn.Module, ...]
    output_modules: Tuple[nn.Module, ...]
    decode: bool = False

    def setup(self):
        c = self.cfg
        self.input_module = ZipReduceVariables(mode="sum", heads=self.input_heads)
        self.pe = PositionalEncoding(c["model_dim"], dropout=0.0, max_len=2048)
        self.model = DecoderStack(
            model_dim=c["model_dim"],
            n_heads=c["n_heads"],
            feedforward_dim=c["feedforward_dim"],
            num_layers=c["num_layers"],
            dropout=c["dropout"],
            activation="ReLU",
            with_layer_norm=c["with_layer_norm"],
            decode=self.decode,
        )
        self.input_dropout = c["input_dropout"]

    def __call__(self, inputs: Tuple, hidden=None, train: bool = False,
                 temperature=None):
        src = self.input_module(inputs, train=train)
        if self.decode:
            # incremental: inputs are one step; ``hidden`` is the absolute
            # position for the positional encoding (the attention caches
            # track their own write index)
            t = jnp.asarray(0 if hidden is None else hidden, jnp.int32)
            table = jnp.asarray(
                sinusoidal_pe(self.pe.max_len, self.cfg["model_dim"]),
                src.dtype,
            )
            src = src + jax.lax.dynamic_slice_in_dim(
                table, t, 1, axis=0
            )[None]
            out = self.model(src, train=False)
            return (
                tuple(
                    mod(out, train=False, temperature=temperature)
                    for mod in self.output_modules
                ),
                t + 1,
            )
        if train and self.input_dropout > 0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"),
                1.0 - self.input_dropout,
                (src.shape[0], 1, src.shape[-1]),
            )
            src = jnp.where(keep, src / (1.0 - self.input_dropout), 0.0)
        src = self.pe(src, train=train)
        out = self.model(src, train=train)
        if not train:
            out = out[:, -1:]
            return (
                tuple(
                    mod(out, train=False, temperature=temperature)
                    for mod in self.output_modules
                ),
                (),
            )
        return tuple(mod(out, train=True) for mod in self.output_modules), ()


class _StatefulTransformerARM(ARM):
    """Shared wrapper plumbing for transformer networks."""

    def __init__(self, *, config, core):
        self._config = config
        self.module = core
        self.params = None
        self.training = True
        self._decoders = {}

    @property
    def config(self):
        return self._config

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def _dummy_inputs(self, batch_size, T):
        import jax.numpy as jnp

        out = []
        for spec in self.config.io_spec.inputs:
            if isinstance(spec.elem_type, Discrete):
                out.append(jnp.zeros((batch_size, T), jnp.int32))
            else:
                out.append(
                    jnp.zeros((batch_size, T, spec.elem_type.size), jnp.float32)
                )
        return tuple(out)

    def init_params(self, batch_size: int = 1, batch_length: Optional[int] = None, rng=None):
        if rng is None:
            rng = self.next_rng()
        T = batch_length if batch_length is not None else self._default_init_len()
        dummy = self._dummy_inputs(batch_size, T)
        variables = self.module.init(
            {"params": rng, "dropout": rng, "sample": rng}, dummy, None, True
        )
        self.params = variables["params"]
        return self.params

    def _default_init_len(self) -> int:
        return self.rf

    def _ensure_params(self, inputs):
        if self.params is None:
            self.init_params(
                batch_size=np.shape(inputs[0])[0],
                batch_length=np.shape(inputs[0])[1],
            )

    def forward(self, inputs: Tuple, **parameters):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        self._ensure_params(inputs)
        outs, _ = self.module.apply(
            {"params": self.params},
            inputs,
            None,
            self.training,
            parameters.get("temperature", None),
            rngs={"dropout": self.next_rng(), "sample": self.next_rng()},
        )
        return outs

    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        self._ensure_params(prompts)

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        was = self.training
        self.training = False
        try:
            return self.forward(inputs, **parameters)
        finally:
            self.training = was

    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        pass

    @property
    def generate_params(self):
        return {"temperature"}

    def _window_len(self) -> int:
        return self.rf

    def _make_window_decoder(self, B: int, Tp: int, n_steps: int, dtype,
                             argmax: bool):
        """Jitted sliding-window decode: each scan step refeeds the last rf
        tokens through the normal core and appends the sampled token.  On
        TPU this beats incremental KV caches ~5x per step — one big fused
        window matmul over the MXU instead of many tiny cache
        reads/updates — and reproduces the stepwise loop's rf-window
        semantics (incl. window-relative positional encoding) exactly."""
        import jax

        # MMK_DECODE_BF16=1: run the window refeed in bfloat16 (params +
        # activations; the decode is MXU-bound — 17 GFLOP/step for the
        # 8-layer rf=64 net at b16 — so bf16's 2x matmul rate is the only
        # lever left below a KV cache).  Logits then carry bf16 rounding:
        # sampled/argmax tokens can drift from the f32 scan (opt-in,
        # PARITY divergence; same knob family as MMK_PALLAS_BF16).
        bf16 = os.environ.get("MMK_DECODE_BF16") == "1"
        key = ("win", B, Tp, n_steps, str(dtype), argmax, bf16)
        if key in self._decoders:
            return self._decoders[key]
        rf = self._window_len()
        module = self.module
        if bf16:
            from .. import precision as _prec
        # how far past the write position the refeed window reaches.  The
        # flat transformer consumes every window token and predicts the
        # next, so its window ends right before the write position (lead
        # 0).  JukeBox's core slices its tiers so the final input token is
        # never read in eval mode (it is the training target); its window
        # must therefore lead by 1 so the LAST READ token is t-1 and the
        # prediction lands on t (see JukeBox._decode_win_lead).
        lead = getattr(self, "_decode_win_lead", 0)

        @jax.jit
        def run(params, x, sample_rng, temperature):
            buf = jnp.concatenate(
                [x, jnp.zeros((B, n_steps), x.dtype)], axis=1
            )
            if bf16:
                params = _prec.cast_floats(params, jnp.bfloat16)

            def step(carry, t):
                b, sk_rng = carry
                sk_rng, sk = jax.random.split(sk_rng)
                win = jax.lax.dynamic_slice_in_dim(
                    b, t - rf + lead, rf, axis=1
                )
                if bf16:
                    with _prec.compute(jnp.bfloat16):
                        outs, _ = module.apply(
                            {"params": params},
                            (win,),
                            None,
                            False,
                            None if argmax else temperature,
                            rngs={"sample": sk},
                        )
                else:
                    outs, _ = module.apply(
                        {"params": params},
                        (win,),
                        None,
                        False,
                        None if argmax else temperature,
                        rngs={"sample": sk},
                    )
                o = outs[0]
                tok = (o[..., 0] if o.ndim > 1 else o).astype(b.dtype)
                tok = tok.reshape(b.shape[0])
                b = jax.lax.dynamic_update_slice_in_dim(
                    b, tok[:, None], t, axis=1
                )
                return (b, sk_rng), None

            (buf, _), _ = jax.lax.scan(
                step, (buf, sample_rng), jnp.arange(Tp, Tp + n_steps)
            )
            return buf

        self._decoders[key] = run
        return run


class SimpleTransformer(_StatefulTransformerARM):
    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: "IOSpec" = None
        model_dim: int = 256
        n_heads: int = 8
        feedforward_dim: int = 1024
        num_layers: int = 8
        with_layer_norm: bool = False
        dropout: float = 0.0
        input_dropout: float = 0.1
        rf: int = 64

    @classmethod
    def from_config(cls, config: "SimpleTransformer.Config"):
        input_heads = tuple(
            spec.module.copy().set(out_dim=config.model_dim).module()
            for spec in config.io_spec.inputs
        )
        output_modules = tuple(
            spec.module.copy().set(in_dim=config.model_dim).module()
            for spec in config.io_spec.targets
        )
        core = SimpleTransformerCore(
            cfg=dict(
                model_dim=config.model_dim,
                n_heads=config.n_heads,
                feedforward_dim=config.feedforward_dim,
                num_layers=config.num_layers,
                with_layer_norm=config.with_layer_norm,
                dropout=config.dropout,
                input_dropout=config.input_dropout,
            ),
            input_heads=input_heads,
            output_modules=output_modules,
        )
        return cls(config=config, core=core)

    @property
    def rf(self):
        return self._config.rf

    def train_batch(self, item_spec: ItemSpec):
        return tuple(
            spec.to_batch_item(item_spec) for spec in self.config.io_spec.inputs
        ), tuple(
            spec.to_batch_item(ItemSpec(shift=1, length=0, unit=Step()) + item_spec)
            for spec in self.config.io_spec.targets
        )

    def test_batch(self, item_spec: ItemSpec):
        return self.train_batch(item_spec)

    def _make_decoder(self, B: int, Tp: int, n_steps: int, dtype, argmax: bool):
        """Jitted KV-cached decode fn (cached per shape): (params, x, rng,
        temperature) -> (max_len-1, B) predictions."""
        import jax

        key = (B, Tp, n_steps, str(dtype), argmax)
        if key in self._decoders:
            return self._decoders[key]

        max_len = Tp + n_steps
        dec_core = SimpleTransformerCore(
            cfg=self.module.cfg,
            input_heads=self.module.input_heads,
            output_modules=self.module.output_modules,
            decode=True,
        )
        # cache shapes derive from the init input length (flax decode
        # convention).  eval_shape only — a real init would dispatch every
        # op of the un-jitted trace to the device one by one
        k0 = jax.random.PRNGKey(0)
        cache_shapes = jax.eval_shape(
            lambda: dec_core.init(
                {"params": k0, "sample": k0},
                (jnp.zeros((B, max_len), dtype),),
                None,
                False,
            )
        )["cache"]

        @jax.jit
        def run(params, x, sample_rng, temperature):
            def step(carry, t):
                cache, cur, sk_rng = carry
                sk_rng, sk = jax.random.split(sk_rng)
                tok = jnp.where(t < Tp, x[:, jnp.minimum(t, Tp - 1)], cur)
                (outs, _), mut = dec_core.apply(
                    {"params": params, "cache": cache},
                    (tok[:, None],),
                    t,
                    False,
                    None if argmax else temperature,
                    rngs={"sample": sk},
                    mutable=["cache"],
                )
                o = outs[0]
                nxt = o[..., 0] if o.ndim > 1 else o
                return (mut["cache"], nxt, sk_rng), nxt

            cache = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes
            )
            (_, _, _), preds = jax.lax.scan(
                step, (cache, x[:, 0], sample_rng), jnp.arange(max_len - 1)
            )
            return preds

        self._decoders[key] = run
        return run

    # -- fused Pallas decode (ops/pallas_decode.py) --------------------------
    def _use_pallas_decode(
        self, B: int, prior_t: int, n_steps: int, argmax: bool = True
    ) -> bool:
        import os

        flag = os.environ.get("MMK_PALLAS_DECODE", "auto")
        if flag == "0" or getattr(self, "_pallas_disabled", False):
            return False
        from ..ops.pallas_decode import supports_pallas_transformer

        if not supports_pallas_transformer(self) or prior_t < self.rf:
            return False
        if jax.default_backend() == "cpu" and (flag != "1" or not argmax):
            # interpret mode has no TPU PRNG — only the argmax path runs
            # off-TPU (and only when forced, for tests)
            return False
        c = self._config
        # the fused kernel is the LOW-LATENCY single-stream path: its
        # attention is per-stream block-diagonal (5 full-width ops per
        # stream, `_bd_attend`), so per-step cost grows ~linearly with B
        # while the window scan batches streams into one wide MXU matmul
        # per op.  Measured on v5e (8L, d=256, rf=64, BENCH_decode): B=1
        # kernel 25.8 us/step vs scan 66.5 (2.6x); B=16 kernel 263.9 vs
        # scan 254.6 — the step is MXU-bound there and the scan wins, so
        # auto routes B>1 to the scan.  MMK_PALLAS_DECODE=1 overrides
        # (how the bench maps the frontier).
        if B != 1 and flag != "1":
            return False
        # activation working set (B*rf rows x feedforward lanes, a handful
        # live at once, plus the (rf, nH*rf) block-diag buffers) must stay
        # inside scoped VMEM; weights + out buffer inside total VMEM (see
        # SampleRNN._SCOPED_VMEM_BYTES)
        if 3 * 4 * B * self.rf * max(
            c.feedforward_dim, c.model_dim, c.n_heads * self.rf
        ) > 14 * 2**20:
            return False
        w_bytes = 4 * sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(self.params)
        )
        return w_bytes + 4 * B * n_steps < 100 * 2**20

    def _use_pallas_kv(self, B: int, argmax: bool, bf16: bool = False) -> bool:
        """Gate for the FUSED KV-ring stream kernel
        (``ops/pallas_decode.make_transformer_kv_ring_pallas``).  The
        merged (L*B*rf, 4d) f32 K/V ring is aliased in -> out (in-place
        state), so it sits in regular VMEM with the weights, not in the
        16 MiB scoped window — the bound is the 128 MiB VMEM total (B<=48
        for the 8L/d256/rf64 bench net; the gate uses the f32 weight
        budget even under bf16 — see the comment below); wider KV batches
        fall back to the pure-jax ring scan, which is latency-bound but
        batch-flat."""
        import os

        flag = os.environ.get("MMK_PALLAS_DECODE", "auto")
        if flag == "0" or getattr(self, "_pallas_kv_disabled", False):
            return False
        from ..ops.pallas_decode import supports_pallas_transformer

        if not supports_pallas_transformer(self):
            return False
        c = self._config
        # lane-sliced fused qkv needs 128-aligned d; per-stream ring/row
        # slices need sublane-aligned rf
        if c.model_dim % 128 != 0 or self.rf % 8 != 0:
            return False
        if jax.default_backend() == "cpu" and (flag != "1" or not argmax):
            # interpret mode has no TPU PRNG — argmax only, forced (tests)
            return False
        # the ring is always f32 (Mosaic rejects 1-row dynamic bf16
        # stores); bf16 halves the weight operands' VMEM footprint, but
        # the GATE deliberately keeps the f32 budget (advisor r4): the
        # halved budget would admit B~49-55 for the bench net — an
        # untested window right at the 128 MiB VMEM cliff where a Mosaic
        # OOM is only caught by the first-call runtime fallback.  bf16 is
        # a pure speedup at batches the f32 gate already admits.
        ring_bytes = 4 * 4 * c.num_layers * B * self.rf * c.model_dim
        w_bytes = 4 * sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(self.params)
        )
        return w_bytes + ring_bytes < 100 * 2**20

    def _pallas_generate(self, prompts, n_steps, temperature, rng):
        from ..ops.pallas_decode import (
            make_transformer_pallas_decoder,
            transformer_weight_pack,
        )

        prompt = jnp.asarray(prompts[0])
        B, Tp = prompt.shape
        argmax = temperature is None
        c = self._config
        t_mod = c.io_spec.targets[0].module
        q = c.io_spec.inputs[0].elem_type.size
        n_head_dense = 0
        core = self.params["output_modules_0"]["estimator"]["core"]
        while f"Dense_{n_head_dense}" in core:
            n_head_dense += 1
        key = ("pallas", B, Tp, n_steps, argmax)
        if key not in self._decoders:
            dec = make_transformer_pallas_decoder(
                c.model_dim,
                c.n_heads,
                c.feedforward_dim,
                c.num_layers,
                self.rf,
                q,
                n_head_dense,
                float(t_mod.min_temperature),
                bool(c.with_layer_norm),
                B,
                n_steps,
                argmax,
                interpret=jax.default_backend() == "cpu",
            )
            L, fln = c.num_layers, bool(c.with_layer_norm)

            @jax.jit
            def run(params, prompt, rng, temp):
                w = transformer_weight_pack(params, L, fln)
                seed = jax.random.randint(
                    rng, (), 0, np.iinfo(np.int32).max
                )
                return dec(w, prompt[:, -self.rf :], seed, temp)

            self._decoders[key] = run
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        tokens = self._decoders[key](self.params, prompt, rng, temp)
        return (
            jnp.concatenate([prompt, tokens.astype(prompt.dtype)], axis=1),
        )

    def generate(self, prompts: Tuple, n_steps: int, temperature=None,
                 rng=None):
        """Autoregressive decode as one jitted ``lax.scan``.

        Prompts of at least rf tokens use the fused Pallas kernel when the
        config supports it (the whole AR loop in one kernel, weights
        resident in VMEM), else the sliding-window decoder (matches the
        stepwise loop exactly and is the fast path on TPU); shorter
        prompts use the KV-cached incremental decoder, which attends over
        the full history (identical to stepwise while the history still
        fits in the rf window)."""
        self._ensure_params(prompts)
        x = jnp.asarray(prompts[0])
        B, Tp = x.shape
        if rng is None:
            rng = self.next_rng()
        argmax = temperature is None
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        if Tp >= self.rf and self._use_pallas_decode(
            B, Tp, n_steps, argmax=argmax
        ):
            from ..ops.pallas_decode import pallas_generate_or_fallback

            out = pallas_generate_or_fallback(
                self, prompts, n_steps, temperature, rng
            )
            if out is not None:
                return out
        if Tp >= self.rf:
            dec = self._make_window_decoder(B, Tp, n_steps, x.dtype, argmax)
            return (dec(self.params, x, rng, temp),)
        dec = self._make_decoder(B, Tp, n_steps, x.dtype, argmax)
        preds = dec(self.params, x, rng, temp)
        cont = jnp.swapaxes(preds[Tp - 1 :], 0, 1)  # (B, n_steps)
        return (jnp.concatenate([x, cont.astype(x.dtype)], axis=1),)

    def stream(self, prompts: Tuple, chunk_steps: int, temperature=None,
               rng=None):
        """Unbounded generation: yield ``(B, chunk_steps)`` token chunks
        forever.

        Default: rf-window re-feeding — exact (the window IS the decode
        state) but O(rf) per step, which caps per-stream throughput at
        ~0.25x realtime for the 8-layer net (see the physics note in
        ``benchmarks/bench_decode.py``: 17 GFLOP/step beats any ceiling).

        ``MMK_DECODE_KV=1`` switches to the O(1)-per-step KV-RING decode
        (``ops/pallas_decode.make_transformer_kv_ring_decoder``): per-layer
        K/V ring caches over the last rf positions + absolute analytic
        positional encoding, with all state carried on-device across
        yields.  This is streaming-transformer semantics, a documented
        divergence from the reference's window refeed (PARITY #10): each
        position's K/V freeze at production time and the PE is absolute,
        so tokens drift from the refeed after the first step (the FIRST
        prediction from an rf-length prompt is identical — same attention
        set, same PE — pinned in tests).

        ``MMK_DECODE_BF16=1`` additionally runs the FUSED KV kernel with
        bf16 weights (f32 ring/accumulation/softmax/layer-norm): the step
        is VMEM-bandwidth-bound and the weights are the bigger half of
        its traffic at moderate B, so this trades bf16 token rounding
        (documented drift, as on the window refeed) for ~half the weight
        traffic."""
        prompt = jnp.asarray(prompts[0])
        self._ensure_params((prompt,))
        B, Tp = prompt.shape
        argmax = temperature is None
        if rng is None:
            rng = self.next_rng()
        from ..ops.pallas_decode import supports_pallas_transformer

        if (
            os.environ.get("MMK_DECODE_KV") != "1"
            or not supports_pallas_transformer(self)
            or Tp < 1
        ):
            from ..loops.streaming import _refeed_stream

            yield from _refeed_stream(
                self, prompt, chunk_steps, temperature, rng
            )
            return

        from ..ops.pallas_decode import (
            make_transformer_kv_ring_decoder,
            transformer_weight_pack,
        )

        c = self._config
        C = max(chunk_steps, 64)
        bf16 = os.environ.get("MMK_DECODE_BF16") == "1"
        fused = self._use_pallas_kv(B, argmax, bf16)
        if bf16 and not fused and not getattr(self, "_warned_bf16_scan", False):
            # the env var would otherwise be silently ignored (advisor
            # r4): the pure-jax ring scan has no bf16 variant
            self._warned_bf16_scan = True
            import warnings

            warnings.warn(
                "MMK_DECODE_BF16=1 requested but the fused KV kernel gate "
                f"rejected this case (B={B}) — streaming via the f32 "
                "pure-jax ring scan instead"
            )
        bf16 = bf16 and fused  # the pure-jax ring scan stays f32
        key = ("kvstream", B, Tp, C, argmax, fused, bf16)
        if key not in self._decoders:
            t_mod = c.io_spec.targets[0].module
            q = c.io_spec.inputs[0].elem_type.size
            n_head_dense = 0
            core = self.params["output_modules_0"]["estimator"]["core"]
            while f"Dense_{n_head_dense}" in core:
                n_head_dense += 1
            fln = bool(c.with_layer_norm)
            L = c.num_layers
            if fused:
                from ..ops.pallas_decode import (
                    make_transformer_kv_ring_pallas,
                    transformer_kv_weight_fuse,
                )

                dec = make_transformer_kv_ring_pallas(
                    c.model_dim, c.n_heads, c.feedforward_dim, L,
                    self.rf, q, n_head_dense,
                    float(t_mod.min_temperature), fln, B, Tp, C, argmax,
                    bf16=bf16,
                    interpret=jax.default_backend() == "cpu",
                )

                # NO donate_argnums here: donating the state on top of
                # the kernel's input_output_aliases makes the AOT TPU
                # compile fail (probed on v5e — the jit-boundary donation
                # and the custom-call aliasing fight over the buffer).
                # Without donation XLA inserts one defensive ring copy
                # per chunk call (~8 MB at B=4, ~20 us — negligible
                # against a 1600-step chunk); the aliasing still keeps
                # the ring out of the 16 MiB scoped-VMEM window, which
                # is what bounds B.
                @jax.jit
                def run(params, prompt_T, rng, temp, t0, state):
                    w = transformer_kv_weight_fuse(
                        transformer_weight_pack(params, L, fln), L, fln
                    )
                    seed = jax.random.randint(
                        rng, (), 0, np.iinfo(np.int32).max
                    )
                    return dec(w, prompt_T, seed, temp, t0, state)

            else:
                dec = make_transformer_kv_ring_decoder(
                    c.model_dim, c.n_heads, c.feedforward_dim, L,
                    self.rf, q, n_head_dense,
                    float(t_mod.min_temperature), fln, B, Tp, C, argmax,
                )

                @jax.jit
                def run(params, prompt_T, rng, temp, t0, state):
                    w = transformer_weight_pack(params, L, fln)
                    return dec(w, prompt_T, rng, temp, t0, state)

            self._decoders[key] = (run, dec.init_state)
        run, init_state = self._decoders[key]
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        prompt_T = prompt.astype(jnp.int32).T
        state = init_state()
        state[0] = jnp.broadcast_to(
            prompt[:, 0].astype(jnp.int32)[None], (8, B)
        )
        t_abs, k = 1, 0

        def dev_chunks():
            nonlocal state, t_abs, k, rng
            while True:
                rng, sub = jax.random.split(rng)
                out_T, state = run(
                    self.params, prompt_T, sub, temp,
                    jnp.asarray(t_abs, jnp.int32), state,
                )
                drop = max(0, Tp - t_abs)  # prompt-echo warm-up rows
                t_abs += C
                k += 1
                yield out_T, drop

        gen = dev_chunks()
        if fused:
            # degrade contract: a Mosaic rejection on the fused KV
            # kernel's first compile/run must not kill the stream — read
            # the FIRST chunk eagerly and fall back to the pure-jax ring
            # scan (same semantics) on failure
            try:
                first = next(gen)
                np.asarray(first[0])  # surface deferred kernel failures
            except Exception as e:  # pragma: no cover - hw-dependent
                import warnings

                warnings.warn(
                    "fused KV-ring kernel failed to compile/run "
                    f"({type(e).__name__}: {str(e)[:500]}); "
                    "falling back to the pure-jax KV scan",
                    RuntimeWarning,
                )
                self._pallas_kv_disabled = True
                yield from self.stream(
                    prompts, chunk_steps, temperature=temperature,
                    rng=rng,
                )
                return
            import itertools

            gen = itertools.chain([first], gen)
        from ..loops.streaming import _read_behind_chunks

        yield from _read_behind_chunks(gen, chunk_steps)


class TransformerTier(nn.Module):
    """SampleRNN-style tier with a transformer instead of an RNN
    (reference ``transformers.py:181-260``)."""

    input_module: nn.Module
    model_dim: Optional[int] = 256
    n_heads: int = 8
    feedforward_dim: int = 1024
    num_layers: int = 8
    with_layer_norm: bool = False
    dropout: float = 0.0
    activation: str = "Mish"
    norm_first: bool = False
    positional_encoding: Optional[int] = 4096
    weight_norm: bool = False
    up_sampling: Optional[int] = None

    def setup(self):
        if self.model_dim is not None:
            if self.positional_encoding is not None:
                self.pe = PositionalEncoding(
                    self.model_dim, dropout=0.0, max_len=self.positional_encoding
                )
            self.model = DecoderStack(
                model_dim=self.model_dim,
                n_heads=self.n_heads,
                feedforward_dim=self.feedforward_dim,
                num_layers=self.num_layers,
                dropout=self.dropout,
                activation=self.activation,
                norm_first=self.norm_first,
                with_layer_norm=self.with_layer_norm,
            )
        if self.up_sampling is not None:
            assert self.model_dim is not None
            self.up_sampler = LinearResampler(
                self.model_dim, t_factor=self.up_sampling, d_factor=1,
                weight_norm=self.weight_norm,
            )

    def __call__(self, inputs: Tuple, x_upper=None, train: bool = False):
        x = self.input_module(inputs, train=train)
        if x_upper is not None:
            x = x + x_upper
        if self.model_dim is not None:
            if self.positional_encoding is not None:
                x = self.pe(x, train=train)
            x = self.model(x, train=train)
            x = jnp.tanh(x)
        if self.up_sampling is not None:
            x = self.up_sampler(x)
        return x


class JukeBoxCore(nn.Module):
    frame_sizes: Tuple[int, ...]
    tiers: Tuple[nn.Module, ...]
    output_modules: Tuple[nn.Module, ...]

    def __call__(self, inputs: Tuple, hidden=None, train: bool = False,
                 temperature=None):
        prev_output = None
        fs0 = self.frame_sizes[0]
        for tier, fs in zip(self.tiers[:-1], self.frame_sizes[:-1]):
            tier_input = tuple(x[:, fs0 - fs : x.shape[1] - fs] for x in inputs)
            prev_output = tier(tier_input, prev_output, train=train)
        fs = self.frame_sizes[-1]
        tier_input = tuple(x[:, fs0 - fs : x.shape[1] - 1] for x in inputs)
        prev_output = self.tiers[-1](tier_input, prev_output, train=train)
        if not train:
            prev_output = prev_output[:, -1:]
            return (
                tuple(
                    mod(prev_output, train=False, temperature=temperature)
                    for mod in self.output_modules
                ),
                (),
            )
        return (
            tuple(mod(prev_output, train=True) for mod in self.output_modules),
            (),
        )


def _lead_window(xp, W: int):
    """Decode-lead-1 window for the fused JukeBox kernel: keep the last
    W-1 tokens and append the (never read) placeholder slot for the
    position being predicted.  Shared by ``_pallas_generate`` and
    ``stream`` so the lead convention cannot desynchronize (the pinned
    stream == long-decode exactness depends on both using the same one)."""
    B = xp.shape[0]
    return jnp.concatenate(
        [xp[:, -(W - 1):].astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)],
        axis=1,
    )


class JukeBox(_StatefulTransformerARM):
    # The core's eval path predicts the target of the LAST BOTTOM FRAME,
    # which ends one token before the input's end — the final input token
    # is sliced away at every tier because in train mode it is the final
    # target (the reference's ":-1 is surprising but right!",
    # ``/root/reference/mimikit/networks/transformers.py:363-364``).
    # Right for training — but the reference reuses that forward as its
    # ``generate_step``, so each generated token is an estimate of the
    # PREVIOUS position: generation feeds back stale predictions and
    # collapses toward DC (measured: free-run output = true sequence
    # shifted by one).  Divergence (bug fix): our decode window leads the
    # write position by one, so the last token actually READ is t-1 and
    # the prediction lands on t.  The never-read final window slot makes
    # this exactly "train-mode forward with the unknown token appended".
    _decode_win_lead = 1

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        """Stepwise callers (GenerateLoopV2's fallback, VotingEnsemble)
        feed the lead-0 window ``[t-rf, t)`` and write the result at
        ``t`` — apply the same one-token lead as the fast decoder by
        dropping the oldest token and appending a placeholder slot for
        ``t`` (never read: every tier slices the final input token away,
        pinned by test_jukebox_decode_predicts_the_next_token)."""
        shifted = tuple(
            jnp.concatenate(
                [jnp.asarray(x)[:, 1:],
                 jnp.zeros((np.shape(x)[0], 1), jnp.asarray(x).dtype)],
                axis=1,
            )
            for x in inputs
        )
        return super().generate_step(shifted, t=t, **parameters)

    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: "IOSpec" = None
        frame_sizes: Tuple[int, ...] = (32, 16, 4)
        model_dim: int = 256
        n_heads: int = 8
        feedforward_dim: int = 1024
        num_layers: int = 1
        layer_activation: str = "Mish"
        norm_first: bool = False
        with_layer_norm: bool = False
        dropout: float = 0.0
        positional_encoding: Optional[int] = 4096
        weight_norm: bool = False
        input_dropout: float = 0.0
        rf: int = 64
        # import-compat: reproduce the reference Conv1dResampler reshape
        # permutation in the bottom tier (resamplers.py:40-42) — reference
        # JukeBox checkpoints are trained through it, so imports need it on
        ref_compat: bool = False

    @classmethod
    def from_config(cls, config: "JukeBox.Config"):
        tiers: List[nn.Module] = []
        h_dim = config.model_dim
        fs_list = config.frame_sizes
        wn = dict(weight_norm=True) if config.weight_norm else {}
        for i, fs in enumerate(fs_list[:-1]):
            mods = tuple(
                in_spec.module.copy()
                .set(frame_size=fs, hop_length=fs, out_dim=h_dim, **wn)
                .module()
                for in_spec in config.io_spec.inputs
            )
            # ref_compat: the reference's layer_activation NEVER reaches its
            # decoder layers — torch's TransformerDecoder deep-clones the
            # layer and TransformerDecoderLayer.__setstate__ re-injects
            # F.relu into __dict__, shadowing the Mish submodule — so
            # reference checkpoints are trained with ReLU regardless
            act = "ReLU" if config.ref_compat else str(config.layer_activation)
            tiers.append(
                TransformerTier(
                    input_module=ZipReduceVariables(mode="sum", heads=mods),
                    model_dim=config.model_dim,
                    n_heads=config.n_heads,
                    feedforward_dim=config.feedforward_dim,
                    num_layers=config.num_layers,
                    with_layer_norm=config.with_layer_norm,
                    dropout=config.dropout,
                    activation=act,
                    norm_first=config.norm_first,
                    positional_encoding=config.positional_encoding,
                    weight_norm=config.weight_norm,
                    up_sampling=fs
                    // (fs_list[i + 1] if i < len(fs_list) - 2 else 1),
                )
            )
        mods = []
        for in_spec in config.io_spec.inputs:
            if isinstance(in_spec.elem_type, Discrete):
                params = dict(class_size=in_spec.elem_type.size)
                module_type = (
                    FramedConv1dIO
                    if isinstance(in_spec.module, FramedLinearIO)
                    else EmbeddingConv1d
                )
            else:
                params = dict()
                module_type = FramedConv1dIO
            if config.ref_compat:
                params["ref_scramble"] = True
            mods.append(
                module_type()
                .set(
                    **params,
                    frame_size=fs_list[-1],
                    hop_length=1,
                    out_dim=h_dim,
                    **wn,
                )
                .module()
            )
        tiers.append(
            TransformerTier(
                input_module=ZipReduceVariables(mode="sum", heads=tuple(mods)),
                model_dim=None,
                up_sampling=None,
            )
        )
        output_modules = tuple(
            t_spec.module.copy().set(in_dim=h_dim, **wn).module()
            for t_spec in config.io_spec.targets
        )
        core = JukeBoxCore(
            frame_sizes=fs_list, tiers=tuple(tiers), output_modules=output_modules
        )
        return cls(config=config, core=core)

    @property
    def rf(self):
        return self._config.rf

    def _default_init_len(self) -> int:
        # the tier pyramid needs a length that frames evenly at every
        # level: a multiple of frame_sizes[0], at least two top frames
        fs0 = self._config.frame_sizes[0]
        return max(2 * fs0, -(-self.rf // fs0) * fs0)

    def _window_len(self) -> int:
        return self._default_init_len()

    def _head_dense_count(self) -> int:
        """Number of Dense layers in the output head's MLP core (the fused
        kernel needs the static count; shared by generate and stream)."""
        n = 0
        core = self.params["output_modules_0"]["estimator"]["core"]
        while f"Dense_{n}" in core:
            n += 1
        return n

    # -- fused Pallas decode (ops/pallas_decode.py) ---------------------------
    def _use_pallas_decode(
        self, B: int, prior_t: int, n_steps: int, argmax: bool = True
    ) -> bool:
        # prior_t is part of the shared routing signature; short prompts
        # are zero-padded to the window (same as the scan), so it never
        # gates the kernel here
        del prior_t
        import os

        flag = os.environ.get("MMK_PALLAS_DECODE", "auto")
        if flag == "0" or getattr(self, "_pallas_disabled", False):
            return False
        from ..ops.pallas_decode import supports_pallas_jukebox

        if not supports_pallas_jukebox(self):
            return False
        if jax.default_backend() == "cpu" and (flag != "1" or not argmax):
            return False
        c = self._config
        W = self._window_len()
        # the kernel batches streams too (frame-major rows + stream×head
        # block-diagonal attention, `_bd_attend`): B multiplies both the
        # block-diag row count (B*n) and lane count (nH*B*n), so the gate
        # is the scoped-VMEM envelope of the attention working set — a
        # handful of (R, C) f32 buffers live at once (S/E/mb/P + the two
        # iota masks) — plus the FFN working set and the usual
        # weights+output total-VMEM budget.  Measured on v5e (3-tier
        # d=128 bench net, BENCH_decode): batching is nearly free in the
        # kernel — b16 12.4 us/step vs b1's 10.2, i.e. 1.29M samples/s =
        # 3.96x the b16 window scan.  Past the envelope the scan takes
        # over.
        span = W - c.frame_sizes[0]
        n_max = max(span // f for f in c.frame_sizes[:-1])
        R, C = B * n_max, c.n_heads * B * n_max
        if 8 * 4 * R * C > 12 * 2**20:
            return False
        if 3 * 4 * B * n_max * max(c.feedforward_dim, c.model_dim) > 14 * 2**20:
            return False
        w_bytes = 4 * sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(self.params)
        )
        return w_bytes + 4 * B * n_steps < 100 * 2**20

    def _pallas_generate(self, prompts, n_steps, temperature, rng):
        from ..ops.pallas_decode import (
            jukebox_weight_pack,
            make_jukebox_pallas_decoder,
        )

        x = jnp.asarray(prompts[0])
        B, Tp = x.shape
        W = self._window_len()
        pad = max(W - Tp, 0)
        if pad:
            x = jnp.concatenate([jnp.zeros((B, pad), x.dtype), x], axis=1)
        argmax = temperature is None
        c = self._config
        t_mod = c.io_spec.targets[0].module
        q = c.io_spec.inputs[0].elem_type.size
        n_head_dense = self._head_dense_count()
        key = ("pallas", B, Tp + pad, n_steps, argmax)
        if key not in self._decoders:
            dec = make_jukebox_pallas_decoder(
                tuple(c.frame_sizes),
                c.model_dim,
                c.n_heads,
                c.feedforward_dim,
                c.num_layers,
                W,
                q,
                n_head_dense,
                float(t_mod.min_temperature),
                str(c.layer_activation),
                int(c.positional_encoding),
                B,
                n_steps,
                argmax,
                interpret=jax.default_backend() == "cpu",
            )
            n_tiers, L = len(c.frame_sizes), c.num_layers

            span = W - c.frame_sizes[0]
            tier_rows = tuple(
                B * (span // f) for f in c.frame_sizes[:-1]
            )

            @jax.jit
            def run(params, xp, rng, temp):
                w = jukebox_weight_pack(
                    params, n_tiers, L, tier_rows, head_rows=B
                )
                seed = jax.random.randint(
                    rng, (), 0, np.iinfo(np.int32).max
                )
                return dec(w, _lead_window(xp, W), seed, temp)

            self._decoders[key] = run
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        tokens = self._decoders[key](self.params, x, rng, temp)
        return (
            jnp.concatenate(
                [x[:, pad:], tokens.astype(x.dtype)], axis=1
            ),
        )

    def generate(self, prompts: Tuple, n_steps: int, temperature=None,
                 rng=None):
        """Sliding-window scan decode (see ``_make_window_decoder``).
        Prompts shorter than the window are left-padded with zeros (the
        same convention WaveNet's fast decode uses for short prompts).
        Single streams in the supported configuration run the whole AR
        loop in one fused Pallas kernel (``make_jukebox_pallas_decoder``),
        token-exact vs this scan in argmax mode."""
        self._ensure_params(prompts)
        x = jnp.asarray(prompts[0])
        B, Tp = x.shape
        if rng is None:
            rng = self.next_rng()
        argmax = temperature is None
        if self._use_pallas_decode(B, Tp, n_steps, argmax=argmax):
            from ..ops.pallas_decode import pallas_generate_or_fallback

            out = pallas_generate_or_fallback(
                self, prompts, n_steps, temperature, rng
            )
            if out is not None:
                return out
        win = self._window_len()
        pad = max(win - Tp, 0)
        if pad:
            x = jnp.concatenate(
                [jnp.zeros((B, pad), x.dtype), x], axis=1
            )
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        dec = self._make_window_decoder(B, Tp + pad, n_steps, x.dtype, argmax)
        out = dec(self.params, x, rng, temp)
        return (out[:, pad:],)

    def stream(self, prompts: Tuple, chunk_steps: int, temperature=None,
               rng=None):
        """Unbounded generation: yield ``(B, chunk_steps)`` token chunks
        forever, continuing EXACTLY across chunks.

        When the fused tier-pyramid kernel is eligible, the (B, W) token
        window — JukeBox's ENTIRE decode state — is carried across kernel
        calls on-device (``make_jukebox_pallas_decoder(carry_window=True)``):
        the argmax stream equals one long argmax decode token-for-token
        (pinned in ``tests/test_streaming.py``), and each chunk costs one
        dispatch + one host read instead of the window re-feed's
        pad/re-window round-trip.  Sampled streams draw from the same
        tempered distribution with an independent per-chunk seed schedule.
        Without the fused path, falls back to window re-feeding (exact —
        the window IS the state — but slower per chunk)."""
        prompt = jnp.asarray(prompts[0])
        self._ensure_params((prompt,))
        B, Tp = prompt.shape
        argmax = temperature is None
        if rng is None:
            rng = self.next_rng()
        if not self._use_pallas_decode(B, Tp, chunk_steps, argmax=argmax):
            from ..loops.streaming import _refeed_stream

            yield from _refeed_stream(
                self, prompt, chunk_steps, temperature, rng
            )
            return

        from ..ops.pallas_decode import (
            jukebox_weight_pack,
            make_jukebox_pallas_decoder,
        )

        c = self._config
        W = self._window_len()
        pad = max(W - Tp, 0)
        x = (
            jnp.concatenate([jnp.zeros((B, pad), prompt.dtype), prompt], 1)
            if pad
            else prompt
        )
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        seed0 = int(
            jax.random.randint(rng, (), 0, np.iinfo(np.int32).max // 2)
        )
        # the first chunk covers both kernel construction and execution:
        # an ungated Mosaic edge case must degrade to the exact window
        # re-feed (same contract as generate's pallas_generate_or_fallback),
        # not crash the serving loop.  Nothing has been yielded yet, so
        # falling back with the original prompt is exact.
        try:
            key = ("stream", B, chunk_steps, argmax)
            if key not in self._decoders:
                t_mod = c.io_spec.targets[0].module
                q = c.io_spec.inputs[0].elem_type.size
                dec = make_jukebox_pallas_decoder(
                    tuple(c.frame_sizes),
                    c.model_dim,
                    c.n_heads,
                    c.feedforward_dim,
                    c.num_layers,
                    W,
                    q,
                    self._head_dense_count(),
                    float(t_mod.min_temperature),
                    str(c.layer_activation),
                    int(c.positional_encoding),
                    B,
                    chunk_steps,
                    argmax,
                    interpret=jax.default_backend() == "cpu",
                    carry_window=True,
                )
                n_tiers, L = len(c.frame_sizes), c.num_layers
                span = W - c.frame_sizes[0]
                tier_rows = tuple(B * (span // f) for f in c.frame_sizes[:-1])

                @jax.jit
                def run(params, win, seed, temp):
                    # weight pack INSIDE jit: one fused dispatch per chunk
                    w = jukebox_weight_pack(
                        params, n_tiers, L, tier_rows, head_rows=B
                    )
                    return dec(w, win, seed, temp)

                self._decoders[key] = run
            run = self._decoders[key]
            win = _lead_window(x, W)
            toks, win = run(
                self.params, win, jnp.asarray(seed0, jnp.int32), temp
            )
            first = np.asarray(toks)
        except Exception as e:  # noqa: BLE001 — route to the exact re-feed
            import os as _os
            import warnings

            if (
                jax.default_backend() == "cpu"
                and _os.environ.get("MMK_PALLAS_DECODE") == "1"
            ):
                raise  # forced interpret mode: tests must see kernel bugs
            warnings.warn(
                f"fused jukebox stream failed ({type(e).__name__}: {e}); "
                "falling back to window re-feeding for this network"
            )
            self._pallas_disabled = True
            self._decoders.pop(("stream", B, chunk_steps, argmax), None)
            from ..loops.streaming import _refeed_stream

            yield from _refeed_stream(
                self, prompt, chunk_steps, temperature, rng
            )
            return
        # host numpy = the chunk's completion fence (win stays device)
        yield first
        from ..loops.streaming import _host_async, _pipeline_on

        # read-behind pipeline: chunk k+1 is dispatched from the DEVICE
        # window before chunk k's host read, hiding the tunnel round-trip
        # behind k+1's compute (MMK_STREAM_PIPELINE=0 opts out; tokens
        # identical either way)
        pipelined = _pipeline_on()
        pending = None
        k = 1
        while True:
            toks, win = run(
                self.params, win, jnp.asarray(seed0 + k, jnp.int32), temp
            )
            _host_async(toks)
            k += 1
            if not pipelined:
                yield np.asarray(toks)
                continue
            if pending is not None:
                yield np.asarray(pending)
            pending = toks

    def train_batch(self, item_spec: ItemSpec):
        return tuple(
            spec.to_batch_item(
                ItemSpec(shift=0, length=self._config.frame_sizes[0], unit=spec.unit)
                + item_spec
            )
            for spec in self.config.io_spec.inputs
        ), tuple(
            spec.to_batch_item(
                ItemSpec(shift=self._config.frame_sizes[0], unit=spec.unit)
                + item_spec
            )
            for spec in self.config.io_spec.targets
        )

    def test_batch(self, item_spec: ItemSpec):
        return tuple(
            spec.to_batch_item(item_spec.to(spec.unit))
            for spec in self.config.io_spec.inputs
        ), tuple(
            spec.to_batch_item(
                ItemSpec(
                    shift=self._config.frame_sizes[0],
                    length=-self._config.frame_sizes[0],
                    unit=spec.unit,
                )
                + item_spec
            )
            for spec in self.config.io_spec.targets
        )
