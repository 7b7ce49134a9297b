"""SampleRNN: tiered recurrent autoregressive audio model, TPU-native.

Rebuild of ``/root/reference/mimikit/networks/sample_rnn_v2.py``.  The tier
hierarchy (coarse frame RNNs conditioning finer ones down to a per-sample
MLP) is preserved; the implementation is a pure flax core with explicit
hidden-state carries.  Decoding runs as a single jitted ``lax.scan`` over
time — tier ``i`` updates only when ``t % frame_sizes[i] == 0`` via
``lax.cond`` (the reference's per-tier step caching,
``sample_rnn_v2.py:236-260``) — instead of one Python iteration per audio
sample.
"""
from __future__ import annotations

import dataclasses as dtc
import os
from enum import auto
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import AutoStrEnum
from ..features.item_spec import ItemSpec
from ..features.functionals import Discrete
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # avoid circular import at package init
    from ..io_spec import IOSpec
from ..modules.io import (
    EmbeddingConv1d,
    FramedConv1dIO,
    FramedLinearIO,
    ZipReduceVariables,
)
from ..modules.resamplers import LinearResampler
from ..modules.rnn import RNNStack, init_rnn_carry
from .arm import ARMWithHidden, NetworkConfig

__all__ = ["SampleRNN", "SampleRNNCore"]


class RNNType(AutoStrEnum):
    lstm = auto()
    rnn = auto()
    gru = auto()
    none = auto()


class H0Init(AutoStrEnum):
    zeros = auto()
    ones = auto()
    randn = auto()


class SampleRNNCore(nn.Module):
    """Pure functional core; tier modules are built by ``SampleRNN.from_config``."""

    frame_sizes: Tuple[int, ...]
    hidden_dim: int
    rnn_class: str
    n_rnn: int
    rnn_dropout: float
    up_factors: Tuple[int, ...]
    tier_inputs: Tuple[nn.Module, ...]  # ZipReduceVariables per tier
    outputs: Tuple[nn.Module, ...]
    weight_norm: bool = False

    @property
    def has_rnn(self) -> bool:
        return str(self.rnn_class) != "none"

    def setup(self):
        if self.has_rnn:
            self.rnns = [
                RNNStack(
                    self.hidden_dim,
                    self.n_rnn,
                    str(self.rnn_class),
                    self.rnn_dropout,
                    weight_norm=self.weight_norm,
                    name=f"rnn_t{i}",
                )
                for i in range(len(self.frame_sizes) - 1)
            ]
        self.upsamplers = [
            LinearResampler(
                self.hidden_dim, t_factor=up, d_factor=1,
                weight_norm=self.weight_norm, name=f"up_t{i}",
            )
            for i, up in enumerate(self.up_factors)
        ]

    # -- training forward ---------------------------------------------------
    def __call__(self, inputs: Tuple, hidden=None, train: bool = False):
        """inputs: tuple of (B, fs0 + T) arrays.  Returns (outputs, hidden).

        Tier windows follow the reference's ``fs0-fs : -fs`` offsets
        (``sample_rnn_v2.py:211-224``).
        """
        fs = self.frame_sizes
        fs0 = fs[0]
        prev = None
        new_hidden = []
        for i, f in enumerate(fs[:-1]):
            tier_in = tuple(x[:, fs0 - f : x.shape[1] - f] for x in inputs)
            x = self.tier_inputs[i](tier_in, train=train)  # (B, n_frames, H)
            if prev is not None:
                x = x + prev
            if self.has_rnn:
                h_i = hidden[i] if hidden is not None else None
                x, h = self.rnns[i](x, h_i, train=train)
                new_hidden.append(h)
            x = self.upsamplers[i](x)
            prev = x
        f = fs[-1]
        # :-1 end offset is deliberate (bottom tier predicts the next sample)
        tier_in = tuple(x[:, fs0 - f : x.shape[1] - 1] for x in inputs)
        x = self.tier_inputs[-1](tier_in, train=train)
        if prev is not None:
            x = x + prev
        outputs = tuple(mod(x, train=train) for mod in self.outputs)
        return outputs, tuple(new_hidden)

    # -- single AR step (used under lax.scan and by the parity API) --------
    def decode_step(
        self,
        t,
        win: Tuple,
        hidden,
        tier_out,
        temperature=None,
    ):
        """One sample step at absolute position ``t``.

        win: tuple of (B, rf) input windows ending at t (exclusive).
        tier_out: tuple over non-bottom tiers of (B, up_i, H) cached upsampled
        outputs.  Returns (sampled outputs, new_hidden, new_tier_out).
        """
        fs = self.frame_sizes
        rf = fs[0]
        n = len(fs)
        new_hidden = list(hidden) if self.has_rnn else []
        new_tier_out = list(tier_out)

        for i in range(n - 1):
            f = fs[i]

            def update(hid_i, prev_cache, i=i, f=f):
                inpt = tuple(w[:, rf - f :] for w in win)
                x = self.tier_inputs[i](inpt)  # (B, 1, H)
                if i > 0:
                    up_prev = self.up_factors[i - 1]
                    idx = (t // f) % up_prev
                    prev = jax.lax.dynamic_index_in_dim(
                        new_tier_out[i - 1], idx, axis=1, keepdims=True
                    )
                    x = x + prev
                if self.has_rnn:
                    y, h2 = self.rnns[i].step(x[:, 0], hid_i)
                else:
                    y, h2 = x[:, 0], hid_i
                out = self.upsamplers[i](y[:, None, :])  # (B, up_i, H)
                return h2, out

            def keep(hid_i, prev_cache, i=i):
                return hid_i, prev_cache

            hid_i = hidden[i] if self.has_rnn else None
            h2, out = jax.lax.cond(
                (t % f) == 0, update, keep, hid_i, new_tier_out[i]
            )
            if self.has_rnn:
                new_hidden[i] = h2
            new_tier_out[i] = out

        f = fs[-1]
        inpt = tuple(w[:, rf - f :] for w in win)
        x = self.tier_inputs[-1](inpt)  # (B, 1, H)
        idx = t % fs[-2] if n >= 2 else 0
        prev = jax.lax.dynamic_index_in_dim(
            new_tier_out[-1], idx, axis=1, keepdims=True
        )
        x = x + prev
        outs = tuple(
            mod(x, train=False, temperature=temperature) for mod in self.outputs
        )
        return outs, tuple(new_hidden), tuple(new_tier_out)


class SampleRNN(ARMWithHidden):
    @dtc.dataclass
    class Config(NetworkConfig):
        frame_sizes: Tuple[int, ...] = (16, 8, 8)
        hidden_dim: int = 256
        rnn_class: str = "lstm"
        n_rnn: int = 1
        rnn_dropout: float = 0.0
        rnn_bias: bool = True
        h0_init: str = "zeros"
        weight_norm: bool = False
        inputs_mode: str = "sum"
        io_spec: "IOSpec" = None

    @classmethod
    def from_config(cls, config: "SampleRNN.Config") -> "SampleRNN":
        h = config.hidden_dim
        fs = config.frame_sizes
        tier_inputs = []
        up_factors = []
        wn = dict(weight_norm=True) if config.weight_norm else {}
        for i, f in enumerate(fs[:-1]):
            mods = tuple(
                in_spec.module.copy()
                .set(frame_size=f, hop_length=f, out_dim=h, **wn)
                .module()
                for in_spec in config.io_spec.inputs
            )
            tier_inputs.append(
                ZipReduceVariables(mode=str(config.inputs_mode), heads=mods)
            )
            up_factors.append(f // (fs[i + 1] if i < len(fs) - 2 else 1))
        # bottom tier: per-sample framed conv inputs
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
            mods.append(
                module_type()
                .set(**params, frame_size=fs[-1], hop_length=1, out_dim=h)
                .module()
            )
        tier_inputs.append(
            ZipReduceVariables(mode=str(config.inputs_mode), heads=tuple(mods))
        )
        outputs = tuple(
            t_spec.module.copy().set(in_dim=h, **wn).module()
            for t_spec in config.io_spec.targets
        )
        core = SampleRNNCore(
            frame_sizes=fs,
            hidden_dim=h,
            rnn_class=str(config.rnn_class),
            n_rnn=config.n_rnn,
            rnn_dropout=config.rnn_dropout,
            up_factors=tuple(up_factors),
            tier_inputs=tuple(tier_inputs),
            outputs=outputs,
            weight_norm=config.weight_norm,
        )
        return cls(config=config, core=core)

    def __init__(self, *, config: "SampleRNN.Config", core: SampleRNNCore):
        self._config = config
        self.module = core
        self.frame_sizes = config.frame_sizes
        self.params = None
        self.hidden = None  # carried TBPTT state (train path)
        self.training = True  # reference nets are mode-ful; loops toggle this
        self._apply_train = None
        self._decoders = {}
        # inference caches (parity API)
        self.outputs_cache: List = []
        self.gen_hidden = None
        self.prompt_length = 0

    # -- parameter init -----------------------------------------------------
    def init_params(self, batch_size: int = 1, batch_length: Optional[int] = None, rng=None):
        if rng is None:
            rng = self.next_rng()
        if batch_length is None:
            # the top tier needs at least one whole frame
            batch_length = max(64, self.frame_sizes[0])
        T = self.rf + batch_length
        dummy = tuple(
            self._dummy_input(spec, batch_size, T)
            for spec in self.config.io_spec.inputs
        )
        variables = self.module.init(
            {"params": rng, "dropout": rng, "sample": rng}, dummy, None, False
        )
        self.params = variables["params"]
        return self.params

    @staticmethod
    def _dummy_input(spec, B, T):
        from ..features.functionals import Discrete as _D

        if isinstance(spec.elem_type, _D):
            return jnp.zeros((B, T), jnp.int32)
        return jnp.zeros((B, T, spec.elem_type.size), jnp.float32)

    def _ensure_params(self, inputs):
        if self.params is None:
            B, T = np.shape(inputs[0])[0], np.shape(inputs[0])[1]
            self.init_params(batch_size=B, batch_length=T - self.rf)

    # -- training forward (stateful wrapper over the pure core) -------------
    def forward(self, inputs: Tuple):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        if self.training and inputs[0].shape[1] < 2 * self.frame_sizes[0]:
            # a batch shorter than 2*fs0 yields zero frames in the top tier
            # (cryptic size-0 gather errors otherwise)
            raise ValueError(
                f"input length {inputs[0].shape[1]} too short: SampleRNN with "
                f"frame_sizes {self.frame_sizes} needs at least "
                f"{2 * self.frame_sizes[0]} steps (batch_length >= "
                f"{self.frame_sizes[0]})"
            )
        self._ensure_params(inputs)
        if self._apply_train is None:
            self._apply_train = jax.jit(
                lambda p, xs, h, k, train: self.module.apply(
                    {"params": p}, xs, h, train,
                    rngs={"dropout": k, "sample": k},
                ),
                static_argnums=(4,),
            )
        outputs, self.hidden = self._apply_train(
            self.params, inputs, self.hidden, self.next_rng(), self.training
        )
        return outputs

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def reset_hidden(self) -> None:
        self.hidden = None

    @property
    def config(self) -> "SampleRNN.Config":
        return self._config

    @property
    def rf(self):
        return self.frame_sizes[0]

    # -- batch specs (identical ItemSpec arithmetic to the reference,
    #    ``sample_rnn_v2.py:278-307``) --------------------------------------
    def train_batch(self, item_spec: ItemSpec):
        return tuple(
            spec.to_batch_item(
                ItemSpec(shift=0, length=self.frame_sizes[0], unit=spec.unit)
                + item_spec
            )
            for spec in self.config.io_spec.inputs
        ), tuple(
            spec.to_batch_item(
                ItemSpec(shift=self.frame_sizes[0], unit=spec.unit) + item_spec
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
                    shift=self.frame_sizes[0],
                    length=-self.frame_sizes[0],
                    unit=spec.unit,
                )
                + item_spec
            )
            for spec in self.config.io_spec.targets
        )

    @property
    def generate_params(self):
        out = set()
        for t_spec in self.config.io_spec.targets:
            sampler = t_spec.objective.get_sampler()
            out |= set(getattr(sampler, "sampling_params", ()) or ())
        return out

    # -- fast decode: one jitted lax.scan over time -------------------------
    def _init_decode_state(self, batch_size: int):
        fs = self.frame_sizes
        h0 = str(self._config.h0_init)
        hidden = tuple(
            init_rnn_carry(
                str(self._config.rnn_class),
                self._config.n_rnn,
                batch_size,
                self._config.hidden_dim,
                h0,
                rng=self.next_rng() if h0 == "randn" else None,
            )
            for _ in fs[:-1]
        ) if str(self._config.rnn_class) != "none" else tuple()
        up = self.module.up_factors
        tier_out = tuple(
            jnp.zeros((batch_size, u, self._config.hidden_dim)) for u in up
        )
        return hidden, tier_out

    def make_decoder(self, prior_t: int, n_steps: int, mesh=None):
        """Build a jitted decode fn: (params, prompt_bufs, key, temperature)
        -> filled buffers.  prompt_bufs: tuple of (B, prior_t + n_steps).

        With ``mesh``, the stream batch is sharded over the 'data' axis —
        generation scales across chips with zero collectives (streams are
        independent)."""
        key_shape = (prior_t, n_steps, id(mesh) if mesh is not None else None)
        if key_shape in self._decoders:
            return self._decoders[key_shape]
        core = self.module
        rf = self.rf

        def decode(params, bufs, key, temperature):
            B = bufs[0].shape[0]
            hidden, tier_out = self._init_decode_state(B)

            def body(carry, t):
                bufs, hidden, tier_out, key = carry
                win = tuple(
                    jax.lax.dynamic_slice_in_dim(b, t - rf, rf, axis=1)
                    for b in bufs
                )
                key, sub = jax.random.split(key)
                outs, hidden, tier_out = core.apply(
                    {"params": params},
                    t,
                    win,
                    hidden,
                    tier_out,
                    temperature,
                    method=SampleRNNCore.decode_step,
                    rngs={"sample": sub},
                )
                new_bufs = []
                for b, o in zip(bufs, outs):
                    o_t = o[:, 0].astype(b.dtype)
                    # teacher-force while still inside the prompt
                    cur = jax.lax.dynamic_slice_in_dim(b, t, 1, axis=1)[:, 0]
                    val = jnp.where(t < prior_t, cur, o_t)
                    new_bufs.append(
                        jax.lax.dynamic_update_slice_in_dim(
                            b, val[:, None], t, axis=1
                        )
                    )
                return (tuple(new_bufs), hidden, tier_out, key), None

            ts = jnp.arange(rf, prior_t + n_steps)
            # unrolling amortizes per-iteration scan overhead across the
            # many small per-step ops (v5e sweep: 1->37.4k, 8->42.3k,
            # 16->44.7k, 32->42.7k steps/s; 16 is the knee)
            unroll = int(os.environ.get("MMK_DECODE_UNROLL", "16"))
            (bufs, *_), _ = jax.lax.scan(
                body, (bufs, hidden, tier_out, key), ts, unroll=unroll
            )
            return bufs

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            fn = jax.jit(
                decode,
                in_shardings=(repl, data, repl, repl),
                out_shardings=data,
            )
        else:
            fn = jax.jit(decode)
        self._decoders[key_shape] = fn
        return fn

    def generate(self, prompts: Tuple, n_steps: int, temperature=None, rng=None,
                 mesh=None):
        """Decode ``n_steps`` new samples after each prompt.  Returns tuple of
        (B, prior_t + n_steps) buffers (prompt + generation).  Pass ``mesh``
        to shard the streams over its 'data' axis."""
        prompts = tuple(jnp.asarray(p) for p in prompts)
        self._ensure_params(prompts)
        B, prior_t = prompts[0].shape[0], prompts[0].shape[1]
        if rng is None:
            rng = self.next_rng()
        if mesh is None and self._use_pallas_decode(
            B, prior_t, n_steps, argmax=temperature is None
        ):
            from ..ops.pallas_decode import pallas_generate_or_fallback

            out = pallas_generate_or_fallback(
                self, prompts, n_steps, temperature, rng
            )
            if out is not None:
                return out
        elif mesh is not None and self._use_pallas_decode_sharded(
            B, prior_t, n_steps, mesh, argmax=temperature is None
        ):
            # multi-chip serving: streams are independent, so each device
            # runs the fused kernel on its batch shard (weights
            # replicated, zero collectives) — the sharded scan only
            # applies when the kernel is out of scope
            try:
                return self._pallas_generate_sharded(
                    prompts, n_steps, temperature, rng, mesh
                )
            except Exception as e:  # noqa: BLE001 — any failure -> scan
                if (
                    jax.default_backend() == "cpu"
                    and os.environ.get("MMK_PALLAS_DECODE") == "1"
                ):
                    raise
                import warnings

                warnings.warn(
                    f"sharded pallas decode failed ({type(e).__name__}: "
                    f"{e}); falling back to the sharded scan decoder"
                )
                self._pallas_disabled = True
        elif mesh is None:
            sub = self._pallas_batch_split(
                B, prior_t, n_steps, argmax=temperature is None
            )
            if sub is not None:
                # streams are independent: slice the batch to the largest
                # size the fused kernel's VMEM envelope admits and pipeline
                # one dispatch per slice (async — the device runs them
                # back-to-back), keeping kernel throughput where one big
                # batch would fall back to the scan decoder
                starts = range(0, B, sub)
                keys = jax.random.split(rng, len(starts))
                outs = [
                    self.generate(
                        tuple(p[i : i + sub] for p in prompts),
                        n_steps,
                        temperature,
                        rng=k,
                    )
                    for i, k in zip(starts, keys)
                ]
                return tuple(
                    jnp.concatenate(parts, axis=0) for parts in zip(*outs)
                )
        bufs = tuple(
            jnp.concatenate(
                [p, jnp.zeros((B, n_steps) + p.shape[2:], p.dtype)], axis=1
            )
            for p in prompts
        )
        dec = self.make_decoder(prior_t, n_steps, mesh=mesh)
        if temperature is None:
            # None temperature means argmax — handled statically per decoder
            return dec(self.params, bufs, rng, None)
        return dec(self.params, bufs, rng, jnp.asarray(temperature, jnp.float32))

    # -- fused Pallas decode (ops/pallas_decode.py) --------------------------
    def _use_pallas_decode(
        self, B: int, prior_t: int, n_steps: int, argmax: bool = True
    ) -> bool:
        """Route to the fused kernel when the config is supported, the
        backend is a TPU (or MMK_PALLAS_DECODE=1 forces it, e.g. with
        interpret mode in tests), and everything fits the VMEM budget."""
        flag = os.environ.get("MMK_PALLAS_DECODE", "auto")
        if flag == "0" or getattr(self, "_pallas_disabled", False):
            return False
        from ..ops.pallas_decode import supports_pallas_decode

        if not supports_pallas_decode(self) or prior_t < self.rf:
            return False
        if jax.default_backend() == "cpu" and (flag != "1" or not argmax):
            # interpret mode has no TPU PRNG — only the argmax path runs
            # off-TPU (and only when forced, for tests)
            return False
        return self._pallas_mode(B, prior_t, n_steps) is not None

    def _use_pallas_decode_sharded(
        self, B: int, prior_t: int, n_steps: int, mesh, argmax: bool = True
    ) -> bool:
        """Sharded-serving route: the fused kernel per batch shard.  The
        stream batch must split evenly over the mesh's 'data' axis and the
        per-shard slice must itself be kernel-eligible."""
        n_data = int(mesh.shape.get("data", 1))
        if n_data <= 1 or B % n_data:
            return False
        return self._use_pallas_decode(
            B // n_data, prior_t, n_steps, argmax=argmax
        )

    def _pallas_generate_sharded(self, prompts, n_steps, temperature, rng,
                                 mesh):
        """Run the fused decode kernel on every device's batch shard via
        ``shard_map`` (weights replicated, streams sharded over 'data',
        zero collectives).  Argmax output is identical to the unsharded
        kernel; sampled streams draw from the same tempered distribution
        under a per-shard seed schedule."""
        from jax.sharding import PartitionSpec as P

        shard_map = jax.shard_map

        from ..ops.pallas_decode import (
            make_samplernn_pallas_chunked,
            make_samplernn_pallas_decoder,
            samplernn_weight_pack,
        )

        prompt = prompts[0]
        B, prior_t = prompt.shape
        n_data = int(mesh.shape["data"])
        local_B = B // n_data
        argmax = temperature is None
        mode = self._pallas_mode(local_B, prior_t, n_steps)
        wd = self._pallas_weight_dtype()
        pack_dtype = jnp.bfloat16 if wd == "bf16" else None
        key = ("pallas_sh", id(mesh), mode, B, prior_t, n_steps, argmax, wd)
        if key not in self._decoders:
            n_head_dense = 0
            core = self.params["outputs_0"]["estimator"]["core"]
            while f"Dense_{n_head_dense}" in core:
                n_head_dense += 1
            t_mod = self.config.io_spec.targets[0].module
            q = self.config.io_spec.inputs[0].elem_type.size
            fs = tuple(self.frame_sizes)
            static = (
                fs,
                tuple(self.module.up_factors),
                self._config.hidden_dim,
                q,
                n_head_dense,
                float(t_mod.min_temperature),
                local_B,
                prior_t,
            )
            interp = jax.default_backend() == "cpu"
            if mode == "single":
                dec = make_samplernn_pallas_decoder(
                    *static, n_steps, argmax, interpret=interp,
                    weight_dtype=wd,
                )

                def body(params, prompt_shard, seed_base, temp):
                    w = samplernn_weight_pack(params, fs, pack_dtype)
                    seed = seed_base + jax.lax.axis_index("data")
                    return dec(w, prompt_shard, seed, temp)

            else:
                rf = self.rf
                n_it = prior_t + n_steps - rf
                C = self._pallas_chunk_for(local_B, prior_t, n_steps)
                n_chunks = -(-n_it // C)
                dec = make_samplernn_pallas_chunked(
                    *static, C, argmax, interpret=interp,
                    weight_dtype=wd,
                )

                def body(params, prompt_shard, seed_base, temp):
                    w = samplernn_weight_pack(params, fs, pack_dtype)
                    # decorrelate shards AND chunks
                    seed = seed_base + jax.lax.axis_index("data") * (
                        n_chunks + 1
                    )
                    prompt_T = prompt_shard.astype(jnp.int32).T
                    state = dec.init_state()
                    state[0] = prompt_shard[:, :rf].astype(jnp.int32)
                    chunks = []
                    for j in range(n_chunks):
                        out_c, state = dec(
                            w, prompt_T, seed + j, temp, rf + j * C, state
                        )
                        chunks.append(out_c)
                    toks_T = jnp.concatenate(chunks, axis=0)
                    start = prior_t - rf
                    return toks_T[start : start + n_steps].T

            run = jax.jit(
                shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P("data"), P(), P()),
                    out_specs=P("data"),
                    # pallas_call's out_shape carries no vma annotation
                    check_vma=False,
                )
            )
            self._decoders[key] = run
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        seed_base = jax.random.randint(
            rng, (), 0, np.iinfo(np.int32).max // 4
        )
        tokens = self._decoders[key](self.params, prompt, seed_base, temp)
        return (
            jnp.concatenate([prompt, tokens.astype(prompt.dtype)], axis=1),
        )

    def _pallas_batch_split(
        self, B: int, prior_t: int, n_steps: int, argmax: bool
    ):
        """Sub-batch size to decode a batch too wide for the fused kernel.

        ``_pallas_mode`` returns None when the per-stream state no longer
        fits scoped VMEM (measured v5e: B=1024 OOMs where B=512 runs at
        ~80M samples/s).  Halve until a width passes the full routing gate;
        None when even the smallest useful width fails (or pallas is
        unavailable for other reasons — disabled, unsupported config,
        short prompt — which fail at every width)."""
        sub = B // 2
        while sub >= self._PALLAS_CHUNKED_MIN_B:
            if self._use_pallas_decode(sub, prior_t, n_steps, argmax=argmax):
                return sub
            sub //= 2
        return None

    _PALLAS_CHUNK = 2048
    _PALLAS_CHUNK_MIN = 256
    # Mosaic stack-allocates loop-carried kernel outputs (and scratch) in
    # SCOPED VMEM — 16 MiB on v5e, separate from the 128 MiB total.  The
    # chunked decoder's carried state + out-chunk tuple must fit it (with
    # margin for double-buffering).  Measured on v5e: B=512 (state 10.6 MiB
    # + 4 MiB chunk) compiles and runs at 76M samples/s; B=1024 (state
    # 21 MiB) OOMs the scoped space regardless of chunk size.
    _SCOPED_VMEM_BYTES = 15 * 2**20
    _TOTAL_VMEM_BYTES = 100 * 2**20  # v5e VMEM is 128 MiB/core
    # Measured at B=256 (v5e, 16384 steps): chunked = 83.3M samples/s
    # (3.08 us/step) vs single = 31.6M — the smaller VMEM working set wins
    # once the batch is wide; below this single's one-dispatch decode wins.
    _PALLAS_CHUNKED_MIN_B = 64

    @staticmethod
    def _pallas_weight_dtype() -> str:
        """'bf16' halves decode-weight VMEM and runs MXU-native bf16 dots
        (f32 accumulate) — opt-in via MMK_PALLAS_BF16=1; logits then carry
        bf16 rounding, so token-exactness vs the f32 scan no longer holds."""
        return "bf16" if os.environ.get("MMK_PALLAS_BF16") == "1" else "f32"

    def _pallas_weight_bytes(self) -> int:
        per_el = 2 if self._pallas_weight_dtype() == "bf16" else 4
        return per_el * sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(self.params)
        )

    def _pallas_state_bytes(self, B: int) -> int:
        """f32 bytes of the decode state: sample window + LSTM carries +
        per-tier upsampled conditioning caches."""
        H = self._config.hidden_dim
        return 4 * B * (
            self.rf + (2 * (len(self.frame_sizes) - 1)
                       + sum(self.module.up_factors)) * H
        )

    def _pallas_chunk_for(self, B: int, prior_t: int, n_steps: int) -> int:
        """Largest chunk length whose state+out tuple fits scoped VMEM."""
        n_it = prior_t + n_steps - self.rf
        fit = (self._SCOPED_VMEM_BYTES - self._pallas_state_bytes(B)) // (4 * B)
        return max(min(n_it, self._PALLAS_CHUNK, fit), 1)

    def _pallas_mode(self, B: int, prior_t: int, n_steps: int):
        """'single' (whole decode, one kernel call — small stream counts),
        'chunked' (state carried across chunk-sized kernel calls — wide
        stream batches), or None when neither fits VMEM."""
        w_bytes = self._pallas_weight_bytes()
        scr_bytes = self._pallas_state_bytes(B)
        single_ok = (
            w_bytes + 4 * B * (n_steps + prior_t) + scr_bytes < 12 * 2**20
        )
        if B < self._PALLAS_CHUNKED_MIN_B and single_ok:
            return "single"
        C = self._pallas_chunk_for(B, prior_t, n_steps)
        chunked_ok = (
            C >= min(self._PALLAS_CHUNK_MIN, prior_t + n_steps - self.rf)
            and scr_bytes + 4 * B * C < self._SCOPED_VMEM_BYTES
            and w_bytes + 2 * scr_bytes + 8 * B * C + 4 * B * prior_t
            < self._TOTAL_VMEM_BYTES
        )
        if chunked_ok:
            return "chunked"
        if single_ok:
            return "single"
        return None

    def _pallas_generate(self, prompts, n_steps, temperature, rng):
        from ..ops.pallas_decode import (
            make_samplernn_pallas_chunked,
            make_samplernn_pallas_decoder,
            samplernn_weight_pack,
        )

        prompt = prompts[0]
        B, prior_t = prompt.shape
        argmax = temperature is None
        mode = self._pallas_mode(B, prior_t, n_steps)
        wd = self._pallas_weight_dtype()
        pack_dtype = jnp.bfloat16 if wd == "bf16" else None
        key = ("pallas", mode, B, prior_t, n_steps, argmax, wd)
        if key not in self._decoders:
            n_head_dense = 0
            core = self.params["outputs_0"]["estimator"]["core"]
            while f"Dense_{n_head_dense}" in core:
                n_head_dense += 1
            t_mod = self.config.io_spec.targets[0].module
            q = self.config.io_spec.inputs[0].elem_type.size
            fs = tuple(self.frame_sizes)
            static = (
                fs,
                tuple(self.module.up_factors),
                self._config.hidden_dim,
                q,
                n_head_dense,
                float(t_mod.min_temperature),
                B,
                prior_t,
            )
            interp = jax.default_backend() == "cpu"
            if mode == "single":
                dec = make_samplernn_pallas_decoder(
                    *static, n_steps, argmax, interpret=interp,
                    weight_dtype=wd,
                )

                @jax.jit
                def run(params, prompt, rng, temp):
                    w = samplernn_weight_pack(params, fs, pack_dtype)
                    seed = jax.random.randint(
                        rng, (), 0, np.iinfo(np.int32).max
                    )
                    return dec(w, prompt, seed, temp)

            else:
                rf = self.rf
                n_it = prior_t + n_steps - rf
                C = self._pallas_chunk_for(B, prior_t, n_steps)
                n_chunks = -(-n_it // C)
                dec = make_samplernn_pallas_chunked(
                    *static, C, argmax, interpret=interp,
                    weight_dtype=wd,
                )

                @jax.jit
                def run(params, prompt, rng, temp):
                    w = samplernn_weight_pack(params, fs, pack_dtype)
                    seed = jax.random.randint(
                        rng, (), 0, np.iinfo(np.int32).max // 2
                    )
                    prompt_T = prompt.astype(jnp.int32).T
                    state = dec.init_state()
                    state[0] = prompt[:, :rf].astype(jnp.int32)
                    chunks = []
                    for j in range(n_chunks):
                        out_c, state = dec(
                            w, prompt_T, seed + j, temp, rf + j * C, state
                        )
                        chunks.append(out_c)
                    toks_T = jnp.concatenate(chunks, axis=0)
                    start = prior_t - rf
                    return toks_T[start : start + n_steps].T

            self._decoders[key] = run
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        tokens = self._decoders[key](self.params, prompt, rng, temp)
        return (jnp.concatenate([prompt, tokens.astype(prompt.dtype)], axis=1),)

    def stream(self, prompts: Tuple, chunk_steps: int, temperature=None,
               rng=None):
        """Unbounded generation: yield ``(B, chunk_steps)`` token chunks
        forever, continuing EXACTLY across chunks.

        When the fused chunked Pallas decoder is eligible, the decode state
        (sample window, LSTM carries, tier caches) is carried across kernel
        calls on-chip: the argmax stream equals one long argmax decode
        token-for-token (pinned in ``tests/test_streaming.py``).  Sampled
        streams draw from the same tempered distribution but use an
        independent per-chunk seed schedule, so their draws differ from a
        single ``generate`` call's.  Without the fused path, falls back to
        rf-window re-feeding (the reference's chunked-generation semantics,
        which drops RNN hidden at chunk boundaries)."""
        prompt = jnp.asarray(prompts[0])
        self._ensure_params((prompt,))
        B, prior_t = prompt.shape
        argmax = temperature is None
        if rng is None:
            rng = self.next_rng()
        usable = (
            prior_t >= self.rf
            and self._use_pallas_decode(B, prior_t, chunk_steps, argmax=argmax)
        )
        if not usable:
            sub = (
                prior_t >= self.rf
                and self._pallas_batch_split(
                    B, prior_t, chunk_steps, argmax=argmax
                )
            )
            if sub:
                # batch too wide for one kernel: zip per-slice fused
                # streams — each carries its own exact on-chip state, so
                # the concatenated stream stays chunk-exact per stream
                starts = range(0, B, sub)
                keys = jax.random.split(rng, len(starts))
                subs = [
                    self.stream(
                        (prompt[i : i + sub],), chunk_steps,
                        temperature=temperature, rng=k,
                    )
                    for i, k in zip(starts, keys)
                ]
                while True:
                    yield np.concatenate([next(s) for s in subs], axis=0)
            from ..loops.streaming import _refeed_stream

            yield from _refeed_stream(
                self, prompt, chunk_steps, temperature, rng
            )
            return

        from ..ops.pallas_decode import (
            make_samplernn_pallas_chunked,
            samplernn_weight_pack,
        )

        rf = self.rf
        fs = tuple(self.frame_sizes)
        C = min(chunk_steps, self._pallas_chunk_for(B, prior_t, chunk_steps))
        wd = self._pallas_weight_dtype()
        pack_dtype = jnp.bfloat16 if wd == "bf16" else None
        key = ("stream", B, prior_t, C, argmax, wd)
        if key not in self._decoders:
            n_head_dense = 0
            core = self.params["outputs_0"]["estimator"]["core"]
            while f"Dense_{n_head_dense}" in core:
                n_head_dense += 1
            t_mod = self.config.io_spec.targets[0].module
            q = self.config.io_spec.inputs[0].elem_type.size
            dec = make_samplernn_pallas_chunked(
                fs,
                tuple(self.module.up_factors),
                self._config.hidden_dim,
                q,
                n_head_dense,
                float(t_mod.min_temperature),
                B,
                prior_t,
                C,
                argmax,
                interpret=jax.default_backend() == "cpu",
                weight_dtype=wd,
            )

            @jax.jit
            def run(params, prompt_T, seed, temp, t0, state):
                # weight pack INSIDE jit: one fused dispatch per chunk
                w = samplernn_weight_pack(params, fs, pack_dtype)
                return dec(w, prompt_T, seed, temp, t0, state)

            self._decoders[key] = (run, dec.init_state)
        run, init_state = self._decoders[key]
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        seed0 = int(
            jax.random.randint(rng, (), 0, np.iinfo(np.int32).max // 2)
        )
        prompt_T = prompt.astype(jnp.int32).T
        state = init_state()
        state[0] = prompt[:, :rf].astype(jnp.int32)
        t_abs, k = rf, 0

        def dev_chunks():
            nonlocal state, t_abs, k
            while True:
                out_T, state = run(
                    self.params,
                    prompt_T,
                    jnp.asarray(seed0 + k, jnp.int32),
                    temp,
                    jnp.asarray(t_abs, jnp.int32),
                    state,
                )
                drop = max(0, prior_t - t_abs)  # forced prompt warm-up
                t_abs += C
                k += 1
                yield out_T, drop

        from ..loops.streaming import _read_behind_chunks

        yield from _read_behind_chunks(dev_chunks(), chunk_steps)

    # -- step-wise parity API (reference semantics, used by tests/loops) ----
    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        B = np.shape(prompts[0])[0]
        self._ensure_params(prompts)
        self.gen_hidden, self.outputs_cache = self._init_decode_state(B)
        self.outputs_cache = list(self.outputs_cache)
        prompt_length = np.shape(prompts[0])[1]
        offset = prompt_length % self.rf
        self.prompt_length = prompt_length - offset
        for t in range(self.rf, self.prompt_length):
            self.generate_step(
                tuple(p[:, t + offset - self.rf : t + offset] for p in prompts),
                t=t,
            )

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        temperature = parameters.get("temperature", None)
        win = tuple(x[:, -self.rf :] for x in inputs)
        outs, self.gen_hidden, new_cache = self.module.apply(
            {"params": self.params},
            t,
            win,
            self.gen_hidden,
            tuple(self.outputs_cache),
            temperature,
            method=SampleRNNCore.decode_step,
            rngs={"sample": self.next_rng()},
        )
        self.outputs_cache = list(new_cache)
        if t < self.prompt_length:
            return tuple()
        # squeeze a trailing singleton only beyond 2 dims (reference
        # ``sample_rnn_v2.py:260``): samples stay (B, 1)
        return tuple(o[..., 0] if o.ndim > 2 else o for o in outs)

    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        self.outputs_cache = []
        self.gen_hidden = None
        self.prompt_length = 0
