"""Seq2Seq LSTM: encode a hop of frames, decode the next hop.

Rebuild of ``/root/reference/mimikit/networks/s2s_lstm_v2.py``: stacked
bidirectional LSTMs (forward + backward **summed**), hop->1 downsampling
(edge_sum/edge_mean/sum/mean/linear_resample), encoder hidden seeding the
decoder's first LSTM, 1->hop upsampling (repeat/interp/linear_resample).
Typically used on STFT magnitude frames (the "FreqNet"/seq2seq demo path).
"""
from __future__ import annotations

import dataclasses as dtc
from enum import auto
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..io_spec import IOSpec

from ..utils import AutoStrEnum
from ..features.item_spec import ItemSpec
from ..features.functionals import Continuous
from ..modules.io import ZipReduceVariables
from ..modules.misc import unfold
from ..modules.resamplers import LinearResampler
from ..modules.rnn import RNNStack
from .arm import ARMWithHidden, NetworkConfig

__all__ = ["EncoderLSTM", "DecoderLSTM", "Seq2SeqLSTMNetwork"]


class DownSampling(AutoStrEnum):
    edge_sum = auto()
    edge_mean = auto()
    sum = auto()
    mean = auto()
    linear_resample = auto()


class UpSampling(AutoStrEnum):
    repeat = auto()
    interp = auto()
    linear_resample = auto()


class _BiLSTMSum(nn.Module):
    """Bidirectional LSTM layer whose two directions are summed
    (reference ``s2s_lstm_v2.py:100``).

    ``pair_sum=True`` reproduces the reference's actual computation for
    checkpoint imports: torch's bidirectional output is the CONCATENATED
    ``[fwd | bwd]`` (2H) and ``y.view(..., H, 2).sum(-1)`` sums ADJACENT
    feature pairs within each direction — not the two directions.  Nets
    trained through that fixed wiring only transfer if we keep it."""

    output_dim: int
    weight_norm: bool = False
    pair_sum: bool = False

    def setup(self):
        self.fwd = RNNStack(
            self.output_dim, 1, "lstm", weight_norm=self.weight_norm, name="fwd"
        )
        self.bwd = RNNStack(
            self.output_dim, 1, "lstm", weight_norm=self.weight_norm, name="bwd"
        )

    def __call__(self, x, hidden=None):
        """hidden: optional (h, c) of shape (2, B, H) seeding fwd/bwd carries
        (the decoder's first LSTM receives the encoder hidden,
        reference ``s2s_lstm_v2.py:166-171``)."""
        carry_f = carry_b = None
        if hidden is not None:
            h, c = hidden
            carry_f = ((c[0], h[0]),)
            carry_b = ((c[1], h[1]),)
        y_f, c_f = self.fwd(x, carry_f)
        y_b, c_b = self.bwd(jnp.flip(x, axis=1), carry_b)
        if self.pair_sum:
            z = jnp.concatenate([y_f, jnp.flip(y_b, axis=1)], axis=-1)
            y = z[..., 0::2] + z[..., 1::2]
        else:
            y = y_f + jnp.flip(y_b, axis=1)
        # hidden handed to the decoder: (h, c) shaped (2, B, H) — both dirs
        h = jnp.stack([c_f[0][1], c_b[0][1]], axis=0)
        c = jnp.stack([c_f[0][0], c_b[0][0]], axis=0)
        return y, (h, c)


class EncoderLSTM(nn.Module):
    downsampling: str
    input_dim: int = 512
    output_dim: int = 512
    num_layers: int = 1
    hop: int = 4
    apply_residuals: bool = False
    weight_norm: bool = False
    ref_compat: bool = False

    def setup(self):
        self.lstms = [
            _BiLSTMSum(
                self.output_dim, self.weight_norm,
                pair_sum=self.ref_compat, name=f"lstm{i}",
            )
            for i in range(self.num_layers)
        ]
        if str(self.downsampling) == "linear_resample":
            self.fc = LinearResampler(
                self.output_dim, 1 / self.hop, 1, weight_norm=self.weight_norm
            )
        fc_out = nn.Dense(self.output_dim, use_bias=False)
        self.fc_out = nn.WeightNorm(fc_out) if self.weight_norm else fc_out

    def __call__(self, x):
        assert x.shape[1] == self.hop
        hidden = None
        for n, lstm in enumerate(self.lstms):
            y, hidden = lstm(x)
            if n > 0 and self.apply_residuals:
                x = x + y
            else:
                x = y
        ds = str(self.downsampling)
        if ds == "linear_resample":
            return self.fc_out(self.fc(x)), hidden
        x = unfold(x, 1, self.hop, self.hop)  # (B, 1, D, hop)
        if "edge" in ds:
            x = x[..., jnp.asarray([0, -1]) % x.shape[-1]]
        if "sum" in ds:
            return self.fc_out(x.sum(axis=-1)), hidden
        return self.fc_out(x.mean(axis=-1)), hidden


class DecoderLSTM(nn.Module):
    upsampling: str
    model_dim: int = 512
    num_layers: int = 1
    hop: int = 4
    apply_residuals: bool = False
    weight_norm: bool = False
    ref_compat: bool = False

    def setup(self):
        self.lstms = [
            _BiLSTMSum(
                self.model_dim, self.weight_norm,
                pair_sum=self.ref_compat, name=f"lstm{i}",
            )
            for i in range(self.num_layers)
        ]
        if str(self.upsampling) == "linear_resample":
            self.fc = LinearResampler(
                self.model_dim, self.hop, 1, weight_norm=self.weight_norm
            )

    def __call__(self, x, hidden=None):
        assert x.shape[1] == 1
        us = str(self.upsampling)
        if us == "linear_resample":
            x = self.fc(x)
        elif us == "repeat":
            x = jnp.repeat(x, self.hop, axis=1)
        elif us == "interp":
            h = hidden[0]  # (2, B, H)
            h_t = jnp.transpose(h, (1, 2, 0))  # (B, H, 2)
            interp = jax.image.resize(
                h_t, (h_t.shape[0], h_t.shape[1], self.hop), method="linear"
            )
            interp = jnp.transpose(interp, (0, 2, 1))
            x = jnp.broadcast_to(x, (x.shape[0], self.hop, x.shape[2])) + interp
        # only the first LSTM is seeded with the encoder hidden — except in
        # ref_compat, where (like the reference's actual code,
        # ``s2s_lstm_v2.py:171``, contradicting its own comment) EVERY
        # layer is seeded with the same encoder hidden
        for n, lstm in enumerate(self.lstms):
            y, _ = lstm(x, hidden if (n == 0 or self.ref_compat) else None)
            if self.apply_residuals:
                x = x + y
            else:
                x = y
        return x


class Seq2SeqCore(nn.Module):
    input_heads: Optional[Tuple[nn.Module, ...]]
    output_heads: Tuple[nn.Module, ...]
    encoder_cfg: dict
    decoder_cfg: dict

    def setup(self):
        self.enc = EncoderLSTM(**self.encoder_cfg, name="enc")
        self.dec = DecoderLSTM(**self.decoder_cfg, name="dec")
        if self.input_heads is not None:
            self.input_module = ZipReduceVariables(mode="sum", heads=self.input_heads)

    def __call__(self, inputs: Tuple, hidden=None, train: bool = False,
                 temperature=None):
        if self.input_heads is not None:
            x = self.input_module(inputs, train=train)
        else:
            x = sum(inputs)
        coded, h_enc = self.enc(x)
        output = self.dec(coded, h_enc)
        outs = []
        for mod in self.output_heads:
            if train:
                outs.append(mod(output, train=True))
            else:
                outs.append(mod(output, train=False, temperature=temperature))
        # single reduced output (reference wraps heads in ZipReduce-sum)
        y = outs[0]
        for o in outs[1:]:
            y = y + o
        return (y,), ()


class Seq2SeqLSTMNetwork(ARMWithHidden):
    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: "IOSpec" = None
        model_dim: int = 1024
        enc_downsampling: str = "edge_sum"
        enc_n_lstm: int = 1
        enc_apply_residuals: bool = False
        enc_weight_norm: bool = False
        dec_upsampling: str = "linear_resample"
        dec_n_lstm: int = 1
        dec_apply_residuals: bool = False
        dec_weight_norm: bool = False
        hop: int = 8
        # import-compat: reproduce the reference's adjacent-pair direction
        # "sum" (s2s_lstm_v2.py:100) and its hidden-to-every-decoder-layer
        # seeding (:171) so trained reference checkpoints transfer exactly
        ref_compat: bool = False

    @classmethod
    def from_config(cls, cfg: "Seq2SeqLSTMNetwork.Config"):
        if isinstance(cfg.io_spec.inputs[0].elem_type, Continuous):
            input_dim = cfg.io_spec.inputs[0].elem_type.size
            input_heads = None
        else:
            input_dim = cfg.model_dim
            input_heads = tuple(
                spec.module.copy().set(out_dim=cfg.model_dim).module()
                for spec in cfg.io_spec.inputs
            )
        output_heads = tuple(
            spec.module.copy().set(in_dim=cfg.model_dim).module()
            for spec in cfg.io_spec.targets
        )
        core = Seq2SeqCore(
            input_heads=input_heads,
            output_heads=output_heads,
            encoder_cfg=dict(
                downsampling=str(cfg.enc_downsampling),
                input_dim=input_dim,
                output_dim=cfg.model_dim,
                num_layers=cfg.enc_n_lstm,
                hop=cfg.hop,
                apply_residuals=cfg.enc_apply_residuals,
                weight_norm=cfg.enc_weight_norm,
                ref_compat=cfg.ref_compat,
            ),
            decoder_cfg=dict(
                upsampling=str(cfg.dec_upsampling),
                model_dim=cfg.model_dim,
                num_layers=cfg.dec_n_lstm,
                hop=cfg.hop,
                apply_residuals=cfg.dec_apply_residuals,
                weight_norm=cfg.dec_weight_norm,
                ref_compat=cfg.ref_compat,
            ),
        )
        return cls(config=cfg, core=core)

    def __init__(self, *, config, core):
        self._config = config
        self.module = core
        self.params = None
        self.training = True
        self._decoders = {}

    @property
    def config(self):
        return self._config

    @property
    def rf(self):
        return self._config.hop

    def init_params(self, batch_size: int = 1, batch_length: Optional[int] = None, rng=None):
        if rng is None:
            rng = self.next_rng()
        T = self._config.hop
        spec = self.config.io_spec.inputs[0]
        from ..features.functionals import Discrete as _D

        if isinstance(spec.elem_type, _D):
            dummy = (jnp.zeros((batch_size, T), jnp.int32),)
        else:
            dummy = (
                jnp.zeros((batch_size, T, spec.elem_type.size), jnp.float32),
            )
        variables = self.module.init(
            {"params": rng, "dropout": rng, "sample": rng}, dummy, None, True
        )
        self.params = variables["params"]
        return self.params

    def _ensure_params(self, inputs):
        if self.params is None:
            self.init_params(batch_size=np.shape(inputs[0])[0])

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def forward(self, inputs: Tuple, temperature=None):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        self._ensure_params(inputs)
        outs, _ = self.module.apply(
            {"params": self.params}, inputs, None, self.training, temperature,
            rngs={"dropout": self.next_rng(), "sample": self.next_rng()},
        )
        return outs

    def reset_hidden(self):
        pass  # hidden is per-call (matches the reference's un-carried path)

    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        self._ensure_params(prompts)

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        was = self.training
        self.training = False
        try:
            return self.forward(inputs, parameters.get("temperature", None))
        finally:
            self.training = was

    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        pass

    def stepwise_step_fn(self, parameters: dict):
        """Pure per-step apply for ``GenerateLoopV2``'s device-resident
        stepwise loop (see ``arm.py``): eval-mode forward on the ``hop``
        window, t-independent and shape-static.  Cached per temperature so
        the loop's jitted scan cache hits across calls."""
        if set(parameters) - {"temperature"}:
            return None
        temp = parameters.get("temperature", None)
        try:
            key = ("stepwise", temp)
            hash(key)
        except TypeError:
            key = None
        fn = self._decoders.get(key) if key is not None else None
        if fn is None:
            module = self.module

            def fn(params, wins, rng):
                outs, _ = module.apply(
                    {"params": params}, wins, None, False, temp,
                    rngs={"dropout": rng, "sample": rng},
                )
                return outs

            if key is not None:
                self._decoders[key] = fn
        return fn

    def generate(self, prompts: Tuple, n_steps: int, temperature=None,
                 rng=None):
        """Block-autoregressive decode as one jitted ``lax.scan``.

        Each scan iteration feeds the last ``hop`` frames through the
        eval-mode encoder/decoder (hidden per-call, like the reference's
        un-carried path — ``s2s_lstm_v2.py``'s forward) and emits the next
        ``hop`` frames; identical sequences to the stepwise loop when
        sampling is deterministic (``tests/test_seq2seq.py``).  Keeps the
        whole decode device-resident — the stepwise fallback pays a
        host↔device round-trip per block."""
        self._ensure_params(prompts)
        hop = self._config.hop
        xs = tuple(jnp.asarray(p) for p in prompts)
        B, Tp = xs[0].shape[0], xs[0].shape[1]
        if rng is None:
            rng = self.next_rng()
        n_blocks = max(1, -(-n_steps // hop))
        key = (B, Tp, int(n_steps), temperature is None,
               tuple((str(x.dtype), x.shape[2:]) for x in xs))
        dec = self._decoders.get(key)
        if dec is None:
            module = self.module
            argmax = temperature is None

            @jax.jit
            def run(params, xs, rng, temp):
                wins = tuple(
                    jnp.pad(x, ((0, 0), (max(0, hop - Tp), 0))
                            + ((0, 0),) * (x.ndim - 2))[:, -hop:]
                    for x in xs
                )

                def step(wins, k):
                    outs, _ = module.apply(
                        {"params": params}, wins, None, False,
                        None if argmax else temp,
                        rngs={"dropout": k, "sample": k},
                    )
                    outs = tuple(
                        o.astype(w.dtype) for o, w in zip(outs, wins)
                    )
                    return outs, outs

                keys = jax.random.split(rng, n_blocks)
                _, blocks = jax.lax.scan(step, wins, keys)
                return tuple(
                    jnp.concatenate(
                        [x, jnp.moveaxis(b, 0, 1).reshape(
                            B, n_blocks * hop, *x.shape[2:])[:, :n_steps]],
                        axis=1,
                    )
                    for x, b in zip(xs, blocks)
                )

            dec = run
            self._decoders[key] = dec
        temp = jnp.asarray(
            1.0 if temperature is None else temperature, jnp.float32
        )
        return dec(self.params, xs, rng, temp)

    @property
    def generate_params(self):
        out = set()
        for t_spec in self.config.io_spec.targets:
            sampler = t_spec.objective.get_sampler()
            out |= set(getattr(sampler, "sampling_params", ()) or ())
        return out

    def train_batch(self, item_spec: ItemSpec):
        hop = self._config.hop
        return tuple(
            spec.to_batch_item(ItemSpec(shift=0, length=hop, unit=item_spec.unit))
            for spec in self.config.io_spec.inputs
        ), tuple(
            spec.to_batch_item(ItemSpec(shift=hop, length=hop, unit=item_spec.unit))
            for spec in self.config.io_spec.targets
        )

    def test_batch(self, item_spec: ItemSpec):
        return tuple(
            spec.to_batch_item(item_spec) for spec in self.config.io_spec.inputs
        ), ()
