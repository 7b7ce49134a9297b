"""Legacy v1 seq2seq hierarchy: ``MultiSeq2SeqLSTM``.

Rebuild of the reference's un-exported ``networks/s2s_lstm.py`` (v1,
lines 18-248): a stack of seq2seq LSTM autoencoders applied recursively —
stage ``i`` encodes its input ``hop``-fold in time, the innermost stage
decodes its own coding, and each outer stage decodes the inner stage's
reconstruction seeded with its own encoder hidden
(``s2s_lstm.py:221-248``).

Notes on fidelity: the reference class is *not constructible* — it calls
``Seq2SeqLSTMNetwork(input_dim=513, model_dim=256, hop=4)`` against a
signature that no longer exists (``s2s_lstm.py:229-233``), so there is no
behavior to match bit-for-bit.  This module pins the evident semantics
(v1 encoder/decoder wiring, 3 stages, hop=4, dims 513->256) in a working,
jittable TPU form: every LSTM is a ``lax.scan`` over explicit carries and
the whole forward is one fused compiled program.  A Dense+abs output head
maps the final decode back to the input (magnitude-frame) dimension so
the network is a usable spectrogram autoencoder end-to-end.
"""
from __future__ import annotations

import dataclasses as dtc
from typing import Optional, Tuple, TYPE_CHECKING

if TYPE_CHECKING:
    from ..io_spec import IOSpec

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..modules.misc import unfold
from .arm import NetworkConfig
from .parametrized import ParametrizedGaussian
from .s2s_lstm import _BiLSTMSum

__all__ = ["MultiSeq2SeqLSTM"]


class _EncoderV1(nn.Module):
    """v1 encoder: bi-LSTM(sum) stack over the FULL sequence, then the
    first+last state of every ``hop`` window through an fc stack
    (``s2s_lstm.py:60-82``)."""

    input_dim: int
    model_dim: int
    hop: int
    n_lstm: int = 1
    n_fc: int = 1
    bottleneck: str = "add"  # 'add' | 'cat'

    def setup(self):
        self.lstms = [
            _BiLSTMSum(self.model_dim, name=f"lstm{i}") for i in range(self.n_lstm)
        ]
        self.fc_hidden = [
            nn.Dense(self.model_dim, name=f"fc{i}") for i in range(self.n_fc - 1)
        ]
        self.fc_out = nn.Dense(self.model_dim, use_bias=False, name="fc_out")

    def __call__(self, x):
        assert x.shape[1] % self.hop == 0, (x.shape, self.hop)
        hidden = None
        for i, lstm in enumerate(self.lstms):
            y, hidden = lstm(x)
            # residuals AFTER the first lstm (s2s_lstm.py:68)
            x = y if i == 0 else x + y
        # (B, T//hop, D, hop) windows; first + last state of each
        w = unfold(x, 1, self.hop, self.hop)
        first, last = w[..., 0], w[..., -1]
        states = (
            first + last
            if self.bottleneck == "add"
            else jnp.concatenate([first, last], axis=-1)
        )
        h = states
        for fc in self.fc_hidden:
            h = jnp.tanh(fc(h))
        return self.fc_out(h), hidden  # NO activation on the way out


class _DecoderV1(nn.Module):
    """v1 decoder: two bi-LSTM(sum) layers, BOTH seeded with the encoder
    hidden, outputs summed (``s2s_lstm.py:121-136``)."""

    model_dim: int

    def setup(self):
        self.lstm1 = _BiLSTMSum(self.model_dim, name="lstm1")
        self.lstm2 = _BiLSTMSum(self.model_dim, name="lstm2")

    def __call__(self, x, hidden):
        y1, _ = self.lstm1(x, hidden)
        y2, _ = self.lstm2(y1, hidden)
        return y1 + y2


class _Seq2SeqStage(nn.Module):
    """One stage: encoder + (optional gaussian residual) + decoder.

    ``decode`` tiles each coded frame ``hop`` times (the reference's
    ``tile(coded, 1, hop)`` repeats frames consecutively,
    ``s2s_lstm.py:139-145,199``) before running the decoder.
    """

    input_dim: int
    model_dim: int
    hop: int
    n_lstm: int = 1
    n_fc: int = 1
    with_sampler: bool = True

    def setup(self):
        self.enc = _EncoderV1(
            self.input_dim, self.model_dim, self.hop,
            self.n_lstm, self.n_fc, name="enc",
        )
        self.dec = _DecoderV1(self.model_dim, name="dec")
        if self.with_sampler:
            self.sampler = ParametrizedGaussian(
                self.model_dim, self.model_dim, use_bias=False, name="sampler"
            )

    def encode(self, x):
        return self.enc(x)

    def decode(self, coded, hidden):
        tiled = jnp.repeat(coded, self.hop, axis=1)
        if self.with_sampler:
            residuals, _, _ = self.sampler(tiled)
            tiled = tiled + residuals
        return self.dec(tiled, hidden)

    def __call__(self, x):  # stand-alone stage = autoencode
        coded, hidden = self.encode(x)
        return self.decode(coded, hidden)


class _MultiSeq2SeqCore(nn.Module):
    """The recursion of ``s2s_lstm.py:236-241`` unrolled innermost-first:
    every stage encodes, the innermost decodes its own coding, and each
    outer stage decodes the inner reconstruction with its own hidden."""

    io_dim: int
    model_dim: int
    hop: int
    n_stages: int
    with_sampler: bool

    def setup(self):
        self.stages = [
            _Seq2SeqStage(
                input_dim=self.io_dim if i == 0 else self.model_dim,
                model_dim=self.model_dim,
                hop=self.hop,
                with_sampler=self.with_sampler,
                name=f"s2s{i}",
            )
            for i in range(self.n_stages)
        ]
        self.head = nn.Dense(self.io_dim, name="head")

    def __call__(self, inputs: Tuple, hidden=None, train: bool = False,
                 temperature=None):
        (x,) = inputs
        codings, hiddens = [], []
        for stage in self.stages:
            x, h = stage.encode(x)
            codings.append(x)
            hiddens.append(h)
        y = self.stages[-1].decode(codings[-1], hiddens[-1])
        for i in range(self.n_stages - 2, -1, -1):
            y = self.stages[i].decode(y, hiddens[i])
        # back to the input (magnitude-frame) domain
        return (jnp.abs(self.head(y)),), ()


class MultiSeq2SeqLSTM:
    """Thin stateful wrapper over the pure flax core (house contract:
    ``(inputs_tuple, hidden, train) -> (outputs_tuple, hidden)``)."""

    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: Optional["IOSpec"] = None  # legacy net: frames in/out, no spec
        io_dim: int = 513
        model_dim: int = 256
        hop: int = 4
        n_stages: int = 3
        with_sampler: bool = True

    @classmethod
    def from_config(cls, cfg: "MultiSeq2SeqLSTM.Config"):
        core = _MultiSeq2SeqCore(
            io_dim=cfg.io_dim,
            model_dim=cfg.model_dim,
            hop=cfg.hop,
            n_stages=cfg.n_stages,
            with_sampler=cfg.with_sampler,
        )
        return cls(config=cfg, core=core)

    def __init__(self, *, config, core):
        self._config = config
        self.module = core
        self.params = None
        self.training = True
        self._rng = np.random.default_rng(0)

    @property
    def config(self):
        return self._config

    @property
    def rf(self):
        # time compression of the deepest coder
        return self._config.hop ** self._config.n_stages

    def next_rng(self):
        import jax

        return jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))

    def init_params(self, batch_size: int = 1, batch_length: Optional[int] = None,
                    rng=None):
        if rng is None:
            rng = self.next_rng()
        T = batch_length or self.rf
        dummy = (jnp.zeros((batch_size, T, self._config.io_dim), jnp.float32),)
        variables = self.module.init(
            {"params": rng, "sample": rng}, dummy, None, True
        )
        self.params = variables["params"]
        return self.params

    def forward(self, inputs: Tuple, temperature=None):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        if self.params is None:
            self.init_params(
                batch_size=np.shape(inputs[0])[0],
                batch_length=np.shape(inputs[0])[1],
            )
        outs, _ = self.module.apply(
            {"params": self.params}, inputs, None, self.training, temperature,
            rngs={"sample": self.next_rng()},
        )
        return outs

    def reset_hidden(self):
        pass  # hidden is per-call in the v1 un-carried path

    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        if self.params is None and len(prompts) and prompts[0] is not None:
            self.init_params(
                batch_size=np.shape(prompts[0])[0],
                batch_length=np.shape(prompts[0])[1],
            )

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        return self.forward(inputs)

    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        pass

    @property
    def generate_params(self):
        return set()
