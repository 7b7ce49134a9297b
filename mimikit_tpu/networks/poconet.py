"""PocoNet: joint next-frame magnitude + phase prediction on STFT frames.

The reference's ``networks/poconet.py`` (15-227) is dead code — its base
class is a ``WNNetwork = None`` placeholder (``poconet.py:114``) and its
layer builders reference modules (``H``, ``Ops``) that were deleted, so
it cannot even be imported.  This module is a *working* TPU-native
realization of the same concept (SURVEY §2.7: "port the concept"):

- an amplitude-envelope-conditioned gated WaveNet stack over magnitude
  frames predicts the next frame's magnitudes (``poconet.py:141-201``);
- a :class:`PhaseNetwork` of gated 2D convolutions over phase/magnitude
  gradient features predicts the next frame's *phase advance*, added to
  the nominal hop rotation (``center_adv``) and the last context phase
  (``poconet.py:49-103``);
- the composite L1-magnitude + magnitude-weighted phase loss
  (``l1_loss_with_phs``, ``poconet.py:216-227``).

Layouts are TPU-first: frames are channel-last ``(B, T, F)``, the phase
net runs NHWC 2D convs (time=H, freq=W) so everything lowers to MXU
matmuls; the envelope follower has a numpy oracle and a ``lax.scan``
device path like every other IIR in the repo (``features/dsp.py``).

Alignment contract (explicit, replacing the reference's opaque shift
arithmetic at ``poconet.py:79-95``): ``forward`` returns predictions
``pred[j]`` for target frame index ``j + out_offset`` given all frames
``< j + out_offset``; the last position extrapolates one frame past the
input, which is exactly the autoregressive generation step.
"""
from __future__ import annotations

import dataclasses as dtc
from typing import Optional, Tuple, TYPE_CHECKING

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from ..io_spec import IOSpec

from .arm import NetworkConfig
from .wavenet import WNLayer

__all__ = [
    "peak_detector",
    "peak_detector_np",
    "extract_env",
    "PhaseNetwork",
    "PocoNet",
    "l1_loss_with_phs",
]


def peak_detector_np(sig: np.ndarray, att: float, rel: float) -> np.ndarray:
    """Envelope follower (host oracle; reference ``poconet.py:15-37``)."""
    lev = 0.0
    out = np.zeros_like(sig)
    for i in range(len(sig)):
        x = sig[i]
        lev = lev + (att if x > lev else rel) * (x - lev)
        out[i] = lev
    return out


def peak_detector(sig: jax.Array, att: float, rel: float) -> jax.Array:
    """Device path: one ``lax.scan`` over the frame axis."""

    def body(lev, x):
        coef = jnp.where(x > lev, att, rel)
        lev = lev + coef * (x - lev)
        return lev, lev

    _, out = jax.lax.scan(body, jnp.zeros((), sig.dtype), sig)
    return out


def extract_env(S) -> np.ndarray:
    """(T, 2) [envelope, its 2-frame derivative] from a complex STFT
    ``S`` of shape (F, T) — reference ``poconet.py:40-45``.  The first
    and last frames are dropped by the derivative's valid range, so the
    output aligns with frames ``1 .. T-2``."""
    mags = np.abs(np.asarray(S))
    env = 0.1 * peak_detector_np(mags.sum(axis=0), 0.75, 0.1)
    # lfilter([3, 0, -3], [1], env)[2:] == 3 * (env[2:] - env[:-2])
    deriv = 3.0 * (env[2:] - env[:-2])
    return np.stack([env[1:-1], deriv], axis=1).astype(np.float32)


def principarg(x):
    """Wrap to the principal phase branch (-pi, pi]."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


def safe_log(x):
    return jnp.log(jnp.maximum(x, 1e-5))


class PhaseNetwork(nn.Module):
    """Predict next-frame phase from phase/log-mag gradients.

    Gated NHWC conv stack: one (3, 3) feature conv, ``n_2x3layers`` gated
    (2, 3) convs shrinking time by 1 each (residual on the shrunk input),
    predicted-magnitude channels injected, then ``n_1x1layers`` gated 1x1
    convs and a final 1x1 to the phase-advance correction.
    """

    input_dim: int = 513  # freq bins
    dim1x1: int = 64
    dim2x3: int = 64
    n_1x1layers: int = 3
    n_2x3layers: int = 2
    groups: int = 1
    hop_ratio: float = 0.25  # hop / n_fft: nominal per-frame phase advance

    @property
    def rf(self) -> int:
        """Context frames each prediction sees: one for the time
        gradients, two for the (3,3) conv, one per (2,3) layer, plus the
        last context frame itself."""
        return 4 + self.n_2x3layers

    def _center_adv(self, F):
        return principarg(2.0 * jnp.pi * self.hop_ratio * jnp.arange(F))

    @nn.compact
    def __call__(self, mag, phase, pred_mags):
        """mag, phase: (B, T, F) context frames; pred_mags: (B, T_out, F)
        next-frame magnitude predictions, where ``T_out = T - rf + 1`` and
        ``pred_mags[j]`` targets frame ``j + rf`` (the final position
        extrapolates).  Returns predicted phases, same shape."""
        B, T, F = mag.shape
        rf = self.rf
        T_out = T - rf + 1
        assert pred_mags.shape[1] == T_out, (pred_mags.shape, T_out)
        center_adv = self._center_adv(F)

        lm = safe_log(mag)
        # freq gradients: central diff on the interior, then the GRADIENT
        # is reflect-padded at the edge bins (reference ``poconet.py:84,93``
        # pads the computed gradient, so grad[0] mirrors grad[1]; padding
        # the input instead would zero the DC/Nyquist gradients)
        def fgrad(z):
            g = z[:, :, 2:] - z[:, :, :-2]
            return jnp.pad(g, ((0, 0), (0, 0), (1, 1)), mode="reflect")

        # time gradients valid from frame 1
        tgt = (lm[:, 1:] - lm[:, :-1])
        tgf = fgrad(lm)[:, 1:]
        pgf = principarg(fgrad(phase))[:, 1:]
        pgt = principarg(principarg(phase[:, 1:] - phase[:, :-1]) - center_adv)
        feats = jnp.stack([lm[:, 1:], tgf, tgt, pgf, pgt], axis=-1)  # NHWC

        h = jnp.tanh(
            nn.Conv(
                self.dim2x3 - 5, (3, 3), padding=((0, 0), (1, 1)),
                name="first_phslayer",
            )(feats)
        )
        # time-aligned concat with the raw features (the (3,3) conv eats
        # two leading frames)
        h = jnp.concatenate([feats[:, 2:], h], axis=-1)
        for i in range(self.n_2x3layers):
            f = nn.Conv(
                self.dim2x3, (2, 3), padding=((0, 0), (1, 1)),
                feature_group_count=self.groups, name=f"phs2x3_{i}",
            )(h)
            g = nn.Conv(
                self.dim2x3, (2, 3), padding=((0, 0), (1, 1)),
                feature_group_count=self.groups, name=f"gate2x3_{i}",
            )(h)
            h = jnp.tanh(f) * nn.relu(g) + h[:, 1:]
        assert h.shape[1] == T_out, (h.shape, T_out)

        # inject the predicted next-frame magnitudes: their log and the
        # implied log-mag time gradient vs the last context frame
        lm_pred = safe_log(pred_mags)
        last_ctx = lm[:, rf - 1: rf - 1 + T_out]
        h = jnp.concatenate(
            [h, lm_pred[..., None], (lm_pred - last_ctx)[..., None]], axis=-1
        )
        for i in range(self.n_1x1layers):
            f = nn.Conv(
                self.dim1x1, (1, 1), feature_group_count=self.groups,
                name=f"phs1x1_{i}",
            )(h)
            g = nn.Conv(
                self.dim1x1, (1, 1), feature_group_count=self.groups,
                name=f"gate1x1_{i}",
            )(h)
            y = jnp.tanh(f) * nn.relu(g)
            h = y + h if h.shape[-1] == y.shape[-1] else y
        dphs = nn.Conv(1, (1, 1), name="last_phslayer")(h)[..., 0]
        # last context phase + nominal hop advance + learned correction
        prev = phase[:, rf - 1: rf - 1 + T_out]
        return principarg(prev + center_adv + dphs)


class _PocoCore(nn.Module):
    """Gated input -> env modulation -> WNLayer stack -> |mag| head,
    then the phase network."""

    input_dim: int
    gate_dim: int
    n_layers: Tuple[int, ...]
    kernel_size: int
    groups: int
    skips_dim: Optional[int]
    residuals_dim: Optional[int]
    amp_env_dim: int
    amp_gate_dim: int
    amp_env_layers: int
    phs_cfg: dict

    def setup(self):
        self.inpt = nn.Dense(self.gate_dim * 2, name="inpt")
        mul_net, add_net = [], []
        for i in range(self.amp_env_layers):
            mul_net.append(nn.Dense(self.amp_env_dim, name=f"amp_mul{i}"))
            add_net.append(nn.Dense(self.amp_env_dim, name=f"amp_add{i}"))
        self.amp_mul = mul_net
        self.amp_add = add_net
        self.amp_mul_out = nn.Dense(self.amp_gate_dim, name="amp_mul_out")
        self.amp_add_out = nn.Dense(self.amp_gate_dim, name="amp_add_out")
        self.layers = [
            WNLayer(
                dims_dilated=(self.gate_dim,),
                residuals_dim=self.residuals_dim,
                skips_dim=self.skips_dim,
                kernel_size=self.kernel_size,
                groups=self.groups,
                pad_side=0,  # VALID causal convs; time shrinks by cause
                dilation=2 ** i,
                name=f"layer{b}_{i}",
            )
            for b, block in enumerate(self.n_layers)
            for i in range(block)
        ]
        self.outpt = nn.Dense(self.input_dim, name="outpt")
        self.phs_network = PhaseNetwork(**self.phs_cfg, name="phs_network")

    @property
    def mag_rf(self) -> int:
        """Context frames consumed by the conv stack (+1: next-frame shift)."""
        return 1 + sum(l.cause for l in self.layers)

    @property
    def rf(self) -> int:
        return max(self.mag_rf, self.phs_network.rf)

    def __call__(self, inputs: Tuple, hidden=None, train: bool = False,
                 temperature=None):
        mag, phase, env = inputs
        x = self.inpt(mag)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)
        # amp-env modulation of the first amp_gate_dim gate channels
        m, ad = env, env
        for lin in self.amp_mul:
            m = nn.relu(lin(m))
        for lin in self.amp_add:
            ad = nn.relu(lin(ad))
        m = nn.relu(self.amp_mul_out(m))
        ad = nn.relu(self.amp_add_out(ad))
        k = min(self.amp_gate_dim, x.shape[-1])
        x = jnp.concatenate(
            [m[..., :k] * x[..., :k] + ad[..., :k], x[..., k:]], axis=-1
        )
        skips = None
        for layer in self.layers:
            x, skips = layer((x,), (), skips)
        pred_mags = jnp.abs(self.outpt(skips if skips is not None else x))
        # align: conv stack emits T - (mag_rf - 1) positions whose last
        # context frame is j + mag_rf - 2 ... trim so pred[j] targets
        # frame j + rf (common offset for both sub-nets)
        rf = self.rf
        T = mag.shape[1]
        T_out = T - rf + 1
        pred_mags = pred_mags[:, -T_out:]
        pred_phs = self.phs_network(
            mag[:, rf - self.phs_network.rf:],
            phase[:, rf - self.phs_network.rf:],
            pred_mags,
        )
        return (pred_mags, pred_phs), ()


class PocoNet:
    """Thin stateful wrapper (house contract) around :class:`_PocoCore`."""

    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: Optional["IOSpec"] = None  # (mag, phase, env) frames in
        input_dim: int = 513
        gate_dim: int = 128
        n_layers: Tuple[int, ...] = (4,)
        kernel_size: int = 2
        groups: int = 1
        skips_dim: Optional[int] = None
        residuals_dim: Optional[int] = None
        dim1x1: int = 64
        dim2x3: int = 64
        n_1x1layers: int = 3
        n_2x3layers: int = 2
        phs_groups: int = 1
        amp_env_dim: int = 32
        amp_gate_dim: int = 256
        amp_env_layers: int = 1
        hop_ratio: float = 0.25

    @classmethod
    def from_config(cls, cfg: "PocoNet.Config"):
        core = _PocoCore(
            input_dim=cfg.input_dim,
            gate_dim=cfg.gate_dim,
            n_layers=tuple(cfg.n_layers),
            kernel_size=cfg.kernel_size,
            groups=cfg.groups,
            skips_dim=cfg.skips_dim,
            residuals_dim=cfg.residuals_dim,
            amp_env_dim=cfg.amp_env_dim,
            amp_gate_dim=cfg.amp_gate_dim,
            amp_env_layers=cfg.amp_env_layers,
            phs_cfg=dict(
                input_dim=cfg.input_dim,
                dim1x1=cfg.dim1x1,
                dim2x3=cfg.dim2x3,
                n_1x1layers=cfg.n_1x1layers,
                n_2x3layers=cfg.n_2x3layers,
                groups=cfg.phs_groups,
                hop_ratio=cfg.hop_ratio,
            ),
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
    def rf(self) -> int:
        # static: mirrors _PocoCore.rf without needing bound params
        mag_rf = 1 + sum(
            (self._config.kernel_size - 1) * 2 ** i
            for block in self._config.n_layers
            for i in range(block)
        )
        return max(mag_rf, 4 + self._config.n_2x3layers)

    def next_rng(self):
        return jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))

    def init_params(self, batch_size: int = 1, batch_length: Optional[int] = None,
                    rng=None):
        if rng is None:
            rng = self.next_rng()
        T = batch_length or (self.rf + 1)
        F = self._config.input_dim
        dummy = (
            jnp.zeros((batch_size, T, F), jnp.float32),
            jnp.zeros((batch_size, T, F), jnp.float32),
            jnp.zeros((batch_size, T, 2), jnp.float32),
        )
        self.params = self.module.init({"params": rng}, dummy, None, True)[
            "params"
        ]
        return self.params

    def forward(self, inputs: Tuple, temperature=None):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        if self.params is None:
            self.init_params(
                batch_size=np.shape(inputs[0])[0],
                batch_length=np.shape(inputs[0])[1],
            )
        outs, _ = self.module.apply(
            {"params": self.params}, inputs, None, self.training, temperature
        )
        return outs

    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        if self.params is None and len(prompts) and prompts[0] is not None:
            self.init_params(
                batch_size=np.shape(prompts[0])[0],
                batch_length=np.shape(prompts[0])[1],
            )

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        """One AR step: feed the last ``rf`` frames, read the final
        (extrapolated) position."""
        pred_m, pred_p = self.forward(inputs)
        return pred_m[:, -1:], pred_p[:, -1:]

    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        pass

    @property
    def generate_params(self):
        return set()


def l1_loss_with_phs(output: Tuple, target: Tuple):
    """Composite loss (reference ``poconet.py:216-227``): normalized L1 on
    magnitudes + magnitude-weighted chordal phase distance; returns the
    reference's dict shape {loss, mag_loss, phs_loss}."""
    pred_m, pred_p = output
    tgt_m, tgt_p = target
    norm = jnp.abs(tgt_m).sum(axis=(0, -1), keepdims=True)
    cd = jnp.cos(tgt_p) - jnp.cos(pred_p)
    sd = jnp.sin(tgt_p) - jnp.sin(pred_p)
    w = jnp.sqrt(tgt_m / norm + 0.01)
    # the epsilon keeps the 2-norm's gradient finite where sd == cd == 0
    # (a perfectly predicted bin would otherwise NaN the whole step)
    phserr = jnp.mean(jnp.sqrt((sd * w) ** 2 + (cd * w) ** 2 + 1e-12))
    L = jnp.abs(pred_m - tgt_m).sum(axis=(0, -1), keepdims=True)
    mag_loss = 100.0 * jnp.mean(L / norm)
    phs_loss = 100.0 * phserr
    return {
        "loss": mag_loss + phs_loss,
        "mag_loss": mag_loss,
        "phs_loss": phs_loss,
    }
