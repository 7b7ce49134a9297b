"""WaveNet: gated dilated convolutions with a TPU-native fast decoder.

Rebuild of ``/root/reference/mimikit/networks/wavenet_v2.py``.  Training runs
feature-last (B, T, D) dilated convs (XLA maps them onto the MXU).  The
reference's fast-generate installs forward hooks implementing rolling ring
buffers and mutates conv dilation at runtime (``wavenet_v2.py:368-445``);
here each layer simply keeps a rolling window of its input of length
``cause + 1`` threaded through a jitted ``lax.scan`` — the unchanged conv
applied to that window yields exactly the one new timestep, so training and
decoding share parameters with no module surgery.
"""
from __future__ import annotations

import dataclasses as dtc
import os
from itertools import accumulate, chain
import operator as opr
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..io_spec import IOSpec

from ..features.item_spec import ItemSpec, Step
from ..modules.misc import causal_pad
from .arm import ARM, NetworkConfig

__all__ = ["WNLayer", "WaveNet", "WaveNetCore"]


class WNLayer(nn.Module):
    """One gated dilated block (reference ``wavenet_v2.py:32-182``).

    ``__call__(inputs_dilated, inputs_1x1, skips)`` -> ``(y, skips)``.
    With ``decode=True`` the inputs are exact ``cause+1``-length windows and
    no padding/trimming applies.
    """

    input_dim: Optional[int] = None
    dims_dilated: Tuple[int, ...] = (128,)
    dims_1x1: Tuple[int, ...] = ()
    residuals_dim: Optional[int] = None
    apply_residuals: bool = False
    skips_dim: Optional[int] = None
    kernel_size: int = 2
    groups: int = 1
    act_f: str = "Tanh"
    act_g: Optional[str] = "Sigmoid"
    pad_side: int = 1
    stride: int = 1
    use_bias: bool = True
    dilation: int = 1
    with_affine_residuals: bool = False

    @property
    def cause(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    @property
    def needs_padding(self) -> bool:
        return self.pad_side != 0

    @property
    def has_gated_units(self) -> bool:
        return self.act_g is not None

    @property
    def has_skips(self) -> bool:
        return self.skips_dim is not None

    @property
    def has_residuals(self) -> bool:
        return self.residuals_dim is not None and (
            self.input_dim is None or self.input_dim == self.residuals_dim
        )

    def _dims(self):
        if self.residuals_dim is None:
            main_inner = main_outer = self.dims_dilated[0]
        else:
            main_outer = self.residuals_dim
            main_inner = self.dims_dilated[0]
        in_dim = main_outer if self.input_dim is None else self.input_dim
        return in_dim, main_inner, main_outer

    def setup(self):
        _, main_inner, main_outer = self._dims()
        mult = 2 if self.has_gated_units else 1
        self.conv_dil = [
            nn.Conv(
                d * mult,
                kernel_size=(self.kernel_size,),
                kernel_dilation=self.dilation,
                strides=self.stride,
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                padding="VALID",
                name=f"conv_dil{i}",
            )
            for i, d in enumerate(self.dims_dilated)
        ]
        self.conv_1x1 = [
            nn.Conv(
                main_inner * mult,
                kernel_size=(1,),
                strides=self.stride,
                use_bias=self.use_bias,
                padding="VALID",
                name=f"conv_1x1_{i}",
            )
            for i, _ in enumerate(self.dims_1x1)
        ]
        if self.has_skips:
            self.conv_skip = nn.Conv(
                self.skips_dim, kernel_size=(1,), use_bias=self.use_bias,
                padding="VALID", name="conv_skip",
            )
        if self.has_residuals:
            self.conv_res = nn.Conv(
                main_outer, kernel_size=(1,), use_bias=self.use_bias,
                padding="VALID", name="conv_res",
            )
        if self.with_affine_residuals:
            in_dim, _, _ = self._dims()
            self.aff_res = nn.Dense(in_dim * 3, name="aff_res")

    def _act(self, name):
        # plain functions (not submodules): WNLayer is setup-based, and the
        # reference only uses stateless activations here
        from ..modules.activations import _PLAIN

        return _PLAIN[str(name)]

    def _affine(self, x):
        x_hat, a, b = jnp.split(self.aff_res(x), 3, axis=-1)
        return x_hat * a + b

    def trim_cause(self, x):
        cs = self.cause
        if cs == 0:
            return x
        return x[:, cs:] if self.pad_side >= 0 else x[:, :-cs]

    def __call__(
        self,
        inputs_dilated: Tuple,
        inputs_1x1: Tuple = (),
        skips=None,
        decode: bool = False,
    ):
        act_f = self._act(self.act_f)
        act_g = self._act(self.act_g) if self.has_gated_units else None

        x_in = inputs_dilated[0]
        if self.needs_padding and not decode:
            # (B, T, D): pad the time axis on the causal side
            x_in = causal_pad(x_in, (self.pad_side * self.cause, 0))

        if self.has_gated_units:
            cond_f, cond_g = 0.0, 0.0
            for conv, c in zip(self.conv_1x1, inputs_1x1):
                if not self.needs_padding and not decode:
                    c = self.trim_cause(c)
                y_fg = conv(c)
                y_f, y_g = jnp.split(y_fg, 2, axis=-1)
                cond_f = cond_f + y_f
                cond_g = cond_g + y_g
            if self.with_affine_residuals:
                x_in = self._affine(x_in)
            x_fg = self.conv_dil[0](x_in)
            x_f, x_g = jnp.split(x_fg, 2, axis=-1)
            y = act_f(x_f + cond_f) * act_g(x_g + cond_g)
        else:
            cond = 0.0
            for conv, c in zip(self.conv_1x1, inputs_1x1):
                if not self.needs_padding and not decode:
                    c = self.trim_cause(c)
                if self.with_affine_residuals:
                    c = self._affine(c) + c
                cond = cond + conv(c)
            if self.with_affine_residuals:
                x_in = self._affine(x_in)
            y = self.conv_dil[0](x_in)
            y = act_f(y + cond)

        if self.has_skips:
            if skips is not None and not self.needs_padding and not decode:
                skips = self.trim_cause(skips)
            if skips is None:
                skips = self.conv_skip(y)
            else:
                skips = self.conv_skip(y) + skips
        if self.has_residuals:
            if decode:
                x_res = inputs_dilated[0][:, -1:]
            else:
                x_res = self.trim_cause(inputs_dilated[0]) if not self.needs_padding else inputs_dilated[0]
            y = x_res + self.conv_res(y)
        return y, skips


class WaveNetCore(nn.Module):
    """Pure functional core: input adapters -> layer stack -> output heads."""

    layers_cfg: Tuple[dict, ...]
    input_modules: Tuple[nn.Module, ...]
    output_modules: Tuple[nn.Module, ...]
    skips_dim: Optional[int]
    pad_side: int
    layerwise_inputs: bool
    reverse_layer_order: bool
    tie_io_weights: bool = False

    def setup(self):
        cfgs = (
            tuple(reversed(self.layers_cfg))
            if self.reverse_layer_order
            else self.layers_cfg
        )
        self.layers = [WNLayer(**cfg, name=f"layer{i}") for i, cfg in enumerate(cfgs)]

    @property
    def eval_slice(self):
        return slice(-1, None) if self.pad_side == 1 else slice(0, 1)

    def _adapt_inputs(self, inputs, train):
        from ..modules.io import Pipeline

        out = []
        for mod, x in zip(self.input_modules, inputs):
            y = mod(x, train=train) if isinstance(mod, Pipeline) else mod(x)
            out.append(y)
        return tuple(out)

    def _tied_kernel(self, j: int):
        """Transposed input kernel for live io weight tying; None when the
        shapes don't line up (e.g. embedding inputs, like the reference's
        name-matched Linear-only tying)."""
        if not self.tie_io_weights or j >= len(self.input_modules):
            return None
        try:
            p = self.input_modules[j].variables["params"]
        except Exception:
            return None
        leaves = [
            leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(p)[0]
            if "kernel" in jax.tree_util.keystr(path) and leaf.ndim == 2
        ]
        if len(leaves) != 1:
            return None
        return leaves[0].T

    def __call__(self, inputs: Tuple, hidden=None, train: bool = False,
                 temperature=None):
        xs = self._adapt_inputs(inputs, train)
        dilated, in_1x1, skips = xs[0], xs[1:], None
        for layer in self.layers:
            dilated, skips = layer((dilated,), in_1x1, skips)
            if self.layerwise_inputs:
                dilated = dilated + xs[0][:, -dilated.shape[1]:]
            if not layer.needs_padding:
                in_1x1 = tuple(layer.trim_cause(x) for x in in_1x1)
        y = skips if self.skips_dim is not None else dilated
        if not train:
            y = y[:, self.eval_slice]
            outputs = tuple(
                mod(y, train=False, temperature=temperature,
                    tied_kernel=self._tied_kernel(j))
                for j, mod in enumerate(self.output_modules)
            )
        else:
            outputs = tuple(
                mod(y, train=True, tied_kernel=self._tied_kernel(j))
                for j, mod in enumerate(self.output_modules)
            )
        return outputs, ()

    # -- fast decode --------------------------------------------------------
    def warm_up(self, inputs: Tuple):
        """Run the stack over an rf-length window collecting each layer's
        input activations; returns per-layer rolling buffers of length
        ``cause_i`` (the state a decode step expects)."""
        xs = self._adapt_inputs(inputs, False)
        dilated, in_1x1 = xs[0], xs[1:]
        buffers = []
        skips = None
        for layer in self.layers:
            buffers.append(dilated[:, -layer.cause :] if layer.cause > 0 else dilated[:, :0])
            dilated, skips = layer((dilated,), in_1x1, skips)
            if self.layerwise_inputs:
                dilated = dilated + xs[0][:, -dilated.shape[1]:]
            if not layer.needs_padding:
                in_1x1 = tuple(layer.trim_cause(x) for x in in_1x1)
        return tuple(buffers)

    def decode_step(self, samples: Tuple, buffers, temperature=None):
        """One AR step: ``samples`` are the newest input values (B, 1)-shaped
        per input variable; buffers hold each layer's past inputs."""
        xs = self._adapt_inputs(samples, False)
        dilated, in_1x1 = xs[0], xs[1:]  # (B, 1, D) each
        skips = None
        new_buffers = []
        for i, layer in enumerate(self.layers):
            window = jnp.concatenate([buffers[i], dilated], axis=1)
            new_buffers.append(window[:, 1:] if layer.cause > 0 else buffers[i])
            dilated, skips = layer((window,), in_1x1, skips, decode=True)
            if self.layerwise_inputs:
                dilated = dilated + xs[0]
        y = skips if self.skips_dim is not None else dilated
        outputs = tuple(
            mod(y, train=False, temperature=temperature,
                tied_kernel=self._tied_kernel(j))
            for j, mod in enumerate(self.output_modules)
        )
        return outputs, tuple(new_buffers)


class WaveNet(ARM):
    @dtc.dataclass
    class Config(NetworkConfig):
        io_spec: "IOSpec" = None
        kernel_sizes: Tuple[int, ...] = (2,)
        blocks: Tuple[int, ...] = (4,)
        dims_dilated: Tuple[int, ...] = (128,)
        dims_1x1: Tuple[int, ...] = ()
        residuals_dim: Optional[int] = None
        apply_residuals: bool = False
        skips_dim: Optional[int] = None
        with_affine_residuals: bool = False
        groups: int = 1
        act_f: str = "Tanh"
        act_g: Optional[str] = "Sigmoid"
        pad_side: int = 0
        stride: int = 1
        bias: bool = True
        use_fast_generate: bool = True
        tie_io_weights: bool = False
        layerwise_inputs: bool = False
        reverse_layer_order: bool = False

    @classmethod
    def get_kernels_and_dilation(cls, kernel_sizes, blocks):
        """The reference's four block/kernel spellings
        (``wavenet_v2.py:295-327``)."""
        if not blocks:
            dilation = accumulate([1, *kernel_sizes], opr.mul)
        else:
            if len(set(blocks)) == 1 and set(blocks).pop() == len(kernel_sizes):
                dilation = chain(
                    *[
                        list(accumulate([1, *kernel_sizes[:-1]], opr.mul))
                        for _ in range(len(blocks))
                    ]
                )
                kernel_sizes = chain(*([kernel_sizes] * len(blocks)))
            elif len(kernel_sizes) == sum(blocks):
                cum_blocks = list(accumulate(blocks, opr.add))
                dilation = []
                for start, stop in zip([0] + cum_blocks, cum_blocks):
                    ks = kernel_sizes[start : stop - 1]
                    dilation += list(accumulate([1, *ks], opr.mul))
            elif len(kernel_sizes) == 1:
                k = kernel_sizes[0]
                kernel_sizes = (k for _ in range(sum(blocks)))
                dilation = (k ** i for block in blocks for i in range(block))
            else:
                raise ValueError(
                    "number of layers and number of kernel sizes not"
                    f" compatible. Got kernel_sizes={kernel_sizes} ;"
                    f" blocks={blocks}"
                )
        return kernel_sizes, dilation

    @classmethod
    def get_layers_cfg(cls, config: "WaveNet.Config") -> List[dict]:
        kernel_sizes, dilation = cls.get_kernels_and_dilation(
            config.kernel_sizes, config.blocks
        )
        pairs = list(zip(kernel_sizes, dilation))
        n_layers = len(pairs)
        return [
            dict(
                input_dim=config.dims_dilated[0],
                dims_dilated=config.dims_dilated,
                dims_1x1=config.dims_1x1,
                residuals_dim=(
                    config.residuals_dim if n != n_layers - 1 else None
                ),
                apply_residuals=config.apply_residuals and n != 0,
                skips_dim=config.skips_dim,
                kernel_size=k,
                groups=config.groups,
                act_f=str(config.act_f),
                act_g=str(config.act_g) if config.act_g is not None else None,
                pad_side=config.pad_side,
                stride=config.stride,
                use_bias=config.bias,
                dilation=d,
                with_affine_residuals=config.with_affine_residuals,
            )
            for n, (k, d) in enumerate(pairs)
        ]

    @classmethod
    def from_config(cls, config: "WaveNet.Config") -> "WaveNet":
        layers_cfg = cls.get_layers_cfg(config)
        all_dims = [*config.dims_dilated, *config.dims_1x1]
        input_modules = [
            spec.module.copy().set(out_dim=h_dim).module()
            for spec, h_dim in zip(config.io_spec.inputs, all_dims)
        ]
        if config.skips_dim is not None:
            all_dims[0] = config.skips_dim
        all_dims = len(config.io_spec.targets) * [all_dims[0]]
        output_modules = [
            spec.module.copy().set(in_dim=h_dim).module()
            for spec, h_dim in zip(config.io_spec.targets, all_dims)
        ]
        core = WaveNetCore(
            layers_cfg=tuple(layers_cfg),
            input_modules=tuple(input_modules),
            output_modules=tuple(output_modules),
            skips_dim=config.skips_dim,
            pad_side=config.pad_side,
            layerwise_inputs=config.layerwise_inputs,
            reverse_layer_order=config.reverse_layer_order,
            tie_io_weights=config.tie_io_weights,
        )
        return cls(config=config, core=core)

    def __init__(self, *, config: "WaveNet.Config", core: WaveNetCore):
        self._config = config
        self.module = core
        self.params = None
        self.training = True
        self._apply_train = None
        self._decoders = {}
        self._gen_buffers = None

    @property
    def config(self) -> "WaveNet.Config":
        return self._config

    @property
    def shift(self) -> int:
        return 1 if self.config.pad_side == 1 else self.rf

    @property
    def rf(self) -> int:
        causes = [
            (cfg["kernel_size"] - 1) * cfg["dilation"]
            for cfg in self.get_layers_cfg(self.config)
        ]
        return sum(causes) + 1

    def output_length(self, n_input_steps: int) -> int:
        return (
            n_input_steps
            if (self.config.pad_side != 0)
            else (n_input_steps - self.shift + 1)
        )

    @property
    def use_fast_generate(self):
        return self._config.use_fast_generate

    # -- params / forward ---------------------------------------------------
    def _dummy_input(self, spec, B, T):
        from ..features.functionals import Discrete as _D

        if isinstance(spec.elem_type, _D):
            return jnp.zeros((B, T), jnp.int32)
        return jnp.zeros((B, T, spec.elem_type.size), jnp.float32)

    def init_params(self, batch_size: int = 1, batch_length: Optional[int] = None, rng=None):
        if rng is None:
            rng = self.next_rng()
        T = batch_length if batch_length is not None else self.rf + 1
        dummy = tuple(
            self._dummy_input(spec, batch_size, T)
            for spec in self.config.io_spec.inputs
        )
        variables = self.module.init(
            {"params": rng, "dropout": rng, "sample": rng}, dummy, None, True
        )
        self.params = variables["params"]
        return self.params

    def _ensure_params(self, inputs):
        if self.params is None:
            self.init_params(
                batch_size=np.shape(inputs[0])[0],
                batch_length=np.shape(inputs[0])[1],
            )

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def forward(self, inputs: Tuple, **parameters):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        if self.config.pad_side == 0 and inputs[0].shape[1] < self.rf:
            # XLA would silently emit 0-length conv outputs; the reference
            # (torch) raises — keep that contract
            raise RuntimeError(
                f"input length {inputs[0].shape[1]} is below the receptive"
                f" field {self.rf}"
            )
        self._ensure_params(inputs)
        temperature = parameters.get("temperature", None)
        if self.training:
            outputs, _ = self.module.apply(
                {"params": self.params}, inputs, None, True,
                rngs={"dropout": self.next_rng(), "sample": self.next_rng()},
            )
        else:
            outputs, _ = self.module.apply(
                {"params": self.params}, inputs, None, False, temperature,
                rngs={"sample": self.next_rng()},
            )
        return outputs

    # -- batch specs (reference ``wavenet_v2.py:348-362``) -------------------
    def train_batch(self, item_spec: ItemSpec):
        return tuple(
            spec.to_batch_item(item_spec) for spec in self.config.io_spec.inputs
        ), tuple(
            spec.to_batch_item(
                item_spec + ItemSpec(self.shift, self.output_length(0), unit=Step())
            )
            for spec in self.config.io_spec.targets
        )

    def test_batch(self, item_spec: ItemSpec):
        return self.train_batch(item_spec)

    @property
    def generate_params(self):
        out = set()
        for t_spec in self.config.io_spec.targets:
            sampler = t_spec.objective.get_sampler()
            out |= set(getattr(sampler, "sampling_params", ()) or ())
        return out

    # -- fast decode: scan over generation steps ----------------------------
    def make_decoder(self, prior_t: int, n_steps: int):
        key = (prior_t, n_steps)
        if key in self._decoders:
            return self._decoders[key]
        core = self.module
        rf = self.rf

        def decode(params, bufs, rng, temperature):
            # each scan step t pushes the sample at t-1, so the warm-up
            # window must end at prior_t - 1 (exclusive)
            warm_in = tuple(b[:, prior_t - 1 - rf : prior_t - 1] for b in bufs)
            buffers = core.apply(
                {"params": params}, warm_in, method=WaveNetCore.warm_up
            )

            def body(carry, t):
                bufs, buffers, rng = carry
                samples = tuple(
                    jax.lax.dynamic_slice_in_dim(b, t - 1, 1, axis=1)
                    for b in bufs
                )
                rng, sub = jax.random.split(rng)
                outs, buffers = core.apply(
                    {"params": params},
                    samples,
                    buffers,
                    temperature,
                    method=WaveNetCore.decode_step,
                    rngs={"sample": sub},
                )
                new_bufs = []
                for b, o in zip(bufs, outs):
                    val = o[:, 0].astype(b.dtype)
                    new_bufs.append(
                        jax.lax.dynamic_update_slice_in_dim(
                            b, val[:, None], t, axis=1
                        )
                    )
                return (tuple(new_bufs), buffers, rng), None

            ts = jnp.arange(prior_t, prior_t + n_steps)
            # unrolling amortizes per-iteration scan overhead over the many
            # small per-step conv ops (same win as SampleRNN's decoder)
            unroll = int(os.environ.get("MMK_DECODE_UNROLL", "16"))
            (bufs, *_), _ = jax.lax.scan(
                body, (bufs, buffers, rng), ts, unroll=unroll
            )
            return bufs

        fn = jax.jit(decode)
        self._decoders[key] = fn
        return fn

    # -- fused Pallas decode (ops/pallas_decode.py) --------------------------
    def _layer_meta(self):
        cfgs = self.get_layers_cfg(self.config)
        if self.config.reverse_layer_order:
            cfgs = list(reversed(cfgs))
        dilations = tuple(c["dilation"] for c in cfgs)
        has_res = tuple(
            c["residuals_dim"] is not None
            and (c["input_dim"] is None or c["input_dim"] == c["residuals_dim"])
            for c in cfgs
        )
        return dilations, has_res

    def _use_pallas_decode(
        self, B: int, prior_t: int, n_steps: int, argmax: bool = True
    ) -> bool:
        return self._pallas_mode(B, prior_t, n_steps, argmax) is not None

    # whole-loop kernel: rings are scratch in SCOPED VMEM (16 MiB on v5e,
    # separate from the 128 MiB total — measured, see
    # SampleRNN._SCOPED_VMEM_BYTES); caps the 10-layer bench net at B≈24
    _SCOPED_VMEM_BYTES = 15 * 2**20
    _TOTAL_VMEM_BYTES = 100 * 2**20
    # chunked kernel: per-side VMEM budget for the small-dilation rings
    # (the large ones live in HBM and stream one row per step)
    _CHUNK_VMEM_RING_BUDGET = 4 * 2**20
    _PALLAS_CHUNK = 1024
    _PALLAS_CHUNK_MIN = 128
    # below this the whole-loop kernel fits anyway and one dispatch wins
    _PALLAS_CHUNKED_MIN_B = 32

    def _weight_bytes(self) -> int:
        return 4 * sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(self.params)
        )

    def _chunked_ring_split(self, B: int):
        """Greedy VMEM/HBM assignment of the dilation rings: smallest
        dilations first into the VMEM budget (they are touched every 1-2
        steps, so they must not pay DMA latency); the rest go to HBM,
        which requires d >= 4 for the kernel's hazard-free DMA window.
        Returns the per-layer ring_hbm tuple or None."""
        dilations, _ = self._layer_meta()
        D = self.config.dims_dilated[0]
        order = np.argsort(np.asarray(dilations), kind="stable")
        budget = self._CHUNK_VMEM_RING_BUDGET
        hbm = [True] * len(dilations)
        for li in order:
            cost = 4 * B * D * dilations[li]
            if cost <= budget:
                budget -= cost
                hbm[li] = False
        if any(h and d < 4 for h, d in zip(hbm, dilations)):
            return None
        return tuple(hbm)

    def _chunk_for(self, B: int, n_h: int, vring_bytes: int, n_it: int):
        """Largest chunk whose scoped-VMEM tenants fit: the VMEM ring
        out-copies, the (chunk, B) token buffer, the 2-slot DMA landing +
        staging buffers, and the (8, B) token carry."""
        D = self.config.dims_dilated[0]
        bufs = 2 * n_h * 2 * B * D * 4
        fit = (
            self._SCOPED_VMEM_BYTES - vring_bytes - bufs - 32 * B
        ) // (4 * B)
        return max(min(n_it, self._PALLAS_CHUNK, int(fit)), 1)

    def _pallas_mode(self, B, prior_t, n_steps, argmax: bool = True):
        """'single' (whole loop, rings in VMEM scratch — narrow batches),
        'chunked' (state-carrying kernel, large-dilation rings in HBM —
        wide batches), or None (scan / batch-split)."""
        flag = os.environ.get("MMK_PALLAS_DECODE", "auto")
        if flag == "0" or getattr(self, "_pallas_disabled", False):
            return None
        from ..ops.pallas_decode import supports_pallas_wavenet

        if not supports_pallas_wavenet(self) or prior_t < self.rf + 1:
            return None
        if jax.default_backend() == "cpu" and (flag != "1" or not argmax):
            return None
        dilations, _ = self._layer_meta()
        D = self.config.dims_dilated[0]
        w_bytes = self._weight_bytes()
        ring_bytes = 4 * B * D * sum(dilations)
        io_bytes = 4 * B * (n_steps + prior_t)
        single_ok = (
            ring_bytes < self._SCOPED_VMEM_BYTES
            and w_bytes + ring_bytes + io_bytes < self._TOTAL_VMEM_BYTES
        )
        if B < self._PALLAS_CHUNKED_MIN_B and single_ok:
            return "single"
        hbm = self._chunked_ring_split(B)
        if hbm is not None:
            n_h = sum(hbm)
            vring = 4 * B * D * sum(
                d for d, h in zip(dilations, hbm) if not h
            )
            n_it = prior_t + n_steps - 1
            C = self._chunk_for(B, n_h, vring, n_it)
            chunked_ok = (
                C >= min(self._PALLAS_CHUNK_MIN, n_it)
                and C >= 2
                and w_bytes + 4 * B * prior_t + 2 * vring + 8 * B * C
                < self._TOTAL_VMEM_BYTES
            )
            if chunked_ok:
                return "chunked"
        return "single" if single_ok else None

    _PALLAS_SPLIT_MIN_B = 8

    def _pallas_batch_split(
        self, B: int, prior_t: int, n_steps: int, argmax: bool
    ):
        """Sub-batch size to decode a batch too wide for the fused kernel's
        dilation-ring VMEM envelope (the rings scale linearly with B —
        ~0.5 MiB/stream for the 10-layer bench net, capping one kernel at
        B≈24).  Streams are independent, so a wide batch decodes as
        pipelined per-slice kernel dispatches (SampleRNN's batch-split
        pattern).  None when even the smallest useful width fails."""
        sub = B // 2
        while sub >= self._PALLAS_SPLIT_MIN_B:
            if self._use_pallas_decode(sub, prior_t, n_steps, argmax=argmax):
                return sub
            sub //= 2
        return None

    def _pallas_generate(self, prompts, n_steps, temperature, rng):
        from ..ops.pallas_decode import (
            make_wavenet_pallas_chunked,
            make_wavenet_pallas_decoder,
            wavenet_weight_pack,
        )

        prompt = prompts[0]
        B, prior_t = prompt.shape
        argmax = temperature is None
        mode = self._pallas_mode(B, prior_t, n_steps, argmax)
        key = ("pallas", mode, B, prior_t, n_steps, argmax)
        if key not in self._decoders:
            dilations, has_res = self._layer_meta()
            n_head_dense = 0
            core = self.params["output_modules_0"]["estimator"]["core"]
            while f"Dense_{n_head_dense}" in core:
                n_head_dense += 1
            t_mod = self.config.io_spec.targets[0].module
            q = self.config.io_spec.inputs[0].elem_type.size
            D = self.config.dims_dilated[0]
            n_layers, hr = len(dilations), has_res
            interp = jax.default_backend() == "cpu"
            if mode == "single":
                dec = make_wavenet_pallas_decoder(
                    dilations, hr, D, q, n_head_dense,
                    float(t_mod.min_temperature),
                    B, prior_t, n_steps, argmax, interpret=interp,
                )

                @jax.jit
                def run(params, prompt, rng, temp):
                    w = wavenet_weight_pack(params, n_layers, hr)
                    seed = jax.random.randint(
                        rng, (), 0, np.iinfo(np.int32).max
                    )
                    return dec(w, prompt, seed, temp)

            else:
                hbm = self._chunked_ring_split(B)
                n_h = sum(hbm)
                vring = 4 * B * D * sum(
                    d for d, h in zip(dilations, hbm) if not h
                )
                n_it = prior_t + n_steps - 1
                C = self._chunk_for(B, n_h, vring, n_it)
                n_chunks = -(-n_it // C)
                dec = make_wavenet_pallas_chunked(
                    dilations, hr, hbm, D, q, n_head_dense,
                    float(t_mod.min_temperature),
                    B, prior_t, C, argmax, interpret=interp,
                )

                @jax.jit
                def run(params, prompt, rng, temp):
                    w = wavenet_weight_pack(params, n_layers, hr)
                    seed = jax.random.randint(
                        rng, (), 0, np.iinfo(np.int32).max // 2
                    )
                    prompt_T = prompt.astype(jnp.int32).T
                    state = dec.init_state()
                    # token at position t0-1 = prompt[0] (t0 starts at 1)
                    state[0] = jnp.broadcast_to(
                        prompt[:, 0].astype(jnp.int32)[None], (8, B)
                    )
                    chunks = []
                    for j in range(n_chunks):
                        out_c, state = dec(
                            w, prompt_T, seed + j, temp, 1 + j * C, state
                        )
                        chunks.append(out_c)
                    toks_T = jnp.concatenate(chunks, axis=0)
                    # row r holds the token at position 1 + r
                    start = prior_t - 1
                    return toks_T[start : start + n_steps].T

            self._decoders[key] = run
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        tokens = self._decoders[key](self.params, prompt, rng, temp)
        return (jnp.concatenate([prompt, tokens.astype(prompt.dtype)], axis=1),)

    def generate(self, prompts: Tuple, n_steps: int, temperature=None, rng=None):
        prompts = tuple(jnp.asarray(p) for p in prompts)
        self._ensure_params(prompts)
        B, prior_t = prompts[0].shape[0], prompts[0].shape[1]
        if rng is None:
            rng = self.next_rng()
        if self._use_pallas_decode(
            B, prior_t, n_steps, argmax=temperature is None
        ):
            from ..ops.pallas_decode import pallas_generate_or_fallback

            out = pallas_generate_or_fallback(
                self, prompts, n_steps, temperature, rng
            )
            if out is not None:
                return out
        elif not getattr(self, "_pallas_disabled", False):
            sub = self._pallas_batch_split(
                B, prior_t, n_steps, argmax=temperature is None
            )
            # measured crossover (v5e, 10-layer bench net, BENCH_decode):
            # for 'single'-mode slices, 2 still beat the scan (b32) but 3+
            # serialize past it — split b64 2.9M vs scan 3.2M, b128 3.6M
            # vs 4.7M samples/s.  'chunked'-mode slices are ~256 streams
            # each (the state-carrying kernel), so even a many-slice split
            # amortizes — no slice-count cap there.
            sub_chunked = sub is not None and (
                self._pallas_mode(sub, prior_t, n_steps, temperature is None)
                == "chunked"
            )
            if sub is not None and (
                sub_chunked
                or B <= 2 * sub
                or os.environ.get("MMK_PALLAS_DECODE", "auto") == "1"
            ):
                # batch too wide for one kernel's dilation rings: slice and
                # pipeline one fused dispatch per slice (async — the device
                # runs them back-to-back)
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
        # warm-up reads an rf-window ending at prior_t - 1: left-pad short
        # prompts with zeros (static amount, sliced off afterwards)
        pad_left = max(0, self.rf + 1 - prior_t)
        bufs = tuple(
            jnp.concatenate(
                [
                    jnp.zeros((B, pad_left) + p.shape[2:], p.dtype),
                    p,
                    jnp.zeros((B, n_steps) + p.shape[2:], p.dtype),
                ],
                axis=1,
            )
            for p in prompts
        )
        dec = self.make_decoder(prior_t + pad_left, n_steps)
        t_arg = (
            None
            if temperature is None
            else jnp.asarray(temperature, jnp.float32)
        )
        out = dec(self.params, bufs, rng, t_arg)
        if pad_left:
            out = tuple(b[:, pad_left:] for b in out)
        return out

    def stream(self, prompts: Tuple, chunk_steps: int, temperature=None,
               rng=None):
        """Unbounded generation: yield ``(B, chunk_steps)`` token chunks
        forever, continuing EXACTLY across chunks.

        When the chunked fused kernel is eligible (wide stream batches),
        the dilation rings stay on-device across yields, so the argmax
        stream equals one long decode token-for-token; sampled streams
        draw from the same tempered distribution under a per-chunk seed
        schedule (PARITY divergence #9).  Otherwise falls back to
        rf-window re-feeding — exact for WaveNet, whose conditioning is
        precisely the rf window."""
        prompt = jnp.asarray(prompts[0])
        self._ensure_params((prompt,))
        B, prior_t = prompt.shape
        argmax = temperature is None
        if rng is None:
            rng = self.next_rng()
        mode = (
            prior_t >= self.rf + 1
            and self._pallas_mode(B, prior_t, chunk_steps, argmax)
        )
        if mode != "chunked":
            from ..loops.streaming import _refeed_stream

            yield from _refeed_stream(
                self, prompt, chunk_steps, temperature, rng
            )
            return

        from ..ops.pallas_decode import (
            make_wavenet_pallas_chunked,
            wavenet_weight_pack,
        )

        dilations, has_res = self._layer_meta()
        D = self.config.dims_dilated[0]
        hbm = self._chunked_ring_split(B)
        n_h = sum(hbm)
        vring = 4 * B * D * sum(d for d, h in zip(dilations, hbm) if not h)
        C = min(
            max(chunk_steps, self._PALLAS_CHUNK_MIN),
            self._chunk_for(B, n_h, vring, 1 << 30),
        )
        key = ("stream", B, prior_t, C, argmax)
        if key not in self._decoders:
            n_head_dense = 0
            core = self.params["output_modules_0"]["estimator"]["core"]
            while f"Dense_{n_head_dense}" in core:
                n_head_dense += 1
            t_mod = self.config.io_spec.targets[0].module
            q = self.config.io_spec.inputs[0].elem_type.size
            n_layers, hr = len(dilations), has_res
            dec = make_wavenet_pallas_chunked(
                dilations, hr, hbm, D, q, n_head_dense,
                float(t_mod.min_temperature),
                B, prior_t, C, argmax,
                interpret=jax.default_backend() == "cpu",
            )

            @jax.jit
            def run(params, prompt_T, seed, temp, t0, state):
                w = wavenet_weight_pack(params, n_layers, hr)
                return dec(w, prompt_T, seed, temp, t0, state)

            self._decoders[key] = (run, dec.init_state)
        run, init_state = self._decoders[key]
        temp = jnp.asarray(1.0 if argmax else temperature, jnp.float32)
        seed0 = int(
            jax.random.randint(rng, (), 0, np.iinfo(np.int32).max // 2)
        )
        prompt_T = prompt.astype(jnp.int32).T
        state = init_state()
        state[0] = jnp.broadcast_to(
            prompt[:, 0].astype(jnp.int32)[None], (8, B)
        )
        t_abs, k = 1, 0

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
                drop = max(0, prior_t - t_abs)  # prompt-echo warm-up rows
                t_abs += C
                k += 1
                yield out_T, drop

        from ..loops.streaming import _read_behind_chunks

        yield from _read_behind_chunks(dev_chunks(), chunk_steps)

    # -- step-wise parity API ------------------------------------------------
    def before_generate(self, prompts: Tuple, batch_index: int) -> None:
        self._ensure_params(prompts)
        self._gen_buffers = None

    def generate_step(self, inputs: Tuple, *, t: int = 0, **parameters):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        temperature = parameters.get("temperature", None)
        if not self.use_fast_generate:
            outputs = self.forward(inputs, **parameters)
            return outputs
        if self._gen_buffers is None:
            # first call: warm up from the full window, emit from forward
            self._gen_buffers = self.module.apply(
                {"params": self.params}, inputs, method=WaveNetCore.warm_up
            )
            outs, _ = self.module.apply(
                {"params": self.params}, inputs, None, False,
                rngs={"sample": self.next_rng()},
            )
            return outs
        samples = tuple(x[:, -1:] for x in inputs)
        outs, self._gen_buffers = self.module.apply(
            {"params": self.params},
            samples,
            self._gen_buffers,
            temperature,
            method=WaveNetCore.decode_step,
            rngs={"sample": self.next_rng()},
        )
        return outs

    def after_generate(self, final_outputs: Tuple, batch_index: int) -> None:
        self._gen_buffers = None
