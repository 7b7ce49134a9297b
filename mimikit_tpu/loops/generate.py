"""Autoregressive generation loops.

Rebuild of ``/root/reference/mimikit/loops/generate.py``.  The reference's
hot loop runs ONE PYTHON ITERATION PER AUDIO SAMPLE (``generate.py:207-219``);
here, networks exposing a fast decoder (``net.generate`` — a jitted
``lax.scan``) run the whole decode on-device in a single dispatch, while the
step-wise fallback preserves exact reference semantics for custom nets
(including multi-step ``until`` outputs).
"""
from __future__ import annotations

import dataclasses as dtc
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from ..config import Config
from ..features.item_spec import Frame, ItemSpec, Sample, Second, convert
from ..data.batch import Getter, Input, process_batch
from ..data.samplers import IndicesSampler
from .callbacks import tqdm
from .logger import AudioLogger

__all__ = [
    "GenerateLoopV2",
    "EncodeDecodeLoop",
    "prepare_prompt",
    "generate_tqdm",
]


def prepare_prompt(prompt, n_blanks: int, at_least_nd: int = 2):
    def _prepare(p):
        p = np.asarray(p)
        while p.ndim < at_least_nd:
            p = p[None]
        if n_blanks > 0:
            blanks = np.zeros((p.shape[0], n_blanks, *p.shape[2:]), p.dtype)
            return np.concatenate((p, blanks), axis=1)
        return p

    return process_batch(
        prompt, lambda x: isinstance(x, np.ndarray), _prepare
    )


def generate_tqdm(rng):
    return tqdm(
        rng, desc="Generate", dynamic_ncols=True, leave=False, unit="step",
        mininterval=1.0,
    )


def _fill(x, prior_t: int, n_steps: int):
    """[prompt | zeros]: pre-allocate the output buffer."""
    x = np.asarray(x)
    blanks = np.zeros((x.shape[0], n_steps, *x.shape[2:]), x.dtype)
    return np.concatenate([x, blanks], axis=1)


class PromptIndices(Input):
    """Pseudo-input yielding the drawn prompt index itself."""

    def __init__(self, n: int):
        super().__init__(data=None, getter=Getter(n=n))

    def __call__(self, item, file=None, **kwargs):
        return np.array([item], dtype=np.int32)


class GenerateLoopV2:
    @dtc.dataclass
    class Config(Config):
        output_duration_sec: float = 1.0
        prompts_length_sec: float = 1.0
        prompts_position_sec: Tuple[Optional[float], ...] = (None,)
        parameters: Optional[Dict[str, Any]] = None
        batch_size: int = 1
        downsampling: int = 1

        output_name_template: Optional[str] = None
        display_waveform: bool = True
        write_waveform: bool = False
        yield_inversed_outputs: bool = True
        callback: Optional[Callable] = None

    @classmethod
    def get_n_steps(cls, config: "GenerateLoopV2.Config", network) -> int:
        io_spec = network.config.io_spec
        sr = io_spec.sr
        unit = io_spec.unit
        output_n_samples = int(sr * config.output_duration_sec)
        if isinstance(unit, Frame):
            return convert(output_n_samples, Sample(1), unit, as_length=True) + 1
        return output_n_samples

    @classmethod
    def get_dataloader(cls, config, dataset, network):
        io_spec = network.config.io_spec
        sr = io_spec.sr
        prompt_n_samples = int(sr * config.prompts_length_sec)
        max_i = dataset.signal.shape[0] - prompt_n_samples
        prompt_spec = ItemSpec(0, length=config.prompts_length_sec, unit=Second(sr))
        prompt_batch, _ = network.test_batch(prompt_spec)
        prompt_batch = (PromptIndices(n=max_i), *prompt_batch)
        indices = tuple(
            int(x * sr) if x is not None else x
            for x in config.prompts_position_sec
        )
        return dataset.serve(
            prompt_batch,
            sampler=IndicesSampler(
                N=len(indices),
                indices=indices,
                max_i=max_i,
                redraw=True,
                sampling_stride=config.downsampling,
            ),
            shuffle=False,
            batch_size=config.batch_size,
        )

    @classmethod
    def from_config(cls, config: "GenerateLoopV2.Config", dataset, network):
        n_steps = cls.get_n_steps(config, network)
        dataloader = cls.get_dataloader(config, dataset, network)
        logger = AudioLogger(
            sr=network.config.io_spec.sr,
            file_template=(
                config.output_name_template if config.write_waveform else None
            ),
            title_template=(
                config.output_name_template if config.display_waveform else None
            ),
        )
        return cls(config, network, n_steps, dataloader, logger)

    def __init__(self, config, network, n_steps, dataloader, logger=None):
        self.config = config
        self.network = network
        self.n_steps = n_steps
        self.dataloader = dataloader
        self.logger = logger
        self.template_vars = {}
        self._was_training = False

    def setup(self):
        self._was_training = getattr(self.network, "training", False)
        if hasattr(self.network, "eval"):
            self.network.eval()

    def teardown(self):
        if self._was_training and hasattr(self.network, "train"):
            self.network.train()

    def _gather_params(self) -> dict:
        params = self.config.parameters or {}
        return {
            k: v for k, v in params.items() if k in self.network.generate_params
        }

    def run(self):
        self.setup()
        for batch in self.dataloader:
            prompt_idx, batch = batch[0], batch[1:]
            prompt_idx = np.asarray(prompt_idx).reshape(-1)
            params = self._gather_params()

            if self._fast_path_accepts(params):
                # fast path: whole decode as one on-device scan, with ALL
                # gathered sampler params forwarded (a knob the fast path
                # doesn't accept routes through the stepwise loop instead of
                # being silently dropped)
                final_outputs = tuple(
                    np.asarray(b)
                    for b in self.network.generate(batch, self.n_steps, **params)
                )
            else:
                if (
                    getattr(self.network, "generate", None) is not None
                    and not getattr(self, "_warned_stepwise", False)
                    and self._device_step_fn(params) is None
                ):
                    # the stepwise loop is reference-semantics but orders of
                    # magnitude slower (seq2seq: 3.3 frames/s vs 61k fast,
                    # BENCH_decode.json) — a config quirk routing here must
                    # not be silent
                    import warnings

                    unsupported = sorted(
                        set(params)
                        - set(
                            __import__("inspect")
                            .signature(self.network.generate)
                            .parameters
                        )
                    )
                    warnings.warn(
                        f"{type(self.network).__name__} has a fast whole-"
                        f"decode `generate`, but sampler param(s) "
                        f"{unsupported} are not in its signature — falling "
                        "back to the per-step reference loop, which can be "
                        ">10,000x slower. Drop the unsupported param(s) to "
                        "use the fast path.",
                        stacklevel=2,
                    )
                    self._warned_stepwise = True
                final_outputs = self._stepwise(batch, prompt_idx, params)

            outputs = self.process_outputs(
                final_outputs, prompt_idx, **self.template_vars
            )
            yield outputs
            if self.config.callback is not None:
                self.config.callback(outputs)
        self.teardown()

    def _fast_path_accepts(self, params: dict) -> bool:
        """True when the network has a whole-decode ``generate`` whose
        signature covers every gathered sampler param."""
        gen = getattr(self.network, "generate", None)
        if gen is None:
            return False
        import inspect

        sig = inspect.signature(gen)
        if any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in sig.parameters.values()
        ):
            return True
        return set(params) <= set(sig.parameters)

    def _device_step_fn(self, params: dict):
        """The network's pure jit-safe step (``stepwise_step_fn``), or None."""
        get = getattr(self.network, "stepwise_step_fn", None)
        if get is None:
            return None
        try:
            return get(params)
        except Exception:
            return None

    def _stepwise(self, batch, prompt_idx, params):
        """Reference-semantics per-step loop (supports ``until`` multi-step
        outputs and arbitrary ARM implementations).

        When the network exposes a pure ``stepwise_step_fn`` the loop runs
        entirely on device as ONE jitted ``lax.scan`` over the (statically
        precomputed) visited-step schedule — token-identical to the host
        loop for deterministic steps, pinned in ``tests/test_gen_loop.py``.
        The host loop pays a tunnel round trip per python op otherwise
        (~3 frames/s vs hundreds, BENCH_decode.json: seq2seq_stepwise_b1).
        """
        net = self.network
        net.before_generate(batch, prompt_idx)
        step_fn = self._device_step_fn(params)
        if step_fn is not None:
            out = self._stepwise_device(batch, prompt_idx, step_fn)
            if out is not None:
                return out
        rf, prior_t, n_steps = net.rf, np.shape(batch[0])[1], self.n_steps
        tensors = [np.asarray(_fill(x, prior_t, n_steps)) for x in batch]
        until = 0
        for t in generate_tqdm(range(prior_t, prior_t + n_steps)):
            if t < until:
                continue
            inputs = tuple(tensor[:, t - rf : t] for tensor in tensors)
            outputs = net.generate_step(inputs, t=t, **params)
            if not isinstance(outputs, tuple):
                outputs = (outputs,)
            for tensor, out in zip(tensors, outputs):
                if out is not None:
                    out = np.asarray(out)
                    if out.ndim < tensor[:, :1].ndim:
                        out = out[:, None]
                    n_out = min(out.shape[1], tensor.shape[1] - t)
                    tensor[:, t : t + n_out] = out[:, :n_out]
                    until = t + n_out
        final_outputs = tuple(tensors)
        net.after_generate(final_outputs, prompt_idx)
        return final_outputs

    def _stepwise_device(self, batch, prompt_idx, step_fn):
        """Device-resident twin of the host loop above.

        The visited-``t`` schedule is fully static (each output's write
        width is shape-determined), so it is precomputed on host and the
        whole decode runs as one ``lax.scan`` dispatch: slice the ``rf``
        window, apply ``step_fn``, ``dynamic_update_slice`` the outputs.
        Buffers carry ``max_width - 1`` padding frames so the final
        (possibly truncated) write stays shape-static; the pad is sliced
        off before returning.  Returns None (→ host loop) whenever the
        step's shapes can't be made static (short prompt, trace failure).
        """
        import jax
        import jax.numpy as jnp

        net = self.network
        rf, prior_t, n_steps = net.rf, np.shape(batch[0])[1], self.n_steps
        if not rf or rf <= 0 or prior_t < rf or n_steps <= 0:
            return None
        arrs = [np.asarray(_fill(x, prior_t, n_steps)) for x in batch]
        B = arrs[0].shape[0]
        net_params = getattr(net, "params", None)
        key0 = jax.random.PRNGKey(0)
        win_specs = tuple(
            jax.ShapeDtypeStruct((B, rf) + a.shape[2:], a.dtype) for a in arrs
        )
        try:
            probe = jax.eval_shape(step_fn, net_params, win_specs, key0)
        except Exception:
            return None
        if not isinstance(probe, tuple):
            probe = (probe,)
        if len(probe) > len(arrs):
            return None
        # per-output write width (None = tensor not written); mirrors the
        # host loop's `out[:, None]` ndim fix + `until = t + n_out`
        widths = []
        for a, o in zip(arrs, probe):
            if o is None:
                widths.append(None)
                continue
            shp = tuple(o.shape)
            if len(shp) < a.ndim:
                shp = (shp[0], 1) + shp[1:]
            if len(shp) != a.ndim or shp[0] != B or shp[2:] != a.shape[2:]:
                return None
            widths.append(int(shp[1]))
        written = [w for w in widths if w is not None]
        if not written:
            return None
        # static visited-step schedule (identical to the host loop's
        # `if t < until: continue` given shape-static write widths)
        visited, until = [], 0
        for t in range(prior_t, prior_t + n_steps):
            if t < until:
                continue
            visited.append(t)
            for w in widths:
                if w is not None:
                    until = t + w
        pad = max(written) - 1
        L = prior_t + n_steps

        cache = getattr(self, "_device_scan_cache", None)
        if cache is None:
            cache = self._device_scan_cache = {}
        key = (
            id(step_fn), rf, tuple(visited[:1]), len(visited), L,
            tuple((a.shape, str(a.dtype)) for a in arrs),
        )
        run = cache.get(key)
        if run is None:

            @jax.jit
            def run(params, bufs, ts, keys):
                def scan_step(carry, tk):
                    t, k = tk
                    wins = tuple(
                        jax.lax.dynamic_slice_in_dim(b, t - rf, rf, axis=1)
                        for b in carry
                    )
                    outs = step_fn(params, wins, k)
                    if not isinstance(outs, tuple):
                        outs = (outs,)
                    outs = outs + (None,) * (len(carry) - len(outs))
                    new = []
                    for b, o in zip(carry, outs):
                        if o is None:
                            new.append(b)
                            continue
                        if o.ndim < b.ndim:
                            o = o[:, None]
                        o = o.astype(b.dtype)
                        new.append(
                            jax.lax.dynamic_update_slice_in_dim(
                                b, o, t, axis=1
                            )
                        )
                    return tuple(new), None

                final, _ = jax.lax.scan(scan_step, bufs, (ts, keys))
                return tuple(b[:, :L] for b in final)

            cache[key] = run

        bufs = tuple(
            jnp.asarray(
                np.concatenate(
                    [a, np.zeros((B, pad) + a.shape[2:], a.dtype)], axis=1
                )
            ) if pad else jnp.asarray(a)
            for a in arrs
        )
        base = (
            net.next_rng() if hasattr(net, "next_rng") else jax.random.PRNGKey(0)
        )
        keys = jax.random.split(base, len(visited))
        ts = jnp.asarray(visited, jnp.int32)
        final = run(net_params, bufs, ts, keys)
        final_outputs = tuple(np.asarray(b) for b in final)
        net.after_generate(final_outputs, prompt_idx)
        return final_outputs

    def process_outputs(self, final_outputs, prompt_idx, **template_vars):
        if (
            self.logger is None
            or (not self.config.write_waveform and not self.config.display_waveform)
        ) and not self.config.yield_inversed_outputs:
            return final_outputs
        features = self.network.config.io_spec.targets
        outputs = tuple(
            np.asarray(feature.inv(out))
            for feature, out in zip(features, final_outputs)
        )
        for output in outputs:
            for example, idx in zip(output, prompt_idx):
                if self.config.write_waveform:
                    self.logger.write(example, prompt_idx=int(idx), **template_vars)
                if self.config.display_waveform:
                    self.logger.display(example, prompt_idx=int(idx), **template_vars)
        return outputs if self.config.yield_inversed_outputs else final_outputs


class EncodeDecodeLoop(GenerateLoopV2):
    """Reconstruction loop for autoencoders: steps ``range(rf, prior_t, rf)``
    re-encoding the prompt in place (reference ``generate.py:255-406``)."""

    @dtc.dataclass
    class Config(Config):
        prompts_length_sec: float = 1.0
        prompts_position_sec: Tuple[Optional[float], ...] = (None,)
        parameters: Optional[Dict[str, Any]] = None
        batch_size: int = 1
        downsampling: int = 1

        output_name_template: Optional[str] = None
        display_waveform: bool = True
        write_waveform: bool = False
        yield_inversed_outputs: bool = True
        callback: Optional[Callable] = None

    @classmethod
    def from_config(cls, config, dataset, network):
        dataloader = cls.get_dataloader(config, dataset, network)
        logger = AudioLogger(
            sr=network.config.io_spec.sr,
            file_template=(
                config.output_name_template if config.write_waveform else None
            ),
            title_template=(
                config.output_name_template if config.display_waveform else None
            ),
        )
        return cls(config, network, 0, dataloader, logger)

    def run(self):
        self.setup()
        for batch in self.dataloader:
            prompt_idx, batch = batch[0], batch[1:]
            prompt_idx = np.asarray(prompt_idx).reshape(-1)
            params = self._gather_params()
            net = self.network
            net.before_generate(batch, prompt_idx)
            rf, prior_t = net.rf, np.shape(batch[0])[1]
            # rf == 0 (e.g. TiedAE has no receptive field): reconstruct the
            # whole prompt in one pass
            rf = rf if rf and rf > 0 else prior_t
            tensors = [np.array(x) for x in batch]
            until = 0
            for t in generate_tqdm(range(rf, prior_t + (rf == prior_t), rf)):
                if t < until:
                    continue
                inputs = tuple(tensor[:, t - rf : t] for tensor in tensors)
                outputs = net.generate_step(inputs, t=t, **params)
                if not isinstance(outputs, tuple):
                    outputs = (outputs,)
                for tensor, out in zip(tensors, outputs):
                    if out is not None:
                        out = np.asarray(out)
                        n_out = min(out.shape[1], tensor.shape[1] - t)
                        tensor[:, t - n_out : t] = out[:, :n_out]
                        until = t + n_out
            final_outputs = tuple(tensors)
            net.after_generate(final_outputs, prompt_idx)
            outputs = self.process_outputs(
                final_outputs, prompt_idx, **self.template_vars
            )
            yield outputs
            if self.config.callback is not None:
                self.config.callback(outputs)
        self.teardown()
