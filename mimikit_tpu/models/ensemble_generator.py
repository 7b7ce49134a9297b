"""Checkpoint-chaining generation: one audio stream, many models.

Rebuild of ``/root/reference/mimikit/models/ensemble_generator.py``: an event
stream yields ``Event(generator, seconds, temperature)``; per event the
prompt window is resampled to the network's rate, transformed, decoded with a
nested :class:`GenerateLoopV2`, inverse-transformed and resampled back into
the output buffer.
"""
from __future__ import annotations

import dataclasses as dtc
from pprint import pprint
from typing import Generator, Optional, Union

import numpy as np

from ..checkpoint import Checkpoint
from ..features.functionals import Resample
from ..features.item_spec import Sample, convert
from ..loops.generate import GenerateLoopV2
from .nnn import NearestNextNeighbor

__all__ = ["Event", "EnsembleGenerator", "VotingEnsemble"]


class VotingEnsemble:
    """Weighted sum of several nets' generate_step (legacy interface)."""

    def __init__(self, networks, weights=None):
        self.nets = list(networks)
        N = len(self.nets)
        W = [1 / N] * N if weights is None else list(weights)
        if len(W) != N:
            raise ValueError(
                f"Expected `weights` to be of length {N} but got {len(W)}"
            )
        s = sum(W)
        self.weights = [w / s for w in W]

    def before_generate(self, prompts, batch_index):
        for net in self.nets:
            net.before_generate(prompts, batch_index)

    def generate_step(self, inputs, *, t: int = 0, **parameters):
        out = None
        for w, net in zip(self.weights, self.nets):
            o = net.generate_step(inputs, t=t, **parameters)
            o = o[0] if isinstance(o, tuple) else o
            out = np.asarray(o) * w if out is None else out + np.asarray(o) * w
        return out

    def after_generate(self, final_outputs, batch_index):
        for net in self.nets:
            net.after_generate(final_outputs, batch_index)
        return self


@dtc.dataclass
class Event:
    generator: Union[object, Checkpoint, NearestNextNeighbor]
    seconds: float
    temperature: Optional[float] = None


class EnsembleGenerator:
    """generate from a prompt by chaining checkpoints/models"""

    def __init__(
        self,
        prompt: np.ndarray,
        max_seconds: float = 10.0,
        base_sr: int = 22050,
        stream: Generator = (),
        print_events: bool = False,
    ):
        self.prompt = np.asarray(prompt)
        self.max_seconds = max_seconds
        self.base_sr = base_sr
        self.stream = iter(stream)
        self.print_events = print_events

    def run(self) -> np.ndarray:
        prompt_length = t = self.prompt.shape[-1]
        n_samples = int(self.max_seconds * self.base_sr)
        output = np.zeros(
            (self.prompt.shape[0], n_samples), dtype=np.float32
        )
        output[:, :t] = self.prompt
        while t < n_samples:
            prompt = output[:, t - prompt_length : t]
            step_output = self.generate_step(t, prompt)
            if step_output is None:
                break
            n = min(step_output.shape[1], n_samples - t)
            output[:, t : t + n] = step_output[:, :n]
            t += n
        return output

    def generate_step(self, t, inputs):
        if t >= int(self.max_seconds * self.base_sr):
            return None
        try:
            event, net, n_steps, params = self.next_event()
        except StopIteration:
            return None
        if (t / self.base_sr + event.seconds) < self.max_seconds:
            if self.print_events:
                e = dtc.asdict(event)
                e.update({"start": t / self.base_sr})
                pprint(e)
            return self.run_event(inputs, net, n_steps, params)
        return np.zeros(
            (inputs.shape[0], int(self.max_seconds * self.base_sr - t)),
            np.float32,
        )

    def run_event(self, inputs: np.ndarray, net, n_steps: int, params: dict):
        network_sr = net.config.io_spec.sr
        resample = Resample(self.base_sr, network_sr)
        inputs_resampled = np.stack([resample(x) for x in inputs])
        prompt = tuple(
            np.stack([in_spec.transform(x) for x in inputs_resampled])
            for in_spec in net.config.io_spec.inputs
        )
        # ffts use LESS input samples than provided
        n_prompt_samples = convert(
            prompt[0].shape[1],
            net.config.io_spec.targets[0].unit,
            Sample(sr=network_sr),
            True,
        )
        cfg = GenerateLoopV2.Config(
            parameters=params,
            display_waveform=False,
            write_waveform=False,
            yield_inversed_outputs=True,
        )
        loop = GenerateLoopV2(
            cfg,
            network=net,
            n_steps=n_steps,
            dataloader=[[np.ones(1), *prompt]],
            logger=None,
        )
        for outputs in loop.run():
            inv_resample = Resample(network_sr, self.base_sr)
            out = np.stack(
                [inv_resample(x) for x in np.asarray(outputs[0])[:, n_prompt_samples:]]
            )
            return out
        return None

    def next_event(self):
        event = Event(**next(self.stream))
        if isinstance(event.generator, Checkpoint):
            net = event.generator.network
        elif isinstance(event.generator, NearestNextNeighbor):
            net = event.generator
        else:
            raise TypeError(
                f"event generator type '{type(event.generator)}' not supported"
            )
        cfg = GenerateLoopV2.Config(output_duration_sec=event.seconds)
        n_steps = GenerateLoopV2.get_n_steps(cfg, net)
        params = (
            dict(temperature=event.temperature)
            if event.temperature is not None
            else {}
        )
        return event, net, n_steps, params
