"""Checkpoint-to-audio view (reference ``views/generate_from_checkpoint.py``):
pick checkpoint -> pick prompt positions -> run GenerateLoopV2 -> display."""
from __future__ import annotations

import numpy as np

from ..checkpoint import Checkpoint
from ..loops.generate import GenerateLoopV2
from ..ui.config_view import require_ipywidgets
from ..ui.file_picker import CheckpointPicker
from .timestamps_selector import TimeStampsSelector

__all__ = ["GenerateFromCheckpointView"]


class GenerateFromCheckpointView:
    def __init__(self, root_dir: str = "./"):
        require_ipywidgets()
        from ipywidgets import widgets as W

        self.title = W.HTML("<h4>Select Checkpoint</h4>")
        self.picker = CheckpointPicker(
            root=root_dir, multiple=False, grid_height="100px"
        )
        self.load_ckpt = W.Button(description="Load")
        self.ckpt = None
        self.prompt_selector = None
        self.sr = None
        self.output_area = W.Output()
        self.n_outputs = 0

        self.prompt_length_w = W.FloatText(value=1.0, step=0.01)
        self.outputs_length_w = W.FloatText(value=30.0, step=0.01)
        self.batch_size_w = W.IntText(value=8)
        self.temperature_w = W.FloatText(value=1.0, step=0.01)
        self.downsampling = 1
        self.generate_w = W.Button(description="Generate", button_style="success")

        self.load_ckpt.on_click(self.load_callback)
        self.generate_w.on_click(self.generate_callback)
        self.container = W.VBox(
            children=(self.title, self.picker.widget, self.load_ckpt)
        )

    @property
    def widget(self):
        return self.container

    def load_callback(self, ev):
        from ipywidgets import widgets as W

        path = self.picker.selected
        if not path:
            return
        self.ckpt = Checkpoint.from_path(path)
        db = self.ckpt.dataset
        self.sr = self.ckpt.network_config.io_spec.sr
        self.downsampling = getattr(
            self.ckpt.training_config, "downsampling", 1
        )
        self.prompt_selector = TimeStampsSelector(
            np.asarray(db.signal[:]), self.sr
        )
        self.container.children = (
            self.title,
            self.picker.widget,
            self.load_ckpt,
            W.HTML("<h4>Pick prompt positions (seconds)</h4>"),
            *(w for w in (self.prompt_selector.widget,) if w is not None),
            W.HBox(
                children=(
                    W.Label("prompt (sec):"), self.prompt_length_w,
                    W.Label("output (sec):"), self.outputs_length_w,
                    W.Label("batch:"), self.batch_size_w,
                    W.Label("temperature:"), self.temperature_w,
                )
            ),
            self.generate_w,
            self.output_area,
        )

    def generate_callback(self, ev):
        positions = self.prompt_selector.positions_sec or (None,)
        loop = GenerateLoopV2.from_config(
            GenerateLoopV2.Config(
                output_duration_sec=float(self.outputs_length_w.value),
                prompts_length_sec=float(self.prompt_length_w.value),
                prompts_position_sec=tuple(positions),
                parameters=dict(temperature=float(self.temperature_w.value)),
                batch_size=max(1, int(self.batch_size_w.value)),
                downsampling=self.downsampling,
                display_waveform=False,
            ),
            self.ckpt.dataset,
            self.ckpt.network,
        )
        with self.output_area:
            for outputs in loop.run():
                for y in np.asarray(outputs[0]):
                    self.n_outputs += 1
                    try:
                        import IPython.display as ipd

                        ipd.display(ipd.Audio(y, rate=self.sr))
                    except ImportError:
                        print(f"output {self.n_outputs}: {y.shape}")
                break
