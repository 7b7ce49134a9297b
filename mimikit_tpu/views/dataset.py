"""Dataset creation view (reference ``views/dataset.py``): pick sound files,
name the file, create the db."""
from __future__ import annotations

import os

from ..features.dataset import DatasetConfig
from ..features.extractor import Extractor
from ..ui.config_view import require_ipywidgets
from ..ui.file_picker import SoundFilePicker

__all__ = ["dataset_view"]


def dataset_view(cfg: DatasetConfig, root=None, on_created=None):
    require_ipywidgets()
    from ipywidgets import widgets as W

    picker = SoundFilePicker(root=root or os.getcwd())
    filename_w = W.Text(value=os.path.basename(cfg.filename) or "dataset.h5")
    sr_w = W.IntText(value=16000, description="sample rate")
    create_btn = W.Button(description="Create Dataset", button_style="success")
    status = W.HTML("")

    def on_click(_):
        sources = tuple(sorted(picker.selected or ()))
        cfg.sources = sources
        cfg.filename = os.path.abspath(filename_w.value)
        if not cfg.extractors:
            cfg.extractors = (Extractor.signal(sr=int(sr_w.value)),)
        try:
            db = cfg.create(mode="w")
            status.value = f"<b>created {cfg.filename}</b>"
            if on_created is not None:
                on_created(db)
        except Exception as e:  # surfaced inline in the notebook
            status.value = f"<b style='color:red'>{e}</b>"

    create_btn.on_click(on_click)
    return W.VBox(
        children=(
            W.HTML("<h4>Select audio files</h4>"),
            picker.widget,
            W.HBox(children=(W.Label("filename:"), filename_w, sr_w)),
            create_btn,
            status,
        )
    )
