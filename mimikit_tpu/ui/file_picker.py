"""Regex-filtered grid file browser.

Own-design implementation of the browsing surface the reference exposes
(``ui/file_picker.py``): a directory header with a live search box, a grid
of file/folder buttons (non-matching files disabled, folders navigable),
multi- or single-select with a hidden value widget for observers.

Public surface: ``FilePicker(...).widget`` (a VBox: header / grid / hidden
value text), ``.selected`` (set of absolute paths, or one path / None when
``multiple=False``), and the three pre-filtered variants.
"""
from __future__ import annotations

import os
import re
from functools import partial

from ..utils import CHECKPOINT_REGEX, DATASET_REGEX, SOUND_FILE_REGEX
from .config_view import require_ipywidgets

__all__ = [
    "FilePicker",
    "SoundFilePicker",
    "CheckpointPicker",
    "DatasetPicker",
]

_FOLDER = "\U0001F4C1 "


class FilePicker:
    """Browse from ``root``, selecting files whose names match ``pattern``."""

    def __init__(
        self,
        root=None,
        multiple=True,
        show_hidden=False,
        pattern=".*",
        n_columns=5,
        grid_height="200px",
    ):
        require_ipywidgets()
        from ipywidgets import Layout, widgets as W

        self.root = os.path.abspath(root) if root else os.getcwd()
        self.multiple = multiple
        self.show_hidden = show_hidden
        self.pattern = re.compile(pattern) if isinstance(pattern, str) else pattern
        self.query = None
        self.selected = set() if multiple else None

        self._cwd_label = W.Label(
            value=self.root, layout=dict(margin="auto auto auto 2px")
        ).add_class("gray-label")
        self._search = W.Text(
            placeholder="Search", value="",
            layout=dict(margin="auto 8px auto auto"),
        )
        self._search.observe(self._on_search, "value")
        header = W.HBox(
            children=(
                W.Label(
                    value="current directory: ",
                    layout=dict(margin="auto 2px auto 8px"),
                ).add_class("gray-label"),
                self._cwd_label,
                self._search,
            ),
            layout=dict(height="50px"),
        )
        self._grid = W.GridBox(
            layout=Layout(
                grid_template_columns="1fr " * n_columns,
                grid_auto_rows="min-content",
                width="98%",
                height=grid_height,
                margin="8px 0",
            )
        )
        # hidden text widget: the observable "value" of the whole picker
        self._value = W.Text(disabled=True, layout=Layout(display="none"))
        self.widget = W.VBox(
            [header, self._grid, self._value], layout=Layout(width="100%")
        )
        self.widget.observe = self._value.observe
        self.widget.value = self._value.value
        self.refresh()

    # -- listing --------------------------------------------------------------
    def _entries(self):
        """(name, is_dir) for every visible entry, '..' first."""
        out = [("..", True)]
        for name in sorted(os.listdir(self.root)):
            if name.startswith(".") and not self.show_hidden:
                continue
            if self.query is not None and not self.query.search(name):
                continue
            out.append((name, os.path.isdir(os.path.join(self.root, name))))
        return out

    def _selectable(self, name: str) -> bool:
        return bool(self.pattern.search(name))

    def refresh(self):
        from ipywidgets import widgets as W

        buttons = []
        for name, is_dir in self._entries():
            btn = W.Button(
                description=(_FOLDER + name) if is_dir else name,
                disabled=not (is_dir or self._selectable(name)),
                tooltip=name,
                layout=dict(width="auto"),
            ).add_class("picker-button")
            full = os.path.join(self.root, name)
            if self._is_selected(full):
                btn.add_class("selected-button")
            btn.on_click(self._on_click)
            buttons.append(btn)
        self._grid.children = buttons

    update = refresh  # old name kept for callers

    def _is_selected(self, full_path: str) -> bool:
        if self.multiple:
            return full_path in self.selected
        return self.selected == full_path

    # -- events ---------------------------------------------------------------
    def _on_search(self, change):
        text = change["new"]
        self.query = re.compile(text) if text else None
        self.refresh()

    def _on_click(self, button):
        label = button.description
        if label.startswith(_FOLDER):
            self.root = os.path.abspath(
                os.path.join(self.root, label[len(_FOLDER):].strip())
            )
            self._cwd_label.value = self.root
        else:
            self._toggle(os.path.join(self.root, label))
        self.refresh()

    def _toggle(self, full_path: str):
        if self.multiple:
            if full_path in self.selected:
                self.selected.discard(full_path)
            else:
                self.selected.add(full_path)
            names = (os.path.basename(p) for p in self.selected)
            self._value.value = "<$>".join(names)
        else:
            self.selected = None if self.selected == full_path else full_path
            self._value.value = (
                os.path.basename(self.selected) if self.selected else ""
            )


SoundFilePicker = partial(FilePicker, pattern=SOUND_FILE_REGEX)
CheckpointPicker = partial(FilePicker, pattern=CHECKPOINT_REGEX)
DatasetPicker = partial(FilePicker, pattern=DATASET_REGEX, multiple=False)
