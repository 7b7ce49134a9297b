"""Regex-filtered grid file browser (reference ``ui/file_picker.py``)."""
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

        self.root = root if root is not None else os.getcwd()
        self.n_columns = n_columns
        self.show_hidden = show_hidden
        self.pattern = (
            re.compile(pattern) if isinstance(pattern, str) else pattern
        )
        self.multiple = multiple
        search = W.Text(
            placeholder="Search", value="", layout=dict(margin="auto 8px auto auto")
        )
        self.query = None

        def update_query(ev):
            if ev["new"]:
                self.query = re.compile(ev["new"])
                self.update()
            else:
                self.query = None

        search.observe(update_query, "value")
        self.widget = W.VBox(
            [
                W.HBox(
                    children=(
                        W.Label(
                            value="current directory: ",
                            layout=dict(margin="auto 2px auto 8px"),
                        ).add_class("gray-label"),
                        W.Label(
                            value=self.root, layout=dict(margin="auto auto auto 2px")
                        ).add_class("gray-label"),
                        search,
                    ),
                    layout=dict(height="50px"),
                ),
                W.GridBox(
                    layout=Layout(
                        grid_template_columns="1fr " * self.n_columns,
                        grid_auto_rows="min-content",
                        width="98%",
                        height=grid_height,
                        margin="8px 0",
                    )
                ),
                W.Text(disabled=True, layout=Layout(display="none")),
            ],
            layout=Layout(width="100%"),
        )
        self.widget.observe = self.widget.children[-1].observe
        self.widget.value = self.widget.children[-1].value
        self.selected = set() if self.multiple else None
        self.update()

    def update(self):
        from ipywidgets import widgets as W

        self.widget.children[1].children = [
            W.Button(description=_FOLDER + "..", layout=dict(width="auto"))
        ] + [
            W.Button(
                description=(
                    _FOLDER
                    if os.path.isdir(os.path.join(self.root, path))
                    else ""
                )
                + path,
                disabled=self.disabled(path),
                tooltip=path,
                layout=dict(width="auto"),
            ).add_class("picker-button")
            for path in sorted(os.listdir(self.root))
            if self.show_path(path)
        ]
        self.widget.children[1].children[0].on_click(self.click_path)
        for button in self.widget.children[1].children[1:]:
            if (
                button.tooltip is not None
                and self.selected is not None
                and os.path.join(self.root, button.tooltip) in self.selected
            ):
                button.add_class("selected-button")
            else:
                button.remove_class("selected-button")
            button.on_click(self.click_path)

    def show_path(self, path):
        if path[0] == "." and not self.show_hidden:
            return False
        if self.query is not None and not bool(re.search(self.query, path)):
            return False
        return True

    def disabled(self, path):
        return not bool(re.search(self.pattern, path)) and not os.path.isdir(
            os.path.join(self.root, path)
        )

    def click_path(self, button):
        desc = button.description
        if desc.startswith(_FOLDER):
            self.root = os.path.abspath(
                os.path.join(self.root, desc[len(_FOLDER):].strip())
            )
            self.widget.children[0].children[1].value = self.root
        else:
            desc = os.path.join(self.root, desc)
            if self.multiple:
                if desc in self.selected:
                    self.selected.remove(desc)
                    button.remove_class("selected-button")
                else:
                    self.selected.add(desc)
                    button.add_class("selected-button")
            else:
                if self.selected == desc:
                    button.remove_class("selected-button")
                    self.selected = None
                else:
                    button.add_class("selected-button")
                    self.selected = desc
            self.widget.children[-1].value = (
                os.path.split(self.selected)[-1]
                if not self.multiple
                else "<$>".join(os.path.split(p)[-1] for p in self.selected)
            )
        self.update()


SoundFilePicker = partial(FilePicker, pattern=SOUND_FILE_REGEX)
CheckpointPicker = partial(FilePicker, pattern=CHECKPOINT_REGEX)
DatasetPicker = partial(FilePicker, pattern=DATASET_REGEX, multiple=False)
