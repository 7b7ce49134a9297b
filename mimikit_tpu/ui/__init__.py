"""Notebook UI framework (ipywidgets-based).

Rebuild of ``/root/reference/mimikit/ui/``.  ipywidgets is an optional
dependency: importing this subpackage succeeds without it, widget
construction raises a helpful error.  The Config-binding layer
(:class:`ConfigView`/:class:`Param`) is framework-agnostic — views bind
directly to ``Config`` dataclass instances, so they transfer to the JAX
backend unchanged.
"""
from .config_view import *
from .widgets import *
from .file_picker import *
from .style_sheet import *


def __getattr__(name):
    if name == "MMK_STYLE_SHEET":
        from .style_sheet import get_style_sheet

        return get_style_sheet()
    raise AttributeError(name)
