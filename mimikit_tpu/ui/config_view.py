"""Generic dataclass <-> widget binding.

The view layer's contract (mirroring the reference's ``ui/config_view.py``
surface): a :class:`Param` names one config field and carries the widget
editing it plus an optional value coercion; a :class:`ConfigView` owns a
config instance and keeps it in sync with its params' widgets — widget
events write through immediately, :meth:`ConfigView.apply` pulls all current
widget values at once (resolving composite-widget wrappers through their
``_value_source`` chain).
"""
from __future__ import annotations

import dataclasses as dtc
from typing import Any, Callable, Optional, Tuple, Union

__all__ = ["Param", "ConfigView", "require_ipywidgets"]


def require_ipywidgets():
    try:
        import ipywidgets  # noqa: F401

        return ipywidgets
    except ImportError as e:
        raise ImportError(
            "the notebook UI requires ipywidgets; install it to use"
            " mimikit_tpu's views (pip install ipywidgets)"
        ) from e


@dtc.dataclass()
class Param:
    """One editable config field.

    ``name``: the config attribute ("_"-prefixed names are display-only and
    never written back).  ``setter(config, raw) -> value`` coerces the widget
    value before assignment.  ``position`` places the widget on the grid.
    """

    name: str
    widget: Any
    setter: Optional[Callable[[Any, Any], Any]] = None
    inverse_transform: Optional[Callable[[Any, Any], Any]] = None
    position: Optional[Tuple[Union[int, slice], Union[int, slice]]] = None

    @property
    def display_only(self) -> bool:
        return self.name.startswith("_")

    def coerce(self, config, raw):
        return raw if self.setter is None else self.setter(config, raw)


class ConfigView:
    """Binds a Config instance to a grid of Param widgets."""

    def __init__(self, config: Any, *params: Param, grid_spec=None):
        require_ipywidgets()
        from ipywidgets import GridspecLayout

        self.config = config
        self.params = params
        self._callbacks = []

        rows_cols = grid_spec if grid_spec is not None else (len(params), 1)
        gap = "8px 8px" if grid_spec is not None else "4px 8px"
        self.grid = GridspecLayout(*rows_cols, grid_gap=gap)

        for row, param in enumerate(params):
            self._place(param, default_row=row)
            if not param.display_only:
                self._bind(param)

    # -- layout & binding ---------------------------------------------------
    def _place(self, param: Param, default_row: int):
        where = param.position if param.position is not None else (default_row, 0)
        self.grid[where] = param.widget

    def _bind(self, param: Param):
        def on_change(event, p=param):
            raw = event["new"] if isinstance(event, dict) else event
            setattr(self.config, p.name, p.coerce(self.config, raw))
            self.callback()

        param.widget.observe(on_change, "value")

    # -- value access -------------------------------------------------------
    @staticmethod
    def widget_value(widget):
        """Resolve the live value through composite-widget wrappers."""
        seen = set()
        while hasattr(widget, "_value_source") and id(widget) not in seen:
            seen.add(id(widget))
            widget = widget._value_source
        return getattr(widget, "value", None)

    def apply(self) -> "ConfigView":
        """Pull every param's current widget value into the config."""
        for p in self.params:
            if p.display_only:
                continue
            raw = self.widget_value(p.widget)
            setattr(self.config, p.name, p.coerce(self.config, raw))
        return self

    # -- composition --------------------------------------------------------
    def as_widget(self, container_cls, **kwargs):
        return container_cls(children=(self.grid,), **kwargs)

    @property
    def widgets(self):
        return [p.widget for p in self.params]

    # -- change notification -------------------------------------------------
    def observe(self, callback, _=None) -> "ConfigView":
        self._callbacks.append(callback)
        return self

    def callback(self) -> "ConfigView":
        for cb in self._callbacks:
            cb(self.config)
        return self

    def __repr__(self):
        return self.config.__repr__()
