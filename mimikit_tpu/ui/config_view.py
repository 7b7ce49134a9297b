"""Generic dataclass <-> widget binding (reference ``ui/config_view.py``).

Each :class:`Param` pairs a config field name with a widget and an optional
setter; :class:`ConfigView` registers observers that write widget values back
into the config instance.
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
    name: str
    widget: Any
    setter: Optional[Callable[[Any, Any], Any]] = None
    inverse_transform: Optional[Callable[[Any, Any], Any]] = None
    position: Optional[Tuple[Union[int, slice], Union[int, slice]]] = None


class ConfigView:
    def __init__(self, config: Any, *params: Param, grid_spec=None):
        require_ipywidgets()
        from ipywidgets import GridspecLayout

        self.config = config
        self._callbacks = []
        if grid_spec is not None:
            self.grid = GridspecLayout(*grid_spec, grid_gap="8px 8px")
        else:
            self.grid = GridspecLayout(len(params), 1, grid_gap="4px 8px")
        for i, param in enumerate(params):
            if param.name[0] != "_":  # "_"-prefixed -> no effect on config

                def observer(ev, p=param):
                    setter = p.setter
                    v = ev["new"] if isinstance(ev, dict) else ev
                    val = v if setter is None else setter(config, v)
                    setattr(self.config, p.name, val)
                    self.callback()

                param.widget.observe(observer, "value")
            if param.position is not None:
                self.grid[param.position] = param.widget
            else:
                self.grid[i, 0] = param.widget
        self.params = params

    def as_widget(self, container_cls, **kwargs):
        return container_cls(children=(self.grid,), **kwargs)

    @property
    def widgets(self):
        return [p.widget for p in self.params]

    @staticmethod
    def widget_value(widget):
        """Resolve the live value through composite-widget wrappers."""
        seen = set()
        while hasattr(widget, "_value_source") and id(widget) not in seen:
            seen.add(id(widget))
            widget = widget._value_source
        return getattr(widget, "value", None)

    def apply(self):
        for p in self.params:
            if p.name.startswith("_"):
                continue
            raw = self.widget_value(p.widget)
            v = p.setter(self.config, raw) if p.setter is not None else raw
            setattr(self.config, p.name, v)
        return self

    def callback(self):
        for cb in self._callbacks:
            cb(self.config)
        return self

    def observe(self, callback, _):
        self._callbacks.append(callback)
        return self

    def __repr__(self):
        return self.config.__repr__()
