"""Auto-generated config views.

The reference hand-writes one ipywidgets view per Config type
(``mimikit/views/*.py``).  Here a single factory derives widgets from the
dataclass fields (int -> IntText / pw2 stepper, float -> FloatText,
bool -> yes/no, str-enum -> button group, tuple -> parsed Text), and the
per-config view modules curate labels/layouts on top of it.
"""
from __future__ import annotations

import dataclasses as dtc
import enum
import typing
from typing import Dict, Optional, Sequence

from ..ui.config_view import ConfigView, Param, require_ipywidgets
from ..ui.widgets import EnumWidget, Labeled, pw2_widget, yesno_widget

__all__ = ["auto_config_view", "param_for_field", "accordion"]

_POW2_HINTS = ("dim", "batch", "n_fft", "hop", "size", "length")


def _parse_tuple(v: str, cast=int):
    return tuple(cast(s) for s in v.split(",") if s.strip() != "")


def param_for_field(cfg, f: dtc.Field, label: Optional[str] = None) -> Optional[Param]:
    require_ipywidgets()
    from ipywidgets import widgets as W

    name = f.name
    if name == "type" or f.metadata.get("runtime_only"):
        return None
    label = label or name.replace("_", " ").title()
    value = getattr(cfg, name)
    tp = f.type

    origin = typing.get_origin(tp)
    args = typing.get_args(tp)
    if origin is typing.Union:
        non_none = [a for a in args if a is not type(None)]
        tp = non_none[0] if non_none else str
        origin = typing.get_origin(tp)
        args = typing.get_args(tp)

    if isinstance(value, bool) or tp is bool:
        return Param(
            name=name, widget=Labeled(label, yesno_widget(bool(value)))
        )
    if isinstance(value, enum.Enum) or (
        isinstance(tp, type) and issubclass(tp, enum.Enum)
    ):
        ecls = type(value) if isinstance(value, enum.Enum) else tp
        options = [e.value for e in ecls]
        idx = options.index(str(value)) if str(value) in options else 0
        return Param(
            name=name,
            widget=EnumWidget(label, options, selected_index=idx),
        )
    if isinstance(value, int) and not isinstance(value, bool):
        if any(h in name for h in _POW2_HINTS) and value > 0 and (value & (value - 1)) == 0:
            return Param(
                name=name,
                widget=Labeled(label, pw2_widget(value)),
                setter=lambda c, v: int(v),
            )
        return Param(name=name, widget=Labeled(label, W.IntText(value=value)))
    if isinstance(value, float):
        return Param(
            name=name, widget=Labeled(label, W.FloatText(value=value, step=0.01))
        )
    if isinstance(value, tuple) or origin in (tuple, typing.Tuple):
        elem_cast = float if value and isinstance(value[0], float) else int
        return Param(
            name=name,
            widget=Labeled(label, W.Text(value=str(value)[1:-1])),
            setter=lambda c, v, cast=elem_cast: _parse_tuple(v, cast),
        )
    if isinstance(value, str) or tp is str:
        return Param(
            name=name, widget=Labeled(label, W.Text(value=str(value or "")))
        )
    return None  # nested configs get their own views


def accordion(view: ConfigView, title: str):
    from ipywidgets import widgets as W

    w = view.as_widget(
        lambda children, **kwargs: W.Accordion(
            [W.VBox(children=children)], **kwargs
        ),
        selected_index=0,
        layout=W.Layout(margin="0 auto 0 0", width="100%"),
    )
    w.set_title(0, title)
    return w


def auto_config_view(
    cfg,
    title: Optional[str] = None,
    fields: Optional[Sequence[str]] = None,
    labels: Optional[Dict[str, str]] = None,
    extra_params: Sequence[Param] = (),
):
    """Build a ConfigView for any Config dataclass instance."""
    labels = labels or {}
    params = []
    for f in dtc.fields(cfg):
        if fields is not None and f.name not in fields:
            continue
        p = param_for_field(cfg, f, labels.get(f.name))
        if p is not None:
            params.append(p)
    params.extend(extra_params)
    view = ConfigView(cfg, *params)
    if title is not None:
        return accordion(view, title)
    return view
