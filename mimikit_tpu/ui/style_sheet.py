"""Widget CSS (reference ``ui/style_sheet.py``); built lazily since
ipywidgets is optional.

The selectors and properties match what the widget layer expects
(picker buttons, selection highlights, the ``.tltp`` tooltip); the sheet
is rendered from a rule table so individual styles stay greppable.
"""
from __future__ import annotations

__all__ = ["MMK_STYLE_SHEET_CSS", "get_style_sheet"]

_IMPORTANT_RULES = {
    ".picker-button": {
        "border": "0px",
        "border-radius": "5px",
        "background-color": "white",
        "text-align": "left",
    },
    ".not-a-button:hover": {"box-shadow": "none"},
    ".selected-button": {"background-color": "lightgreen"},
    ".gray-label": {"color": "gray"},
    ".selected": {
        "overflow-wrap": "anywhere",
        "text-color": "black",
        "padding": "2px",
        "opacity": "1",
    },
    ".tltp": {
        "border-radius": "8px 8px",
        "background-color": "rgb(247, 228, 0)",
        "color": "rgb(0, 0, 0)",
    },
    ".tltp i": {
        "font-size": "8px",
        "position": "absolute",
        "top": "2px",
        "left": "8px",
    },
}

_PLAIN_RULES = {
    # keep notebook tab bars from stretching tabs to full width
    ".jupyter-widgets.widget-tab > .p-TabBar .p-TabBar-tab": {"flex": "0 1 auto"},
}


def _render() -> str:
    blocks = []
    for rules, suffix in ((_IMPORTANT_RULES, " !important"), (_PLAIN_RULES, "")):
        for selector, props in rules.items():
            body = "\n".join(
                f"    {prop}: {val}{suffix};" for prop, val in props.items()
            )
            blocks.append(f"{selector} {{\n{body}\n}}")
    return "<style>\n" + "\n".join(blocks) + "\n</style>"


MMK_STYLE_SHEET_CSS = _render()


def get_style_sheet():
    """Returns the style sheet as an ipywidgets.HTML widget."""
    import ipywidgets as W

    return W.HTML(MMK_STYLE_SHEET_CSS)


def __getattr__(name):
    if name == "MMK_STYLE_SHEET":
        return get_style_sheet()
    raise AttributeError(name)
