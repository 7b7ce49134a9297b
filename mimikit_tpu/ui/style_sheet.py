"""Widget CSS (reference ``ui/style_sheet.py``); built lazily since
ipywidgets is optional."""
from __future__ import annotations

__all__ = ["MMK_STYLE_SHEET_CSS", "get_style_sheet"]

MMK_STYLE_SHEET_CSS = """
<style>

.picker-button {
    border: 0px !important;
    border-radius: 5px !important;
    background-color: white !important;
    text-align: left !important;
}
.not-a-button:hover {
    box-shadow: none !important;
}
.selected-button {
    background-color: lightgreen !important;
}
.gray-label {
    color: gray !important;
}

.selected {
    overflow-wrap: anywhere !important;
    text-color: black !important;
    padding: 2px !important;
    opacity: 1 !important;
}

.tltp {
        border-radius: 8px 8px !important;
        background-color: rgb(247, 228, 0) !important;
        color: rgb(0, 0, 0) !important;
    }
.tltp i {
    font-size: 8px !important;
    position: absolute !important;
    top: 2px !important;
    left: 8px !important;
}

.jupyter-widgets.widget-tab > .p-TabBar .p-TabBar-tab {
    flex: 0 1 auto
}
</style>
"""


def get_style_sheet():
    """Returns the style sheet as an ipywidgets.HTML widget."""
    import ipywidgets as W

    return W.HTML(MMK_STYLE_SHEET_CSS)


def __getattr__(name):
    if name == "MMK_STYLE_SHEET":
        return get_style_sheet()
    raise AttributeError(name)
