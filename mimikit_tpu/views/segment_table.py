"""Editable segment table for the clusterizer.

The reference renders the selected labels' segments in a qgrid data grid
and lets the user add/edit/remove rows before bouncing
(``/root/reference/mimikit/views/clusterizer_app.py:489-553``).  qgrid is
unmaintained and absent from this image, so the same capability is
realized with plain ipywidgets: one row per segment with editable
start/end/label fields, a per-row remove button, an add-row button, and
per-row selection.  All mutations go through the programmatic API
(`add_segment`/`edit_segment`/`remove_segment`), which the widget
callbacks also use — so headless pipelines and notebook edits share one
code path and `segments` always reflects the current table.
"""
from typing import Callable, Dict, List, Optional

__all__ = ["SegmentTable"]


class SegmentTable:
    """A list of ``{id, startTime, endTime, labelText}`` segments, editable
    programmatically and (when ipywidgets is importable) through a table
    of input widgets.  ``segments`` returns rows sorted by start time —
    the contract ``ClusterizerPipeline.bounce_segments`` consumes."""

    def __init__(self, on_change: Optional[Callable] = None):
        self._rows: Dict[int, dict] = {}
        self._id_count = 0
        self._on_change = on_change
        self._box = None  # built lazily by `.widget`
        self._row_widgets: Dict[int, object] = {}

    # ------------------------------------------------------------------ data
    @property
    def segments(self) -> List[dict]:
        return sorted(
            (dict(r) for r in self._rows.values()),
            key=lambda s: s["startTime"],
        )

    @property
    def selected_segments(self) -> List[dict]:
        return [s for s in self.segments if self._rows[s["id"]].get("_sel", True)]

    def add_segment(self, startTime: float, endTime: float, labelText: str,
                    id: Optional[int] = None, selected: bool = True) -> int:
        if id is None:
            id = self._id_count
        self._id_count = max(self._id_count, id + 1)
        self._rows[id] = dict(
            id=id, startTime=float(startTime), endTime=float(endTime),
            labelText=str(labelText), _sel=bool(selected),
        )
        if self._box is not None:
            self._append_row_widget(id)
        self._changed()
        return id

    def edit_segment(self, id: int, **fields) -> None:
        row = self._rows[id]
        for k, v in fields.items():
            if k in ("startTime", "endTime"):
                row[k] = float(v)
            elif k == "labelText":
                row[k] = str(v)
            elif k == "selected":
                row["_sel"] = bool(v)
        if id in self._row_widgets:
            self._sync_row_widget(id)
        self._changed()

    def remove_segment(self, id: int) -> None:
        self._rows.pop(id, None)
        w = self._row_widgets.pop(id, None)
        if self._box is not None and w is not None:
            self._box.children = tuple(c for c in self._box.children if c is not w)
        self._changed()

    def remove_label(self, labelText: str) -> None:
        """drop every row carrying this label (label toggled off)"""
        for id in [i for i, r in self._rows.items()
                   if r["labelText"] == str(labelText)]:
            self.remove_segment(id)

    def clear(self) -> None:
        for id in list(self._rows):
            self.remove_segment(id)

    def _changed(self):
        if self._on_change is not None:
            self._on_change(self.segments)

    # -------------------------------------------------------------- widgets
    @property
    def widget(self):
        if self._box is None:
            from ipywidgets import widgets as W

            header = W.HBox(children=(
                W.Label("sel", layout=dict(width="40px")),
                W.Label("start (s)", layout=dict(width="110px")),
                W.Label("end (s)", layout=dict(width="110px")),
                W.Label("label", layout=dict(width="80px")),
                W.Label("", layout=dict(width="40px")),
            ))
            add = W.Button(description="+ segment", layout=dict(width="110px"))

            def on_add(_):
                last = self.segments[-1] if self._rows else None
                t0 = last["endTime"] if last else 0.0
                self.add_segment(t0, t0 + 1.0, last["labelText"] if last else "0")

            add.on_click(on_add)
            self._box = W.VBox(children=(header, add),
                               layout=dict(max_height="400px", overflow="auto"))
            for id in sorted(self._rows):
                self._append_row_widget(id)
        return self._box

    def _append_row_widget(self, id: int):
        from ipywidgets import widgets as W

        row = self._rows[id]
        sel = W.Checkbox(value=row["_sel"], indent=False,
                         layout=dict(width="40px"))
        start = W.FloatText(value=row["startTime"], step=0.01,
                            layout=dict(width="110px"))
        end = W.FloatText(value=row["endTime"], step=0.01,
                          layout=dict(width="110px"))
        lab = W.Text(value=row["labelText"], layout=dict(width="80px"))
        rm = W.Button(description="✕", layout=dict(width="40px"))

        def obs(field):
            def _cb(ev, field=field):
                if id in self._rows:  # guard edits racing a removal
                    self.edit_segment(id, **{field: ev["new"]})
            return _cb

        sel.observe(obs("selected"), "value")
        start.observe(obs("startTime"), "value")
        end.observe(obs("endTime"), "value")
        lab.observe(obs("labelText"), "value")
        rm.on_click(lambda _, id=id: self.remove_segment(id))
        hbox = W.HBox(children=(sel, start, end, lab, rm))
        self._row_widgets[id] = hbox
        # keep the add-row button last
        self._box.children = (*self._box.children[:-1], hbox,
                              self._box.children[-1])

    def _sync_row_widget(self, id: int):
        row = self._rows[id]
        sel, start, end, lab, _ = self._row_widgets[id].children
        for w, v in ((sel, row["_sel"]), (start, row["startTime"]),
                     (end, row["endTime"]), (lab, row["labelText"])):
            if w.value != v:
                w.value = v
