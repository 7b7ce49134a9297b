"""The clusterizer: dataset -> transform pipeline -> clustering -> label
editing -> bounce.

Rebuild of ``/root/reference/mimikit/views/clusterizer_app.py``.  The
computational core (:class:`ClusterizerPipeline`) is headless — composable
transform pipeline with dependency checking, label computation stored in the
db, label-mask bouncing through Griffin-Lim — and fully testable without a
notebook.  The widget classes layer the interactive app on top (ipywidgets
required; waveform display degrades from peaksjs to matplotlib).
"""
from __future__ import annotations

import dataclasses as dtc
from typing import Any, Callable, List, Optional, Type

import numpy as np

from ..config import Config
from ..extract.clusters import ArgMax, GCluster, KMeans, QCluster, SpectralClustering
from ..features.dataset import DatasetConfig
from ..features.functionals import (
    AutoConvolve,
    Compose,
    F0Filter,
    FactorAnalysis,
    MFCC,
    MagSpec,
    MelSpec,
    NMF,
    NearestNeighborFilter,
    PCA,
)
from .clusters import (
    argmax_view,
    gcluster_view,
    kmeans_view,
    qcluster_view,
    spectral_clustering_view,
)
from .factory import auto_config_view
from .segment_table import SegmentTable
from .functionals import (
    autoconvolve_view,
    chroma_view,
    f0_filter_view,
    factor_analysis_view,
    magspec_view,
    melspec_view,
    mfcc_view,
    nearest_neighbor_filter_view,
    nmf_view,
    pca_view,
)

__all__ = [
    "Meta",
    "TRANSFORMS",
    "CLUSTERINGS",
    "ClusterizerPipeline",
    "ComposeTransformWidget",
    "ClusterWidget",
    "ClusterizerApp",
]


@dtc.dataclass
class Meta:
    """Registry entry: which transform can follow which
    (reference ``clusterizer_app.py:26-43``)."""

    config_class: Type
    view_func: Callable
    requires: List[Type] = dtc.field(default_factory=list)
    only_once: bool = False

    def can_be_added(self, preceding_transforms: List[Type]) -> bool:
        if not self.requires:
            return not preceding_transforms
        if self.requires[0] is Any and len(preceding_transforms) > 0:
            return True
        deps_fulfilled = self.requires == preceding_transforms
        already_there = (
            any(f is self.config_class for f in preceding_transforms)
            if self.only_once
            else False
        )
        return deps_fulfilled and not already_there


def _gv(title):
    return lambda cfg: auto_config_view(cfg, title=title)


TRANSFORMS = {
    "magspec": Meta(MagSpec, magspec_view, [], True),
    "melspec": Meta(MelSpec, melspec_view, [MagSpec], True),
    "mfcc": Meta(MFCC, mfcc_view, [MagSpec, MelSpec], True),
    "chroma": Meta(
        __import__("mimikit_tpu.features.functionals", fromlist=["Chroma"]).Chroma,
        chroma_view, [MagSpec], True,
    ),
    "auto-convolve": Meta(AutoConvolve, autoconvolve_view, [Any], False),
    "f0 filter": Meta(F0Filter, f0_filter_view, [MagSpec], False),
    "nearest neighbor filter": Meta(
        NearestNeighborFilter, nearest_neighbor_filter_view, [Any]
    ),
    "pca": Meta(PCA, pca_view, [Any]),
    "nmf": Meta(NMF, nmf_view, [Any]),
    "factor analysis": Meta(FactorAnalysis, factor_analysis_view, [Any]),
}

CLUSTERINGS = {
    "grid of means": Meta(GCluster, gcluster_view, [], True),
    "quantile clustering": Meta(QCluster, qcluster_view, [], True),
    "argmax": Meta(ArgMax, argmax_view, [], True),
    "kmeans": Meta(KMeans, kmeans_view, [], True),
    "spectral clustering": Meta(
        SpectralClustering, spectral_clustering_view, [], True
    ),
}


class ClusterizerPipeline:
    """Headless core: compose transforms + clustering over a dataset's
    signal, store labels, derive segments, bounce selections."""

    def __init__(self, dataset_config: DatasetConfig):
        self.dataset_cfg = dataset_config
        self.transforms: List = []
        self.clustering = None
        self.feature_name = "labels"

    @property
    def db(self):
        return self.dataset_cfg.get(mode="r+")

    @property
    def sr(self):
        f = self.dataset_cfg.extractors[0].functional
        funcs = getattr(f, "functionals", (f,))
        return funcs[0].sr

    @property
    def magspec_cfg(self) -> MagSpec:
        assert self.transforms and isinstance(self.transforms[0], MagSpec)
        return self.transforms[0]

    @property
    def hop_length(self):
        return self.magspec_cfg.hop_length

    def add_transform(self, transform) -> bool:
        """append if the registry's dependency rules allow it"""
        key = next(
            (k for k, m in TRANSFORMS.items() if m.config_class is type(transform)),
            None,
        )
        if key is None:
            return False
        if not TRANSFORMS[key].can_be_added([*map(type, self.transforms)]):
            return False
        self.transforms.append(transform)
        return True

    def set_clustering(self, clustering):
        self.clustering = clustering
        return self

    def compute(self, feature_name: str = "labels"):
        """run pipeline + clustering over the signal and store the labels
        (the ``db.signal.compute`` path, reference ``:360-386``)."""
        if self.clustering is None:
            raise ValueError(
                "Please select a clustering algo before computing"
            )
        self.feature_name = feature_name
        pipeline = Compose(*self.transforms, self.clustering)
        db = self.db
        db.signal.compute({feature_name: pipeline})
        feat = getattr(db, feature_name)
        feat.attrs["config"] = pipeline.serialize()
        db.flush()
        db.close()
        return self

    @property
    def labels(self):
        return getattr(self.db, self.feature_name)

    def segments_from_clustering(self):
        """(start_sec, end_sec, label) triples from contiguous label runs"""
        sr, hop = self.sr, self.hop_length
        lbl = np.asarray(self.labels[:])
        splits = (lbl[1:] - lbl[:-1]) != 0
        time_idx = splits.nonzero()[0] + 1
        starts = np.r_[0, time_idx]
        ends = np.r_[time_idx, lbl.shape[0]]
        cluster_idx = lbl[starts]
        return [
            dict(
                id=i,
                startTime=(hop * s) / sr,
                endTime=(hop * e) / sr,
                labelText=str(c),
            )
            for i, (s, e, c) in enumerate(zip(starts, ends, cluster_idx))
        ]

    def bounce_labels(self, *labels: int) -> np.ndarray:
        """mask STFT frames by label and invert (Griffin-Lim)"""
        db = self.db
        fft = self.magspec_cfg(np.asarray(db.signal[:]))
        lbl = np.asarray(self.labels[:])
        mask = np.zeros((fft.shape[0],), dtype=bool)
        for label in labels:
            mask |= lbl == int(label)
        filtered = fft[mask]
        return self.magspec_cfg.inv(filtered)

    def bounce_segments(self, segments) -> np.ndarray:
        db = self.db
        fft = self.magspec_cfg(np.asarray(db.signal[:]))
        sr, hop = self.sr, self.hop_length

        def t2f(t):
            return int(round((t * sr) / hop))

        filtered = np.concatenate(
            [fft[t2f(s["startTime"]) : t2f(s["endTime"])] for s in segments]
        )
        return self.magspec_cfg.inv(filtered)

    def load_result(self, key: str):
        cfg = Config.deserialize(getattr(self.db, key).attrs["config"])
        self.transforms = list(cfg.functionals[:-1])
        self.clustering = cfg.functionals[-1]
        self.feature_name = key
        return self


class ComposeTransformWidget:
    """Interactive pipeline builder (registry-checked add/remove)."""

    def __init__(self, compose: Compose = None):
        from ..ui.config_view import require_ipywidgets

        require_ipywidgets()
        from ipywidgets import widgets as W

        self.transforms = []
        self.metas = []
        self.box = W.VBox(layout=dict(width="50%"))
        header = W.HTML("<h4> Pre Processing Pipeline </h4>")
        self.new_choice = W.Button(icon="fa-plus", layout=dict(margin="8px auto"))
        self.choices = W.Select(
            options=self.get_possible_choices(),
            layout=dict(width="100%", margin="4px auto"),
        )
        self.submit = W.Button(description="submit")
        self.cancel = W.Button(description="cancel")
        self.choice_box = W.VBox(
            children=(self.choices, W.HBox(children=(self.submit, self.cancel)))
        )
        self.submit.on_click(self._add_choice)
        self.cancel.on_click(
            lambda ev: self._set_children(header)
        )
        self.new_choice.on_click(
            lambda ev: setattr(
                self.box, "children", (*self.box.children, self.choice_box)
            )
        )
        self.widget = self.box
        self._header = header
        if compose is not None and any(compose.functionals):
            for cfg in compose.functionals:
                self._append(cfg)
        else:
            self._append(MagSpec())
        self._set_children(header)

    @property
    def magspec_cfg(self):
        return self.transforms[0]

    def get_possible_choices(self):
        ts = [*map(type, self.transforms)] if hasattr(self, "transforms") else []
        return [k for k, m in TRANSFORMS.items() if m.can_be_added(ts)]

    def _append(self, cfg):
        key = next(
            k for k, m in TRANSFORMS.items() if m.config_class is type(cfg)
        )
        self.metas.append(TRANSFORMS[key])
        self.transforms.append(cfg)

    def _add_choice(self, ev):
        meta = TRANSFORMS[self.choices.value]
        cfg = meta.config_class()
        self._append(cfg)
        self.choices.options = self.get_possible_choices()
        self._set_children(self._header)

    def _set_children(self, header):
        from ipywidgets import widgets as W

        views = []
        for meta, cfg in zip(self.metas, self.transforms):
            views.append(meta.view_func(cfg))
        self.box.children = (header, *views, self.new_choice)


class ClusterWidget:
    def __init__(self):
        from ..ui.config_view import require_ipywidgets

        require_ipywidgets()
        from ipywidgets import widgets as W

        self.cfg = None
        header = W.HTML("<h4> Clustering Algo </h4>")
        choices = W.Select(options=[*CLUSTERINGS.keys()])
        submit = W.Button(description="submit")
        box = W.VBox(children=(header, choices, submit), layout=dict(width="50%"))

        def add_choice(ev):
            meta = CLUSTERINGS[choices.value]
            self.cfg = meta.config_class()
            box.children = (header, meta.view_func(self.cfg))

        submit.on_click(add_choice)
        self.widget = box


class ClusterizerApp:
    """Full notebook app wiring dataset creation, pipeline building,
    clustering, label selection and bouncing."""

    def __init__(self):
        from ..ui.config_view import require_ipywidgets

        require_ipywidgets()
        from ipywidgets import widgets as W

        from .dataset import dataset_view

        self.dataset_cfg = DatasetConfig()
        self.pipeline: Optional[ClusterizerPipeline] = None
        self.pre_pipeline: Optional[ComposeTransformWidget] = None
        self.clusters: Optional[ClusterWidget] = None
        self.out = W.Output()
        self.save_as = W.Text(value="labels")
        self.selected_labels = set()

        self.dataset_widget = dataset_view(
            self.dataset_cfg, on_created=lambda db: self.load_dataset()
        )
        self.clustering_widget = W.VBox()
        self.labels_widget = W.VBox()
        self.segment_table = SegmentTable()
        self.container = W.VBox(
            children=(self.dataset_widget, self.clustering_widget, self.labels_widget, self.out)
        )

    @property
    def widget(self):
        return self.container

    def load_dataset(self):
        from ipywidgets import widgets as W

        self.pipeline = ClusterizerPipeline(self.dataset_cfg)
        self.pre_pipeline = ComposeTransformWidget()
        self.clusters = ClusterWidget()
        compute = W.Button(description="compute", button_style="success")
        compute.on_click(self.on_submit)
        self.clustering_widget.children = (
            W.HBox(children=(self.pre_pipeline.widget, self.clusters.widget)),
            W.HBox(children=(W.Label("Save clustering as:"), self.save_as, compute)),
        )

    def on_submit(self, ev):
        with self.out:
            if self.clusters.cfg is None:
                raise ValueError(
                    "Please select a clustering algo before clicking 'compute'"
                )
            self.pipeline.transforms = list(self.pre_pipeline.transforms)
            self.pipeline.set_clustering(self.clusters.cfg)
            self.pipeline.compute(self.save_as.value)
            self.build_label_view()

    def build_label_view(self):
        from ipywidgets import widgets as W

        segments = self.pipeline.segments_from_clustering()
        labels = sorted({int(s["labelText"]) for s in segments})
        self.segment_table = SegmentTable()
        toggles = []
        for lab in labels:
            t = W.ToggleButton(value=False, description=str(lab))

            def obs(ev, lab=lab):
                if ev["new"]:
                    self.selected_labels.add(lab)
                    # selected labels' segments become editable table rows
                    # (the reference fills its qgrid the same way,
                    # clusterizer_app.py:510-517)
                    for s in segments:
                        if s["labelText"] == str(lab):
                            self.segment_table.add_segment(
                                s["startTime"], s["endTime"], s["labelText"]
                            )
                else:
                    self.selected_labels.discard(lab)
                    self.segment_table.remove_label(str(lab))

            t.observe(obs, "value")
            toggles.append(t)
        bounce = W.Button(description="bounce selection")

        def on_bounce(ev):
            with self.out:
                y = self.pipeline.bounce_labels(*self.selected_labels)
                try:
                    import IPython.display as ipd

                    ipd.display(ipd.Audio(np.asarray(y), rate=self.pipeline.sr))
                except ImportError:
                    pass

        bounce.on_click(on_bounce)
        self.labels_widget.children = (
            W.HBox(children=tuple(toggles)), self.segment_table.widget, bounce
        )

    def select(self, *labels: int):
        self.selected_labels |= set(labels)
        return self

    def unselect(self, *labels: int):
        self.selected_labels -= set(labels)
        return self

    @property
    def segments(self) -> List[dict]:
        """segments as currently edited by the user (start-time sorted);
        falls back to the raw clustering only when the table itself is
        empty — when rows exist but the user deselected every one, the
        selection is honored and ``[]`` is returned (bouncing everything
        after an explicit deselect-all would invert the user's intent)"""
        if not self.segment_table.segments:
            return self.pipeline.segments_from_clustering()
        return self.segment_table.selected_segments

    def bounce_selected_labels(self):
        """bounce the selected labels' raw segments, IGNORING user edits
        (reference semantics, clusterizer_app.py:452)"""
        return self.pipeline.bounce_labels(*self.selected_labels)

    def bounce_segments(self):
        """bounce the segments as edited in the table (reference
        semantics, clusterizer_app.py:462-473)"""
        return self.pipeline.bounce_segments(self.segments)
