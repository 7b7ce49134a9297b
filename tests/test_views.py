"""Headless view-layer logic: the clusterizer pipeline core + registries
(widget construction itself needs ipywidgets and is skipped without it)."""
import numpy as np
import pytest

import mimikit_tpu as mmk
from mimikit_tpu.views.clusterizer_app import (
    CLUSTERINGS,
    Meta,
    TRANSFORMS,
    ClusterizerPipeline,
)

from .test_utils import make_db_config


def test_meta_dependency_rules():
    magspec_meta = TRANSFORMS["magspec"]
    assert magspec_meta.can_be_added([])
    assert not magspec_meta.can_be_added([mmk.MagSpec])

    mfcc_meta = TRANSFORMS["mfcc"]
    assert not mfcc_meta.can_be_added([mmk.MagSpec])
    assert mfcc_meta.can_be_added([mmk.MagSpec, mmk.MelSpec])

    pca_meta = TRANSFORMS["pca"]
    assert pca_meta.can_be_added([mmk.MagSpec])
    assert not pca_meta.can_be_added([])


def test_clusterizer_pipeline_end_to_end(tmp_path):
    ds_cfg = make_db_config(tmp_path, n_samples=8000, filename="clus.h5")
    ds_cfg.create(mode="w")
    pipe = ClusterizerPipeline(ds_cfg)
    assert pipe.add_transform(mmk.MagSpec(256, 64))
    assert not pipe.add_transform(mmk.MFCC())  # needs MelSpec first
    pipe.set_clustering(mmk.KMeans(n_clusters=3))
    pipe.compute("labels")

    labels = np.asarray(pipe.labels[:])
    assert len(np.unique(labels)) <= 3

    segs = pipe.segments_from_clustering()
    assert segs and segs[0]["startTime"] == 0.0

    y = pipe.bounce_labels(int(labels[0]))
    assert y.ndim == 1 and y.shape[0] > 0

    # reload round trip through the stored pipeline config
    pipe2 = ClusterizerPipeline(ds_cfg).load_result("labels")
    assert isinstance(pipe2.clustering, mmk.KMeans)
    assert isinstance(pipe2.transforms[0], mmk.MagSpec)


def test_clustering_registry_complete():
    assert {m.config_class for m in CLUSTERINGS.values()} == {
        mmk.GCluster, mmk.QCluster, mmk.ArgMax, mmk.KMeans, mmk.SpectralClustering
    }


def test_views_importable_without_ipywidgets():
    # constructing widgets should raise a *helpful* error, not ImportError at
    # package import time
    try:
        import ipywidgets  # noqa: F401

        pytest.skip("ipywidgets present; nothing to check")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="ipywidgets"):
        mmk.views.factory.auto_config_view(mmk.MagSpec())


def test_auto_config_view_apply_reads_widget_values():
    pytest.importorskip("ipywidgets")
    cfg = mmk.MagSpec(n_fft=512, hop_length=128)
    view = mmk.views.factory.auto_config_view(cfg)
    # mutate the underlying widget of the n_fft pw2 stepper, then apply()
    param = next(p for p in view.params if p.name == "n_fft")
    src = param.widget
    while hasattr(src, "_value_source"):
        src = src._value_source
    src.value = "1024"
    view.apply()
    assert cfg.n_fft == 1024


def test_config_view_observer_roundtrip():
    W = pytest.importorskip("ipywidgets")
    from mimikit_tpu.ui.config_view import ConfigView, Param

    cfg = mmk.MuLawCompress(q_levels=64)
    txt = W.IntText(value=cfg.q_levels)
    view = ConfigView(cfg, Param(name="q_levels", widget=txt))
    txt.value = 128  # triggers the observer
    assert cfg.q_levels == 128


def test_sample_rnn_view_builds():
    pytest.importorskip("ipywidgets")
    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    cfg = mmk.SampleRNN.Config(io_spec=io, hidden_dim=32)
    w = mmk.sample_rnn_view(cfg)
    assert w is not None


def test_file_picker_lists_files(tmp_path):
    pytest.importorskip("ipywidgets")
    (tmp_path / "a.wav").write_bytes(b"")
    (tmp_path / "b.txt").write_bytes(b"")
    picker = mmk.ui.file_picker.SoundFilePicker(root=str(tmp_path))
    grid = picker.widget.children[1].children
    descs = [b.description for b in grid]
    assert any("a.wav" in d for d in descs)
    # non-matching files are disabled, not hidden
    b_btn = next(b for b in grid if "b.txt" in b.description)
    assert b_btn.disabled


def test_timestamps_selector_points():
    import numpy as np

    from mimikit_tpu.views.timestamps_selector import TimeStampsSelector

    sel = TimeStampsSelector(np.zeros(44100, np.float32), sr=44100)
    sel.add_point(0.5)
    sel.add_point(0.25)
    assert sel.points == [0.25, 0.5]
    assert list(sel.positions_sec) == [0.25, 0.5]


def test_timestamps_selector_interactive_fallback():
    """Without peaksjs the selector is still interactive: slider scrubs the
    cursor, buttons add/undo points, the waveform PNG re-renders."""
    import numpy as np

    from mimikit_tpu.views.timestamps_selector import TimeStampsSelector

    t = np.arange(8000) / 8000.0
    sel = TimeStampsSelector(np.sin(2 * np.pi * 5 * t).astype(np.float32),
                             sr=8000)
    w = sel.widget
    assert w is not None and sel._peaks is None
    img, controls, label = w.children
    slider, add, undo = controls.children
    png0 = img.value
    assert png0[:8] == b"\x89PNG\r\n\x1a\n"
    slider.value = 0.5          # scrub -> cursor moves, PNG re-renders
    add.click()                 # add at cursor
    assert sel.points == [0.5]
    assert img.value != png0    # marker drawn
    assert "0.500s" in label.value
    undo.click()
    assert sel.points == []


def test_segment_selector_filter_cuts():
    import numpy as np

    from mimikit_tpu.extract.samplify import Samplifyer
    from mimikit_tpu.views.segment_selector import filter_cuts

    sr = 16000
    y = np.concatenate(
        [
            np.zeros(sr // 4, np.float32),
            0.8 * np.sin(np.linspace(0, 100, sr // 2)).astype(np.float32),
            np.zeros(sr // 4, np.float32),
        ]
    )
    s = Samplifyer(filter_level=2, sensitivity=0.05)
    s.fit(y)
    strong = filter_cuts(s, threshold=float(np.min(s.scores)))
    weak = filter_cuts(s, threshold=float(np.max(s.scores)) + 1.0)
    assert len(strong) == len(s.cuts)
    assert len(weak) == 0


def test_clusterizer_app_full_widget_tree(tmp_path):
    """Assemble the COMPLETE ClusterizerApp and drive it through widget
    interactions: dataset -> transform pipeline -> clustering choice ->
    compute -> label toggles -> bounce (reference
    ``views/clusterizer_app.py:257-619``)."""
    pytest.importorskip("ipywidgets")
    import numpy as np
    from scipy.io import wavfile

    sr = 16000
    t = np.arange(sr * 2) / sr
    sig = (
        0.5 * np.sin(2 * np.pi * 220 * t) * (t < 1)
        + 0.5 * np.sin(2 * np.pi * 880 * t) * (t >= 1)
    ).astype(np.float32)
    wav = str(tmp_path / "x.wav")
    wavfile.write(wav, sr, (sig * 32767).astype(np.int16))

    from mimikit_tpu.views.clusterizer_app import ClusterizerApp

    app = ClusterizerApp()
    # the top widget tree exists before any dataset is loaded
    assert len(app.widget.children) == 4

    # fill the dataset config as the dataset view's pickers would
    app.dataset_cfg.sources = (wav,)
    app.dataset_cfg.filename = str(tmp_path / "db.h5")
    app.dataset_cfg.extractors = (mmk.Extractor.signal(sr=sr),)
    app.dataset_cfg.create(mode="w")
    app.load_dataset()

    # pipeline widget starts with a MagSpec stage; clustering pane offers
    # the registry
    assert any(
        type(c).__name__ == "MagSpec" for c in app.pre_pipeline.transforms
    )
    cluster_box = app.clusters.widget
    choices, submit = cluster_box.children[1], cluster_box.children[2]
    assert "kmeans" in choices.options
    choices.value = "kmeans"
    submit.click()
    assert app.clusters.cfg is not None
    app.clusters.cfg.n_clusters = 2

    # compute through the app's own button handler
    app.save_as.value = "labels"
    app.on_submit(None)

    # label view built: one toggle per label + segment table + bounce
    toggles_row, table_w, bounce_btn = app.labels_widget.children
    assert len(toggles_row.children) == 2
    toggles_row.children[0].value = True  # select label via the widget
    assert len(app.selected_labels) == 1

    y = app.bounce_selected_labels()
    y = np.asarray(y)
    assert y.ndim == 1 and y.size > 0 and np.isfinite(y).all()

    # toggling the label populated the editable table (the qgrid layer);
    # edit a row through its input widgets and bounce the edited segments
    segs = app.segment_table.segments
    assert segs and all(s["labelText"] == "0" for s in segs)
    row = app.segment_table._row_widgets[segs[0]["id"]]
    _, start_w, end_w, _, _ = row.children
    end_w.value = min(float(end_w.value), 0.5)
    assert app.segment_table.segments[0]["endTime"] <= 0.5
    y2 = np.asarray(app.bounce_segments())
    assert y2.ndim == 1 and 0 < y2.size < y.size + 1 and np.isfinite(y2).all()

    # toggling off clears that label's rows
    toggles_row.children[0].value = False
    assert app.segment_table.segments == []


def test_segment_table_programmatic_and_widget_paths_agree():
    """SegmentTable: add/edit/remove through the API mutate the same state
    the row widgets render; widget edits call back into the API (one code
    path — the qgrid-equivalent contract)."""
    pytest.importorskip("ipywidgets")
    from mimikit_tpu.views.segment_table import SegmentTable

    tbl = SegmentTable()
    a = tbl.add_segment(0.0, 1.0, "0")
    b = tbl.add_segment(2.0, 3.0, "1")
    w = tbl.widget  # build AFTER some rows exist
    assert len(tbl._row_widgets) == 2
    c = tbl.add_segment(1.0, 2.0, "0")  # and add AFTER the build
    assert len(tbl._row_widgets) == 3
    # sorted by startTime regardless of insertion order
    assert [s["id"] for s in tbl.segments] == [a, c, b]

    # programmatic edit syncs the row widgets
    tbl.edit_segment(b, startTime=4.0, labelText="2")
    _, start_w, _, lab_w, _ = tbl._row_widgets[b].children
    assert start_w.value == 4.0 and lab_w.value == "2"

    # widget edit syncs the data
    start_w.value = 5.0
    assert tbl._rows[b]["startTime"] == 5.0

    # deselect drops a row from selected_segments but not segments
    sel_w = tbl._row_widgets[a].children[0]
    sel_w.value = False
    assert [s["id"] for s in tbl.selected_segments] == [c, b]
    assert len(tbl.segments) == 3

    # the add-row button appends a row continuing the last segment's end
    # (b sorts last at start 5.0 with end 3.0, so the new row starts at 3.0)
    w.children[-1].click()
    assert len(tbl.segments) == 4
    assert any(s["startTime"] == 3.0 and s["endTime"] == 4.0
               for s in tbl.segments)

    tbl.remove_label("0")  # drops a and c; b + the added row carry "2"
    assert {s["id"] for s in tbl.segments} == {b, 3}
    tbl.clear()
    assert tbl.segments == [] and len(w.children) == 2  # header + add btn
