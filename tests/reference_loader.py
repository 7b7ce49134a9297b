"""Import the reference mimikit (torch) package with its missing deps
stubbed — enough to build networks and read state_dict names.  Run in a
SUBPROCESS only (torch next to jax breaks XLA:CPU)."""
import importlib.machinery
import sys
import types


def stub(name, attrs=None):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in (attrs or {}).items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    class _OC:
        @staticmethod
        def structured(x):
            return x

        @staticmethod
        def to_yaml(x, **k):
            return ""

        @staticmethod
        def create(*a, **k):
            return {}

        @staticmethod
        def to_container(x, **k):
            return {}

        @staticmethod
        def merge(*a, **k):
            return {}

    stub(
        "omegaconf",
        {"OmegaConf": _OC, "ListConfig": list, "DictConfig": dict, "MISSING": None},
    )
    lbr = stub("librosa")
    lbr.__path__ = []
    for n in (
        "librosa.sequence",
        "librosa.feature",
        "librosa.effects",
        "librosa.decompose",
        "torchaudio",
        "torchaudio.transforms",
        "torchaudio.functional",
    ):
        stub(n)
    sys.modules["librosa.sequence"].dtw = lambda *a, **k: None
    stub(
        "librosa.util",
        {"peak_pick": lambda *a, **k: None, "localmax": lambda *a, **k: None,
         "nn_filter": lambda *a, **k: None},
    )
    stub("sklearn_extra", {})
    stub("pandas", {"DataFrame": object})

    class _Sig:
        def __getitem__(self, *a):
            return self

        def __call__(self, *a, **k):
            return self

    nb = stub("numba")

    def _njit(*a, **k):
        if a and isinstance(a[0], types.FunctionType):
            return a[0]
        return lambda f: f

    nb.njit = _njit
    nb.prange = range

    class _NbTypes:
        def __getattr__(self, name):
            return _Sig()

    nb.types = _NbTypes()

    class _TypedList(list):
        pass

    nb.typed = types.SimpleNamespace(
        List=_TypedList, Dict=dict
    )
    for t in ("float64", "intp", "float32", "int64", "boolean"):
        setattr(nb, t, _Sig())

    class _Feature:
        pass

    class _TypedFile:
        pass

    stub(
        "h5mapper",
        {
            "Feature": _Feature,
            "TypedFile": _TypedFile,
            "FileWalker": object,
            "Getter": object,
            "Input": object,
            "AsSlice": object,
            "TensorDict": dict,
            "process_batch": lambda *a, **k: None,
        },
    )
    class _LM:
        def __init__(self, *a, **k):
            pass

    pl = stub(
        "pytorch_lightning",
        {"LightningModule": _LM, "Trainer": object, "Callback": object},
    )
    pl.__path__ = []  # mark as package so submodule imports resolve

    class _TQDM:
        def __init__(self, *a, **k):
            pass

    cbs = stub(
        "pytorch_lightning.callbacks",
        {"Callback": object, "ProgressBar": object, "TQDMProgressBar": _TQDM},
    )
    pl.callbacks = cbs
    stub("pytorch_lightning.loggers", {"Logger": object})
    stub("pytorch_lightning.trainer", {})
    stub(
        "pytorch_lightning.trainer.states",
        {"TrainerState": type("TrainerState", (), {})},
    )
    stub(
        "pytorch_lightning.utilities",
        {"rank_zero_only": lambda f: f},
    )
    lf = stub("lightning_fabric", {})
    lf.__path__ = []
    stub("lightning_fabric.loggers", {})
    stub(
        "lightning_fabric.loggers.logger",
        {"rank_zero_experiment": lambda f: f},
    )
    stub("pydub", {"AudioSegment": object})
    stub("peaksjs_widget", {"PeaksJSWidget": object, "Segment": object, "Point": object})
    stub("qgrid", {"show_grid": lambda *a, **k: None})
    stub("pbind", {})
    mpl = stub("matplotlib", {"rcParams": {}})
    mpl.__path__ = []
    stub("matplotlib.pyplot", {"figure": lambda *a, **k: None})

    sys.path.insert(0, "/root/reference")


def import_reference():
    """Python 3.12 forbids unhashable dataclass defaults (the reference
    targets 3.9): patch the dataclass field check to restore 3.9 behavior
    for the reference's config classes."""
    import dataclasses as _d

    _orig = _d._get_field

    def _patched(cls, a_name, a_type, default_kw_only):
        try:
            return _orig(cls, a_name, a_type, default_kw_only)
        except ValueError as e:
            if "mutable default" in str(e):
                dflt = getattr(cls, a_name)
                type(dflt).__hash__ = object.__hash__
                return _orig(cls, a_name, a_type, default_kw_only)
            raise

    _d._get_field = _patched
    import mimikit as rmmk

    _d._get_field = _orig
    return rmmk


if __name__ == "__main__":
    install_stubs()
    rmmk = import_reference()

    io = rmmk.IOSpec.mulaw_io(rmmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = rmmk.SampleRNN.from_config(
        rmmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    )
    for k, v in net.state_dict().items():
        print(k, tuple(v.shape))
