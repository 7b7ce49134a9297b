"""Shared fixtures: fake-array datasets + a minimal fake ARM.

Mirrors the reference's fixture strategy
(``/root/reference/tests/test_utils.py:24-123``): random arrays stand in for
decoded audio so the whole suite runs without sound files.
"""
import dataclasses as dtc
from typing import Optional, Tuple

import numpy as np
import pytest

import mimikit_tpu as mmk


@dtc.dataclass
class RandSignal(mmk.Functional):
    """Fake FileToSignal: random float signal regardless of the 'file'."""

    sr: int = 16000
    n_samples: int = 32000

    @property
    def unit(self):
        return mmk.Sample(self.sr)

    @property
    def elem_type(self):
        return mmk.Continuous(-1.0, 1.0, 1)

    def np_func(self, inputs):
        rng = np.random.RandomState(abs(hash(str(inputs))) % (2 ** 31))
        return rng.uniform(-1, 1, self.n_samples).astype(np.float32)

    def __call__(self, inputs):
        return self.np_func(inputs)

    @property
    def inv(self):
        return mmk.Identity()


@dtc.dataclass
class RandLabel(mmk.Functional):
    n_classes: int = 16
    n_samples: int = 32000

    @property
    def elem_type(self):
        return mmk.Discrete(self.n_classes)

    def np_func(self, inputs):
        rng = np.random.RandomState(abs(hash(str(inputs))) % (2 ** 31))
        return rng.randint(0, self.n_classes, self.n_samples)

    def __call__(self, inputs):
        return self.np_func(inputs)

    @property
    def inv(self):
        return mmk.Identity()


class _TestCore:
    """flax core for TestARM: one shared Dense(1) over each input."""

    def __init__(self):
        import flax.linen as nn
        import jax.numpy as jnp

        class Core(nn.Module):
            @nn.compact
            def __call__(self, inputs, hidden=None, train=False):
                fc = nn.Dense(1)
                outs = tuple(
                    fc(x[..., None].astype(jnp.float32))[..., 0] for x in inputs
                )
                return outs, ()

        self.core = Core()


class TestARM(mmk.ARM):
    """Minimal fake network implementing the full ARM contract
    (reference ``tests/test_utils.py:64-123``): Dense in train mode,
    echo-last-step in eval mode."""

    @dtc.dataclass
    class Config(mmk.NetworkConfig):
        io_spec: mmk.IOSpec = None

    @classmethod
    def from_config(cls, config):
        return cls(config)

    def __init__(self, config):
        self._config = config
        self.module = _TestCore().core
        self.params = None
        self.training = True

    @property
    def config(self):
        return self._config

    @property
    def rf(self):
        return 8

    def init_params(self, batch_size=1, batch_length=8, rng=None):
        import jax.numpy as jnp

        if rng is None:
            rng = self.next_rng()
        dummy = tuple(
            jnp.zeros((batch_size, batch_length), jnp.float32)
            for _ in self.config.io_spec.inputs
        )
        self.params = self.module.init(rng, dummy, None, False)["params"]
        return self.params

    def _ensure_params(self, inputs):
        if self.params is None:
            self.init_params(np.shape(inputs[0])[0], np.shape(inputs[0])[1])

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def forward(self, inputs):
        import jax.numpy as jnp

        if self.training:
            self._ensure_params(inputs if isinstance(inputs, tuple) else (inputs,))
            if isinstance(inputs, (tuple, list)):
                outs, _ = self.module.apply(
                    {"params": self.params}, tuple(jnp.asarray(x) for x in inputs)
                )
                return outs
            outs, _ = self.module.apply(
                {"params": self.params}, (jnp.asarray(inputs),)
            )
            return outs[0]
        if isinstance(inputs, (tuple, list)):
            return tuple(np.asarray(x)[:, -1:] for x in inputs)
        return np.asarray(inputs)[:, -1:]

    def train_batch(self, item_spec):
        return tuple(
            feat.to_batch_item(item_spec) for feat in self.config.io_spec.inputs
        ), tuple(
            feat.to_batch_item(item_spec) for feat in self.config.io_spec.targets
        )

    def test_batch(self, item_spec):
        return self.train_batch(item_spec)

    @property
    def generate_params(self):
        return set()

    def before_generate(self, prompts, batch_index):
        self._ensure_params(prompts)

    def generate_step(self, inputs, *, t=0, **parameters):
        return tuple(np.asarray(i)[:, -1:] for i in inputs)

    def after_generate(self, final_outputs, batch_index):
        return


def make_db_config(tmp_path, sr=16000, n_samples=32000, filename="test.h5"):
    return mmk.DatasetConfig(
        sources=("0", "1"),
        filename=str(tmp_path / filename),
        extractors=(
            mmk.Extractor(name="signal", functional=RandSignal(sr, n_samples)),
        ),
    )


@pytest.fixture
def tmp_db(tmp_path):
    cfg = make_db_config(tmp_path)
    db = cfg.create(mode="w")
    yield db
    db.close()


def test_rand_db_fixture(tmp_db):
    assert tmp_db.signal.shape == (64000,)
    assert tmp_db.signal[0:10].shape == (10,)
    assert len(tmp_db.signal.refs) == 2
    assert tmp_db.signal.refs[1] == slice(32000, 64000)


def test_serve_slices(tmp_db):
    batch = (
        (
            mmk.Input(
                data="signal",
                getter=mmk.AsSlice(shift=0, length=16),
                transform=mmk.MuLawCompress(256),
            ),
        ),
        (mmk.Input(data="signal", getter=mmk.AsSlice(shift=8, length=8)),),
    )
    dl = tmp_db.serve(batch, batch_size=4, shuffle=True)
    (x,), (y,) = next(iter(dl))
    assert x.shape == (4, 16)
    assert x.dtype in (np.int64, np.int32)
    assert y.shape == (4, 8)
    assert len(dl) == (64000 - 16 + 1) // 4


def test_tbptt_sampler_is_contiguous():
    smp = mmk.TBPTTSampler(
        n_samples=10000, batch_size=2, chunk_length=2048, seq_len=512, seed=0
    )
    batches = list(iter(smp))
    assert len(batches) == len(smp)
    n_per_chunk = 2048 // 512
    for round_start in range(0, len(batches), n_per_chunk):
        rnd = batches[round_start : round_start + n_per_chunk]
        for j, batch in enumerate(rnd):
            for lane in range(2):
                assert batch[lane] == rnd[0][lane] + j * 512


def test_indices_sampler_fixed_and_random():
    smp = mmk.IndicesSampler(
        N=3, indices=(5, None, 11), max_i=100, sampling_stride=4, seed=0
    )
    idx = list(iter(smp))
    assert idx[0] == 5 and idx[2] == 11
    assert idx[1] % 4 == 0 and 0 <= idx[1] < 100


def test_parallel_dataset_creation_matches_serial(tmp_path):
    """n_workers>1 extracts sources in a spawn process pool (reference
    gets this from h5mapper's workers, SURVEY §3.3) — the dataset must be
    byte-identical to serial creation, refs included."""
    import numpy as np
    from scipy.io import wavfile

    srcs = []
    for i in range(3):
        t = np.arange(4000) / 16000.0
        wav = (0.3 * np.sin(2 * np.pi * (200 + 110 * i) * t) * 32767).astype(
            np.int16
        )
        p = str(tmp_path / f"s{i}.wav")
        wavfile.write(p, 16000, wav)
        srcs.append(p)

    def mk(fn, nw):
        return mmk.DatasetConfig(
            sources=tuple(srcs),
            filename=str(tmp_path / fn),
            extractors=(mmk.Extractor.signal(sr=16000),),
        ).create(mode="w", n_workers=nw)

    ser = mk("ser.h5", 1)
    par = mk("par.h5", 2)
    np.testing.assert_array_equal(
        np.asarray(ser.signal[:]), np.asarray(par.signal[:])
    )
    assert [tuple((r.start, r.stop)) for r in ser.signal.refs] == [
        tuple((r.start, r.stop)) for r in par.signal.refs
    ]
    ser.close()
    par.close()


def test_database_reopens_after_close(tmp_path):
    """Training loops close their handle on teardown, but the Database
    object commonly outlives them (train then generate from the same db)."""
    import numpy as np

    db = make_db_config(tmp_path, n_samples=2000, filename="ro.h5").create(
        mode="w"
    )
    a = np.asarray(db.signal[:8])
    db.close()
    b = np.asarray(db.signal[:8])
    assert np.array_equal(a, b)
