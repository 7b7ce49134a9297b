"""Config system round-trips (reference ``tests/test_checkpointable.py``)."""
import dataclasses as dtc
from typing import Optional, Tuple

import mimikit_tpu as mmk


def test_type_tag_and_roundtrip():
    f = mmk.MuLawCompress(q_levels=128, compression=0.5)
    y = f.serialize()
    assert "type: MuLawCompress" in y
    g = mmk.Config.deserialize(y)
    assert isinstance(g, mmk.MuLawCompress)
    assert g == f


def test_nested_compose_roundtrip():
    c = mmk.Compose(mmk.FileToSignal(16000), mmk.Normalize(), mmk.RemoveDC())
    c2 = mmk.Config.deserialize(c.serialize())
    assert c2 == c
    assert isinstance(c2.functionals[0], mmk.FileToSignal)


def test_inverse_of_deserialized():
    c = mmk.Compose(mmk.MuLawCompress(64))
    c2 = mmk.Config.deserialize(c.serialize())
    inv = c2.inv
    assert isinstance(inv.functionals[0], mmk.MuLawExpand)
    assert inv.functionals[0].q_levels == 64


# a user-defined config OUTSIDE the mimikit_tpu package must round-trip via
# its module-qualified type tag
@dtc.dataclass
class MyCustomConfig(mmk.Config):
    lr: float = 1e-3
    dims: Tuple[int, ...] = (8, 16)
    name: Optional[str] = None


def test_user_defined_config_roundtrip():
    cfg = MyCustomConfig(lr=0.5, dims=(1, 2, 3), name="x")
    y = cfg.serialize()
    assert ":" in y.splitlines()[0]  # module-qualified tag
    cfg2 = mmk.Config.deserialize(y)
    assert isinstance(cfg2, MyCustomConfig)
    assert cfg2 == cfg
    assert cfg2.dims == (1, 2, 3)


def test_extractor_roundtrip():
    e = mmk.Extractor.signal(sr=22050)
    e2 = mmk.Config.deserialize(e.serialize(), as_type=mmk.Extractor)
    assert e2.name == "signal"
    assert isinstance(e2.functional, mmk.Compose)
    assert e2.functional.functionals[0].sr == 22050


def test_dataset_config_roundtrip(tmp_path):
    cfg = mmk.DatasetConfig(
        sources=("a.wav", "b.wav"),
        filename=str(tmp_path / "db.h5"),
        extractors=(mmk.Extractor.signal(16000),),
    )
    y = cfg.serialize()
    cfg2 = mmk.Config.deserialize(y, as_type=mmk.DatasetConfig)
    assert cfg2.sources == cfg.sources
    assert isinstance(cfg2.extractors[0], mmk.Extractor)


def test_owner_class():
    # Functional's owner mapping: a nested Config maps back to its outer class
    f = mmk.MuLawCompress()
    assert f.owner_class is mmk.MuLawCompress


def test_every_network_config_roundtrips():
    """Serialize -> deserialize every network family's Config with a real
    io_spec; the YAML wire format must reconstruct an equal config."""
    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    mag = mmk.IOSpec.magspec_io(
        mmk.IOSpec.MagSpecIOConfig(n_fft=256, hop_length=64)
    )
    configs = [
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io),
        mmk.WaveNet.Config(io_spec=io, blocks=(3,), dims_dilated=(16,)),
        mmk.Seq2SeqLSTMNetwork.Config(io_spec=mag, model_dim=32, hop=4),
        mmk.SimpleTransformer.Config(
            io_spec=io, model_dim=16, n_heads=2, feedforward_dim=32,
            num_layers=1, rf=8,
        ),
        mmk.JukeBox.Config(
            io_spec=io, frame_sizes=(8, 4, 2), model_dim=16, n_heads=2,
            feedforward_dim=32, num_layers=1, rf=16,
        ),
        mmk.TrainARMConfig(batch_size=4, batch_length=16, max_epochs=2),
        mmk.GenerateLoopV2.Config(
            prompts_length_sec=0.1, output_duration_sec=0.1
        ),
    ]
    for cfg in configs:
        clone = mmk.Config.deserialize(cfg.serialize())
        assert type(clone) is type(cfg), type(cfg).__name__
        assert clone.serialize() == cfg.serialize(), type(cfg).__name__


def test_deserialized_tuples_stay_tuples():
    """Tuple-annotated fields must materialize as tuples after deserialize
    (the reference's OmegaConf structured configs do), even though the
    networks' Config classes carry forward-ref string annotations that
    typing.get_type_hints alone cannot resolve."""
    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    cfg = mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    clone = mmk.Config.deserialize(cfg.serialize())
    assert clone.frame_sizes == (8, 4, 2)
    assert isinstance(clone.frame_sizes, tuple)
    wn = mmk.Config.deserialize(
        mmk.WaveNet.Config(io_spec=io, blocks=(3, 2), dims_dilated=(16,)).serialize()
    )
    assert isinstance(wn.blocks, tuple) and isinstance(wn.dims_dilated, tuple)
    # user code appends to these after loading a checkpoint
    assert clone.frame_sizes + (2,) == (8, 4, 2, 2)
