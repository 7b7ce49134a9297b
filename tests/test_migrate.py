"""Import a trained reference (torch) SampleRNN into mimikit_tpu and verify
the imported model GENERATES identically, sample for sample.

The reference package is built in a subprocess (torch cannot load next to
jax in-process, and the reference's missing deps are stubbed — see
``reference_loader.py``).  Training-mode logits cannot match for the
bottom tier: the reference's FramedConv1dIO reshapes where it should
transpose (``resamplers.py:42``), scrambling time/channels whenever more
than one frame passes through — a quirk that disappears at single-step
decode, which is exactly the path imported checkpoints are used on.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"

_EXPORT = r"""
import sys
sys.path.insert(0, "__TESTDIR__")
from reference_loader import install_stubs, import_reference
install_stubs()
rmmk = import_reference()
import numpy as np
import torch

torch.manual_seed(0)
io = rmmk.IOSpec.mulaw_io(rmmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
net = rmmk.SampleRNN.from_config(rmmk.SampleRNN.Config(
    frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io))
net.eval()
rng = np.random.RandomState(0)
prompt = rng.randint(0, 32, (2, 16)).astype(np.int64)
pt = torch.from_numpy(prompt)
with torch.no_grad():
    net.before_generate((pt,), 0)
    outs = []
    for t in range(16, 28):
        o = net.generate_step((pt[:, t - 8 : t],), t=t)[0]
        outs.append(o.numpy().reshape(2))
        pt = torch.cat([pt, torch.from_numpy(outs[-1]).reshape(2, 1)], dim=1)
sd = {("sd__" + k): v.detach().numpy() for k, v in net.state_dict().items()}
np.savez("__OUT__", prompt=prompt, outs=np.stack(outs, axis=1), **sd)
print("OK")
"""


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_imported_torch_checkpoint_generates_identically(tmp_path):
    out = str(tmp_path / "ref.npz")
    code = _EXPORT.replace(
        "__TESTDIR__", os.path.dirname(os.path.abspath(__file__))
    ).replace("__OUT__", out)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "OK" in r.stdout, r.stderr[-800:]

    import mimikit_tpu as mmk

    z = np.load(out)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd__")}
    prompt = z["prompt"].astype(np.int32)
    ref_outs = z["outs"]

    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    )
    mmk.samplernn_params_from_state_dict(net, sd)
    mine = np.asarray(
        net.generate((prompt,), n_steps=12, temperature=None)[0][:, 16:]
    )
    assert np.array_equal(mine, ref_outs)


def test_state_dict_shape_mismatch_raises():
    import mimikit_tpu as mmk

    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    )
    with pytest.raises(ValueError):
        mmk.samplernn_params_from_state_dict(
            net, {"tiers.0.input_module.heads.0.2.weight": np.zeros((3, 3))}
        )


def test_unknown_reference_parameter_raises():
    import mimikit_tpu as mmk

    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = mmk.SampleRNN.from_config(
        mmk.SampleRNN.Config(frame_sizes=(8, 4, 2), hidden_dim=16, io_spec=io)
    )
    with pytest.raises(ValueError, match="unmapped"):
        mmk.samplernn_params_from_state_dict(net, {"mystery.weight": np.zeros(3)})


_EXPORT_WN = r"""
import sys
sys.path.insert(0, "__TESTDIR__")
from reference_loader import install_stubs, import_reference
install_stubs()
rmmk = import_reference()
import numpy as np
import torch

torch.manual_seed(0)
io = rmmk.IOSpec.mulaw_io(rmmk.IOSpec.MuLawIOConfig(
    q_levels=32, mlp_dim=16, input_module_type="embedding"))
net = rmmk.WaveNet.from_config(rmmk.WaveNet.Config(
    io_spec=io, blocks=(2,), dims_dilated=(16,), skips_dim=16,
    residuals_dim=16, pad_side=0))
net.train()
rng = np.random.RandomState(1)
x = rng.randint(0, 32, (2, 24)).astype(np.int64)
with torch.no_grad():
    out = net((torch.from_numpy(x),))
logits = (out[0] if isinstance(out, tuple) else out).numpy()
sd = {("sd__" + k): v.detach().numpy() for k, v in net.state_dict().items()}
np.savez("__OUT__", x=x, logits=logits, **sd)
print("OK")
"""


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_imported_wavenet_matches_torch_logits(tmp_path):
    out = str(tmp_path / "wn.npz")
    code = _EXPORT_WN.replace(
        "__TESTDIR__", os.path.dirname(os.path.abspath(__file__))
    ).replace("__OUT__", out)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "OK" in r.stdout, r.stderr[-800:]

    import mimikit_tpu as mmk

    z = np.load(out)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd__")}
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.WaveNet.from_config(
        mmk.WaveNet.Config(
            io_spec=io, blocks=(2,), dims_dilated=(16,), skips_dim=16,
            residuals_dim=16, pad_side=0,
        )
    )
    mmk.wavenet_params_from_state_dict(net, sd)
    net.train()
    mine = np.asarray(net.forward((z["x"].astype(np.int32),))[0])
    assert np.abs(mine - z["logits"]).max() < 1e-4


_EXPORT_TR = r"""
import sys
sys.path.insert(0, "__TESTDIR__")
from reference_loader import install_stubs, import_reference
install_stubs()
rmmk = import_reference()
import numpy as np
import torch

torch.manual_seed(0)
io = rmmk.IOSpec.mulaw_io(rmmk.IOSpec.MuLawIOConfig(
    q_levels=32, mlp_dim=16, input_module_type="embedding"))
net = rmmk.SimpleTransformer.from_config(rmmk.SimpleTransformer.Config(
    io_spec=io, model_dim=16, n_heads=2, feedforward_dim=32, num_layers=2,
    with_layer_norm=True, dropout=0.0, input_dropout=0.0, rf=8))
net.train()
rng = np.random.RandomState(3)
x = rng.randint(0, 32, (2, 12)).astype(np.int64)
with torch.no_grad():
    out = net((torch.from_numpy(x),))
logits = (out[0] if isinstance(out, tuple) else out).numpy()
sd = {("sd__" + k): v.detach().numpy() for k, v in net.state_dict().items()}
np.savez("__OUT__", x=x, logits=logits, **sd)
print("OK")
"""


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_imported_simple_transformer_matches_torch_logits(tmp_path):
    out = str(tmp_path / "tr.npz")
    code = _EXPORT_TR.replace(
        "__TESTDIR__", os.path.dirname(os.path.abspath(__file__))
    ).replace("__OUT__", out)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "OK" in r.stdout, r.stderr[-800:]

    import mimikit_tpu as mmk

    z = np.load(out)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd__")}
    io = mmk.IOSpec.mulaw_io(
        mmk.IOSpec.MuLawIOConfig(
            q_levels=32, mlp_dim=16, input_module_type="embedding"
        )
    )
    net = mmk.SimpleTransformer.from_config(
        mmk.SimpleTransformer.Config(
            io_spec=io, model_dim=16, n_heads=2, feedforward_dim=32,
            num_layers=2, with_layer_norm=True, dropout=0.0,
            input_dropout=0.0, rf=8,
        )
    )
    mmk.transformer_params_from_state_dict(net, sd)
    net.train()
    mine = np.asarray(net.forward((z["x"].astype(np.int32),))[0])
    assert np.abs(mine - z["logits"]).max() < 1e-4


_EXPORT_JB = r"""
import sys
sys.path.insert(0, "__TESTDIR__")
from reference_loader import install_stubs, import_reference
install_stubs()
rmmk = import_reference()
import numpy as np
import torch

torch.manual_seed(0)
io = rmmk.IOSpec.mulaw_io(rmmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
net = rmmk.JukeBox.from_config(rmmk.JukeBox.Config(
    io_spec=io, frame_sizes=(8, 4, 2), model_dim=16, n_heads=2,
    feedforward_dim=32, num_layers=1, dropout=0.0, weight_norm=True, rf=16))
net.train()
rng = np.random.RandomState(4)
x = rng.randint(0, 32, (2, 24)).astype(np.int64)
with torch.no_grad():
    out = net((torch.from_numpy(x),))
logits = (out[0] if isinstance(out, tuple) else out).numpy()
sd = {("sd__" + k): v.detach().numpy() for k, v in net.state_dict().items()}
np.savez("__OUT__", x=x, logits=logits, **sd)
print("OK")
"""


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_imported_jukebox_matches_torch_logits(tmp_path):
    """JukeBox with weight_norm=True: exercises the _g/_v fold + flax
    WeightNorm scale recompute alongside the tier/up-sampler mapping."""
    out = str(tmp_path / "jb.npz")
    code = _EXPORT_JB.replace(
        "__TESTDIR__", os.path.dirname(os.path.abspath(__file__))
    ).replace("__OUT__", out)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "OK" in r.stdout, r.stderr[-800:]

    import mimikit_tpu as mmk

    z = np.load(out)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd__")}
    io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
    net = mmk.JukeBox.from_config(
        mmk.JukeBox.Config(
            io_spec=io, frame_sizes=(8, 4, 2), model_dim=16, n_heads=2,
            feedforward_dim=32, num_layers=1, dropout=0.0, weight_norm=True,
            rf=16, ref_compat=True,
        )
    )
    mmk.transformer_params_from_state_dict(net, sd)
    net.train()
    mine = np.asarray(net.forward((z["x"].astype(np.int32),))[0])
    assert np.abs(mine - z["logits"]).max() < 1e-4


_EXPORT_S2S = r"""
import sys
sys.path.insert(0, "__TESTDIR__")
from reference_loader import install_stubs, import_reference
install_stubs()
rmmk = import_reference()
import numpy as np
import torch

torch.manual_seed(0)
io = rmmk.IOSpec.magspec_io(rmmk.IOSpec.MagSpecIOConfig(n_fft=64, hop_length=16))
net = rmmk.Seq2SeqLSTMNetwork.from_config(rmmk.Seq2SeqLSTMNetwork.Config(
    io_spec=io, model_dim=16, enc_n_lstm=2, dec_n_lstm=2, hop=4))
net.train()
rng = np.random.RandomState(5)
x = rng.rand(2, 4, 33).astype(np.float32)
with torch.no_grad():
    out = net((torch.from_numpy(x),))
out = (out[0] if isinstance(out, tuple) else out).numpy()
sd = {("sd__" + k): v.detach().numpy() for k, v in net.state_dict().items()}
np.savez("__OUT__", x=x, out=out, **sd)
print("OK")
"""


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_imported_seq2seq_matches_torch_outputs(tmp_path):
    """Seq2Seq import under ref_compat: reproduces the reference's
    adjacent-pair direction sum and hidden-to-all-decoder-layers seeding."""
    out = str(tmp_path / "s2s.npz")
    code = _EXPORT_S2S.replace(
        "__TESTDIR__", os.path.dirname(os.path.abspath(__file__))
    ).replace("__OUT__", out)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "OK" in r.stdout, r.stderr[-800:]

    import mimikit_tpu as mmk

    z = np.load(out)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd__")}
    io = mmk.IOSpec.magspec_io(mmk.IOSpec.MagSpecIOConfig(n_fft=64, hop_length=16))
    net = mmk.Seq2SeqLSTMNetwork.from_config(
        mmk.Seq2SeqLSTMNetwork.Config(
            io_spec=io, model_dim=16, enc_n_lstm=2, dec_n_lstm=2, hop=4,
            ref_compat=True,
        )
    )
    mmk.seq2seq_params_from_state_dict(net, sd)
    net.train()
    mine = np.asarray(net.forward((z["x"],))[0])
    assert np.abs(mine - z["out"]).max() < 1e-4


def test_seq2seq_import_requires_ref_compat():
    import mimikit_tpu as mmk

    io = mmk.IOSpec.magspec_io(mmk.IOSpec.MagSpecIOConfig(n_fft=64, hop_length=16))
    net = mmk.Seq2SeqLSTMNetwork.from_config(
        mmk.Seq2SeqLSTMNetwork.Config(io_spec=io, model_dim=16, hop=4)
    )
    with pytest.raises(ValueError, match="ref_compat"):
        mmk.seq2seq_params_from_state_dict(net, {})


_JB_LAG = r"""
import sys
sys.path.insert(0, "__TESTDIR__")
from reference_loader import install_stubs, import_reference
install_stubs()
rmmk = import_reference()
import numpy as np
import torch

torch.manual_seed(0)
io = rmmk.IOSpec.mulaw_io(rmmk.IOSpec.MuLawIOConfig(q_levels=32, mlp_dim=16))
net = rmmk.JukeBox.from_config(rmmk.JukeBox.Config(
    io_spec=io, frame_sizes=(8, 4, 2), model_dim=16, n_heads=2,
    feedforward_dim=32, num_layers=1, dropout=0.0, rf=16))
net.eval()
rng = np.random.RandomState(7)
win = rng.randint(0, 32, (2, 16)).astype(np.int64)
win_last = win.copy(); win_last[:, -1] = (win_last[:, -1] + 7) % 32
win_prev = win.copy(); win_prev[:, -2] = (win_prev[:, -2] + 7) % 32


net.train()  # train-mode forward exposes the LOGITS generate_step
             # samples from (same slicing, all positions)


def step(w):
    with torch.no_grad():
        o = net((torch.from_numpy(w),))[0]
    return o.numpy()[:, -1]  # last position = what generate_step uses


base, last, prev = step(win), step(win_last), step(win_prev)
np.savez("__OUT__", base=base, last=last, prev=prev)
print("OK")
"""


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_reference_jukebox_generate_step_ignores_newest_token(tmp_path):
    """Evidence for PARITY divergence #6 from the reference's OWN code:
    its ``JukeBox.generate_step`` (= train-mode forward, ``:-1`` slicing,
    ``transformers.py:360-365,415-421``) is INSENSITIVE to the final
    window token — each generated token estimates the PREVIOUS position,
    which is why its free-running generation collapses (and why our
    decode window leads the write position by one)."""
    out = str(tmp_path / "jb_lag.npz")
    code = _JB_LAG.replace(
        "__TESTDIR__", os.path.dirname(os.path.abspath(__file__))
    ).replace("__OUT__", out)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "OK" in r.stdout, r.stderr[-800:]
    z = np.load(out)
    # newest token changed -> reference output identical (the lag)
    assert np.array_equal(z["base"], z["last"])
    # second-to-last changed -> output responds (the context IS read)
    assert not np.array_equal(z["base"], z["prev"])
