"""Executable notebook recipes (reference ``mimikit/demos/``) — these define
the canonical workload configs (BASELINE.json) and ARE the practical user
API: each module exposes a ``demo()`` reproducing the reference's recipe on
the TPU-native stack."""
from . import srnn, freqnet, seq2seq, ensemble_generator
from . import generate_from_checkpoint, checkpoint_k_bests
from . import clusterizer_app, samplify, wave_gan, serving
