"""Nearest-Next-Neighbor: a non-neural "generator".

Rebuild of ``/root/reference/mimikit/models/nnn.py``: DTW subsequence match
of the prompt into a corpus, then play successive frames.
"""
from __future__ import annotations

import numpy as np

from ..extract.segment import dtw

__all__ = ["optimal_path", "NearestNextNeighbor"]


def optimal_path(x, y):
    from sklearn.metrics import pairwise_distances

    C = pairwise_distances(np.abs(x), np.abs(y), metric="cosine")
    return dtw(C, subseq=True)[1]


class NearestNextNeighbor:
    def __init__(self, feature, snd, path_length: int = 16):
        self.feature = feature
        self.snd = np.asarray(feature(snd[:]) if callable(feature) else snd)
        self._t = -100
        self._starts = None
        self.shift = path_length
        self.output_length = lambda x: 1

    def predict_start_frame(self, X):
        path = optimal_path(X, self.snd)
        return int(path[-1, -1]) + 1

    def generate_step(self, inputs, *, t: int = 0, **parameters):
        """predict start frame if inputs is new else return next frame"""
        if t != self._t + 1:
            self._starts = [
                self.predict_start_frame(np.asarray(x)) for x in inputs[0]
            ]
            self._t = t - 1
        output = np.stack(
            [self.snd[i : i + 1] for i in self._starts]
        )
        self._starts = [x + 1 for x in self._starts]
        self._t += 1
        return output

    # minimal ARM-ish surface so GenerateLoopV2 / EnsembleGenerator accept it
    def before_generate(self, prompts, batch_index):
        self._t = -100

    def after_generate(self, final_outputs, batch_index):
        self._t = -100

    @property
    def generate_params(self):
        return set()
