"""Named feature extraction at dataset-creation time.

Rebuild of ``/root/reference/mimikit/features/extractor.py:15-58``: an
:class:`Extractor` applies its functional to every source file (or to another
extractor's output when ``derived_from`` is set) and post-processes discrete
labels (class_size stamping, cross-file label merging, consolidation).
"""
from __future__ import annotations

import dataclasses as dtc
from typing import Optional

import numpy as np

from ..config import Config
from .functionals import Compose, Discrete, FileToSignal, Functional, Normalize, RemoveDC

__all__ = ["Extractor"]


@dtc.dataclass
class Extractor(Config, type_field=False):
    name: str
    functional: Functional
    merge_files_labels: bool = False
    consolidate_labels: bool = False
    derived_from: Optional[str] = None

    def load(self, inputs):
        return self.functional(inputs)

    def after_create(self, db, attr: str):
        if not isinstance(self.functional.elem_type, Discrete):
            return
        labels = getattr(db, attr)
        if self.merge_files_labels:
            # offset each file's labels so they don't collide (e.g. clustering)
            refs = labels.refs
            for i in range(1, len(refs)):
                offs = int(labels[refs[i - 1]].max()) + 1
                labels[refs[i]] = labels[refs[i]] + offs
            labels.attrs["class_size"] = int(labels[refs[-1]].max()) + 1
        elif self.consolidate_labels:
            # re-index to a dense range (e.g. after ArgMax)
            unq, inv = np.unique(labels[:], return_inverse=True)
            labels[:] = np.arange(len(unq))[inv].reshape(np.asarray(labels[:]).shape)
            labels.attrs["class_size"] = len(unq)
        else:
            labels.attrs["class_size"] = int(labels[:].max()) + 1

    @property
    def class_size(self):
        """available once the dataset has been extracted"""
        return self.attrs["class_size"]

    @staticmethod
    def signal(sr: int = 16000) -> "Extractor":
        return Extractor(
            name="signal",
            functional=Compose(FileToSignal(sr=sr), Normalize(), RemoveDC()),
        )
