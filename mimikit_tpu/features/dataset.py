"""Dataset creation/loading: sources × extractors -> typed feature file.

Rebuild of ``/root/reference/mimikit/features/dataset.py:14-65`` on top of the
h5py-backed :class:`~mimikit_tpu.data.store.Database`.  The created file
stores, per extractor, the concatenation of all per-source outputs with
region refs, and stamps its own YAML config into the file attrs.
"""
from __future__ import annotations

import dataclasses as dtc
import os
from typing import Tuple

import numpy as np

from ..config import Config
from ..data.store import Database
from .extractor import Extractor

__all__ = ["DatasetConfig"]


@dtc.dataclass
class DatasetConfig(Config, type_field=False):
    sources: Tuple[str, ...] = tuple()
    filename: str = "dataset.h5"
    extractors: Tuple[Extractor, ...] = tuple()

    def __post_init__(self):
        if not self.filename.startswith("/"):
            self.filename = os.path.abspath(self.filename)

    @property
    def schema(self):
        return {e.name: e for e in self.extractors}

    def create(self, mode: str = "w", **kwargs) -> Database:
        self.__post_init__()
        # fix loading files on a foreign filesystem: fall back to a walk from
        # the cwd for basenames that moved (reference ``dataset.py:32-39``)
        fixed_sources = []
        for src in self.sources:
            if not os.path.isfile(src):
                base = os.path.split(src)[-1]
                for root, _, files in os.walk(os.getcwd()):
                    if base in files:
                        fixed_sources.append(os.path.join(root, base))
                        break
                else:
                    fixed_sources.append(src)  # fixture sources may be virtual
            else:
                fixed_sources.append(src)
        self.sources = tuple(fixed_sources)

        db = Database(self.filename, mode=mode)
        db.attrs["sources"] = list(map(str, self.sources))

        # topologically simple: non-derived extractors first
        ordered = sorted(self.extractors, key=lambda e: e.derived_from is not None)
        per_source: dict = {}
        for extractor in ordered:
            outs, refs, pos = [], [], 0
            for src in self.sources:
                if extractor.derived_from is not None:
                    inp = per_source[(extractor.derived_from, src)]
                else:
                    inp = src
                out = np.asarray(extractor.load(inp))
                per_source[(extractor.name, src)] = out
                outs.append(out)
                refs.append((pos, pos + out.shape[0]))
                pos += out.shape[0]
            data = np.concatenate(outs, axis=0) if outs else np.zeros((0,))
            db.add_array(extractor.name, data, refs=refs)
            extractor.after_create(db, extractor.name)
            # expose attrs on the extractor (class_size property)
            extractor.attrs = dict(db.h5f[extractor.name].attrs)
        db.attrs["config"] = self.serialize()
        db.flush()
        db.config = self
        return db

    def get(self, mode: str = "r", **kwargs) -> Database:
        self.__post_init__()
        db = Database(self.filename, mode=mode)
        if "config" in db.attrs:
            db.config = Config.deserialize(db.attrs["config"], DatasetConfig)
        else:
            db.config = self
        for e in self.extractors:
            if e.name in db.h5f:
                e.attrs = dict(db.h5f[e.name].attrs)
        return db
