"""Small shared utilities (reference ``mimikit/utils.py:13-35``)."""
from enum import Enum

__all__ = [
    "AutoStrEnum",
    "SOUND_FILE_REGEX",
    "DATASET_REGEX",
    "CHECKPOINT_REGEX",
    "default_device",
    "FileWalker",
]

import re

SOUND_FILE_REGEX = re.compile(r".*\.(wav|aif|aiff|mp3|m4a|mp4|flac|ogg|npy)$")
DATASET_REGEX = re.compile(r".*\.h5$")
CHECKPOINT_REGEX = re.compile(r".*\.ckpt$")


class AutoStrEnum(str, Enum):
    """String-valued enum: members' values equal their names, so configs can
    compare against plain strings and YAML stores them as strings."""

    def _generate_next_value_(name, start, count, last_values):  # noqa: N805
        return name

    def __str__(self):
        return self.value


def FileWalker(pattern, root="./"):
    """Yield files under ``root`` matching a regex (h5mapper.FileWalker
    equivalent — see SURVEY.md §0)."""
    import os

    rex = re.compile(pattern) if isinstance(pattern, str) else pattern
    roots = [root] if isinstance(root, (str, bytes)) else list(root)
    for r in roots:
        if os.path.isfile(r):
            if rex.match(r):
                yield r
            continue
        for dirpath, _, files in os.walk(r):
            for f in sorted(files):
                if rex.match(f) or rex.match(os.path.join(dirpath, f)):
                    yield os.path.join(dirpath, f)


def default_device() -> str:
    """Return the default jax backend platform ('tpu', 'gpu' or 'cpu')."""
    import jax

    try:
        return jax.default_backend()
    except Exception:
        return "cpu"
