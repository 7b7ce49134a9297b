"""Small shared utilities (reference ``mimikit/utils.py:13-35``)."""
from enum import Enum

__all__ = [
    "AutoStrEnum",
    "SOUND_FILE_REGEX",
    "DATASET_REGEX",
    "CHECKPOINT_REGEX",
    "default_device",
    "FileWalker",
    "enable_compile_cache",
]

import os
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


def enable_compile_cache(cache_dir: str = "~/.cache/mimikit_tpu_xla") -> bool:
    """Enable jax's persistent compilation cache for accelerator backends.

    First-time compiles of the fused decode kernels cost minutes; on a
    standard TPU runtime the persistent cache makes them one-time per
    machine.  (Remote-proxied backends that cannot serialize executables
    simply never write entries — repeat compiles there are served by the
    device server's own cache, measured ~35x faster than cold.)
    Deliberately a no-op on the CPU backend: XLA:CPU AOT artifacts reload
    with mismatched machine features and can crash the process, and CPU
    compiles are fast anyway.  Returns True when the cache was enabled.

    Default ON since round 5 (the package enables it on import for
    non-CPU platforms); ``MMK_COMPILE_CACHE=0`` opts out, a directory
    path value relocates the cache.
    """
    import jax

    if default_device() == "cpu":
        return False
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
