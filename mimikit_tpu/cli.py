"""Command-line entry points.

The reference declares ``segment`` and ``stretch`` console scripts pointing
at functions that do not exist (``pyproject.toml:76-78`` — dead metadata).
These are working equivalents:

- ``mimikit-segment file.wav``: recurrence-matrix segmentation
  (``extract/segment.py``) printed as JSON, optionally writing one wav per
  segment.
- ``mimikit-stretch file.wav 0.5``: phase-vocoder time stretch.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

__all__ = ["segment_main", "stretch_main"]


def _load(path: str, sr: int):
    from .features.audio_io import load_audio

    return load_audio(path, sr=sr)


def segment_main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="mimikit-segment",
        description="Detect segment boundaries via the recurrence-matrix "
        "checker-kernel method and print them as JSON.",
    )
    p.add_argument("files", nargs="+", help="audio files (wav/npy; others via ffmpeg)")
    p.add_argument("--sr", type=int, default=22050, help="analysis sample rate")
    p.add_argument("--n-fft", type=int, default=2048)
    p.add_argument("--hop-length", type=int, default=512)
    p.add_argument(
        "--kernel-sizes", type=int, nargs="+", default=[6],
        help="checker-kernel half-widths (frames)",
    )
    p.add_argument("--min-dur", type=int, default=4, help="min segment frames")
    p.add_argument("--min-strength", type=float, default=0.03)
    p.add_argument(
        "--write", action="store_true",
        help="also write each segment as <file>.seg<N>.wav",
    )
    args = p.parse_args(argv)

    from .extract.segment import from_recurrence_matrix
    from .features.dsp import stft_np
    from .features.audio_io import write_wav

    out = {}
    for path in args.files:
        y = _load(path, args.sr)
        S = np.abs(
            stft_np(np.asarray(y, np.float32), args.n_fft, args.hop_length)
        )
        cuts, _, _ = from_recurrence_matrix(
            S,
            kernel_sizes=tuple(args.kernel_sizes),
            min_dur=args.min_dur,
            min_strength=args.min_strength,
        )
        cuts = np.sort(np.asarray(cuts).reshape(-1))
        times = [round(float(c) * args.hop_length / args.sr, 4) for c in cuts]
        out[path] = times
        if args.write:
            bounds = [0, *(int(c) * args.hop_length for c in cuts), len(y)]
            stem, _ = os.path.splitext(path)
            for i, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
                if b > a:
                    write_wav(f"{stem}.seg{i}.wav", y[a:b], args.sr)
    json.dump(out, sys.stdout, indent=2)
    print()
    return 0


def stretch_main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="mimikit-stretch",
        description="Phase-vocoder time stretch (pitch preserved): "
        "rate > 1 shortens, rate < 1 lengthens.",
    )
    p.add_argument("file", help="audio file")
    p.add_argument("rate", type=float, help="stretch rate (e.g. 0.5 = 2x longer)")
    p.add_argument("-o", "--output", default=None, help="output path (.wav)")
    p.add_argument("--sr", type=int, default=22050)
    p.add_argument("--n-fft", type=int, default=2048)
    p.add_argument("--hop-length", type=int, default=512)
    args = p.parse_args(argv)

    if args.rate <= 0:
        p.error("rate must be positive")

    from .features.audio_io import write_wav
    from .features.functionals import TimeStretch

    y = _load(args.file, args.sr)
    out = TimeStretch(
        rate=args.rate, n_fft=args.n_fft, hop_length=args.hop_length
    )(np.asarray(y, np.float32))
    dest = args.output
    if dest is None:
        stem, _ = os.path.splitext(args.file)
        dest = f"{stem}.x{args.rate:g}.wav"
    write_wav(dest, out, args.sr)
    print(dest)
    return 0
