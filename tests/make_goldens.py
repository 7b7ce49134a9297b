"""Generate tests/goldens/filterbanks.npz — golden arrays for the
librosa-free mel/MFCC/chroma filterbanks (VERDICT r2 item 8).

librosa is not installed in this image, so these goldens come from an
INDEPENDENT transcription of the published algorithms, structured
differently from ``mimikit_tpu/features/dsp.py`` (explicit per-(mel, bin)
triangle evaluation at float64 instead of the vectorized ramps trick;
scipy's own DCT-II for the MFCC basis).  They catch transcription bugs in
dsp.py and pin it against regression; exact librosa parity is claimed at
the formula level (Slaney mel scale + slaney norm — what
``librosa.filters.mel`` implements, reference
``/root/reference/mimikit/features/functionals.py:649-733``).

Run from the repo root: python tests/make_goldens.py
"""
import os

import numpy as np


def hz_to_mel_slaney(f):
    # O'Shaughnessy/Slaney auditory toolbox scale: linear below 1 kHz,
    # logarithmic above with step log(6.4)/27
    f = float(f)
    if f < 1000.0:
        return f / (200.0 / 3.0)
    return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)


def mel_to_hz_slaney(m):
    m = float(m)
    if m < 15.0:
        return m * (200.0 / 3.0)
    return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))


def mel_filterbank_independent(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.arange(n_bins, dtype=np.float64) * sr / n_fft
    mlo, mhi = hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax)
    centers = np.array(
        [
            mel_to_hz_slaney(mlo + (mhi - mlo) * i / (n_mels + 1))
            for i in range(n_mels + 2)
        ]
    )
    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    for k in range(n_mels):
        f_lo, f_c, f_hi = centers[k], centers[k + 1], centers[k + 2]
        enorm = 2.0 / (f_hi - f_lo)  # slaney norm: ~equal energy per band
        for b, f in enumerate(fft_freqs):
            rising = (f - f_lo) / (f_c - f_lo)
            falling = (f_hi - f) / (f_hi - f_c)
            fb[k, b] = max(0.0, min(rising, falling)) * enorm
    return fb


def main():
    import scipy.fft

    out = {}
    for sr, n_fft, n_mels in [(16000, 512, 40), (22050, 2048, 128)]:
        out[f"mel_{sr}_{n_fft}_{n_mels}"] = mel_filterbank_independent(
            sr, n_fft, n_mels
        ).astype(np.float32)
    # DCT-II with ortho norm from scipy (mfcc = basis @ log_mel):
    # row k of the basis = dct of the k-th unit vector's transpose
    for n_out, n_in in [(13, 40), (20, 128)]:
        eye = np.eye(n_in)
        full = scipy.fft.dct(eye, type=2, norm="ortho", axis=0)  # (n_in, n_in)
        out[f"dct_{n_out}_{n_in}"] = full[:n_out].astype(np.float32)

    # chroma: OUR gaussian-bump filterbank is a documented divergence from
    # librosa's chroma_stft (PARITY §2.3) — the golden pins it against
    # regression only
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mimikit_tpu.features.functionals import Chroma

    ch = Chroma(n_chroma=12, sr=16000, n_fft=512)
    out["chroma_12_512"] = np.asarray(ch._fb())

    path = os.path.join(os.path.dirname(__file__), "goldens", "filterbanks.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path, {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
