"""Spectrograms as batched XLA rFFTs.

Two compatibility modes cover both reference conventions:

* :func:`spectrogram_scipy` — ``scipy.signal.spectrogram(x, fs,
  window='hann', nperseg=N, noverlap=N//2, nfft=N, scaling='density',
  mode='psd')`` used by the batch analyzer's plots (`dsp/src/main.py:52`).
  Periodic Hann, detrend='constant'.

* :func:`spectrogram_mpl` — ``plt.specgram(x, Fs=fs, NFFT=N,
  noverlap=N//2)`` used by the live ML path (`meteor_detect_class/
  prime_detection.py:66`): *symmetric* Hann (matplotlib's
  ``window_hanning``), no detrend, scale_by_freq density scaling.

Both return (freqs, times, Sxx) with Sxx shaped (..., n_bins, n_frames)
like their originals, so downstream noise-floor math ports one-to-one.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from meteor_scatter_tpu.ops.framing import frame_signal
from meteor_scatter_tpu.ops.window import hann_periodic, hann_symmetric


def _stft_psd(
    x: jnp.ndarray,
    fs: float,
    nperseg: int,
    noverlap: int,
    nfft: int,
    win: np.ndarray,
    detrend_constant: bool,
) -> jnp.ndarray:
    hop = nperseg - noverlap
    seg = frame_signal(x.astype(jnp.float32), nperseg, hop)
    if detrend_constant:
        seg = seg - jnp.mean(seg, axis=-1, keepdims=True)
    X = jnp.fft.rfft(seg * jnp.asarray(win.astype(np.float32)), n=nfft, axis=-1)
    p = (X.real * X.real + X.imag * X.imag) / (fs * float(np.sum(win.astype(np.float64) ** 2)))
    nbins = nfft // 2 + 1
    scale = np.ones(nbins, dtype=np.float32) * 2.0
    scale[0] = 1.0
    if nfft % 2 == 0:
        scale[-1] = 1.0
    return p * jnp.asarray(scale)


def spectrogram_scipy(
    x: jnp.ndarray,
    fs: float,
    nperseg: int,
    noverlap: int | None = None,
    nfft: int | None = None,
) -> Tuple[np.ndarray, np.ndarray, jnp.ndarray]:
    """scipy.signal.spectrogram parity (psd mode, density scaling)."""
    if noverlap is None:
        noverlap = nperseg // 2
    if nfft is None:
        nfft = nperseg
    win = hann_periodic(nperseg)
    p = _stft_psd(x, fs, nperseg, noverlap, nfft, win, detrend_constant=True)
    hop = nperseg - noverlap
    nf = p.shape[-2]
    freqs = np.fft.rfftfreq(nfft, d=1.0 / fs)
    # scipy centers each segment: t = (start + nperseg/2) / fs
    times = (np.arange(nf) * hop + nperseg / 2.0) / fs
    return freqs, times, jnp.swapaxes(p, -1, -2)


def spectrogram_mpl(
    x: jnp.ndarray,
    fs: float,
    nfft: int,
    noverlap: int | None = None,
) -> Tuple[np.ndarray, np.ndarray, jnp.ndarray]:
    """matplotlib ``plt.specgram`` parity (default mode='psd',
    scale_by_freq=True, window_hanning, detrend_none)."""
    if noverlap is None:
        noverlap = 128  # matplotlib default
    win = hann_symmetric(nfft)
    p = _stft_psd(x, fs, nfft, noverlap, nfft, win, detrend_constant=False)
    hop = nfft - noverlap
    nf = p.shape[-2]
    freqs = np.fft.rfftfreq(nfft, d=1.0 / fs)
    times = (np.arange(nf) * hop + nfft / 2.0) / fs
    return freqs, times, jnp.swapaxes(p, -1, -2)


def spectrogram_db(Sxx: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """10*log10(Sxx + eps), the reference's display transform
    (`main.py:61,153`)."""
    return 10.0 * jnp.log10(Sxx + eps)
