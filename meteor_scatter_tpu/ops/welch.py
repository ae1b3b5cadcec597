"""Welch PSD with scipy-compatible semantics, as a batched XLA computation.

The streaming pipeline's only spectral op is
``scipy.signal.welch(block, fs, nfft=n_fft)`` (`dsp/src/live/backend/
processor.py:206`), i.e. scipy *defaults* everywhere else:

    nperseg=256, window='hann' (periodic), noverlap=nperseg//2,
    detrend='constant', scaling='density', onesided, average='mean'

Re-derived here (no scipy at runtime):

    seg   = frame(x, nperseg, nperseg - noverlap)
    seg  -= mean(seg, -1)                      # detrend 'constant'
    X     = rfft(seg * win, nfft)
    Pxx   = |X|^2 / (fs * sum(win^2))          # density scaling
    Pxx[..., 1:-1] *= 2 (even nfft) / [..., 1:] *= 2 (odd)   # onesided
    Pxx   = mean over segments

vmaps cleanly over blocks/channels: the live pipeline calls it on
(num_blocks, block_size) at once instead of per-block Python loops.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from meteor_scatter_tpu.ops.framing import frame_signal
from meteor_scatter_tpu.ops.window import hann_periodic


def welch_freqs(fs: float, nfft: int) -> np.ndarray:
    return np.fft.rfftfreq(nfft, d=1.0 / fs)


def welch_psd(
    x: jnp.ndarray,
    fs: float,
    nfft: int,
    nperseg: int = 256,
    noverlap: int | None = None,
    detrend: str = "constant",
) -> jnp.ndarray:
    """PSD of the last axis; returns (..., nfft//2 + 1) in power/Hz.

    Matches ``scipy.signal.welch(x, fs, nperseg=nperseg, noverlap=noverlap,
    nfft=nfft)`` with a periodic Hann window to f32 accuracy.
    """
    if noverlap is None:
        noverlap = nperseg // 2
    nperseg = min(nperseg, x.shape[-1])  # scipy clamps when input is short
    if nfft < nperseg:
        raise ValueError("nfft must be >= nperseg")
    hop = nperseg - noverlap

    win = jnp.asarray(hann_periodic(nperseg, dtype=np.float32))
    seg = frame_signal(x.astype(jnp.float32), nperseg, hop)
    if detrend == "constant":
        seg = seg - jnp.mean(seg, axis=-1, keepdims=True)
    X = jnp.fft.rfft(seg * win, n=nfft, axis=-1)
    p = (X.real * X.real + X.imag * X.imag) / (fs * float(np.sum(hann_periodic(nperseg) ** 2)))
    # one-sided doubling: every bin except DC, and except Nyquist when nfft even
    nbins = nfft // 2 + 1
    scale = np.ones(nbins, dtype=np.float32) * 2.0
    scale[0] = 1.0
    if nfft % 2 == 0:
        scale[-1] = 1.0
    p = p * jnp.asarray(scale)
    return jnp.mean(p, axis=-2)


def welch_band_matrix(
    fs: float,
    nfft: int,
    nperseg: int,
    bands: Tuple[Tuple[float, float], ...],
):
    """Projection matrix computing Welch *band sums* without the full PSD.

    For detection, only ``band_sum_db(welch_psd(...), band)`` for a few
    bands is needed — i.e. Σ_k∈band |X_k|²·c_k per segment, which is the
    squared norm of a handful of DFT rows.  Those rows (window, constant
    detrend, density scaling and one-sided doubling all folded in) become
    columns of one (nperseg, 2·total_bins) matrix, so the whole front half
    is a single MXU matmul on the raw segments instead of zero-padded
    nfft-point FFTs producing nfft/2+1 bins that are then discarded.

    Returns ``(P, slices)``: ``seg @ P`` squared and summed over
    ``slices[b]`` equals the Welch band sum of band ``b`` exactly (up to
    f32 reduction order).
    """
    freqs = welch_freqs(fs, nfft)
    win = hann_periodic(nperseg)  # float64
    norm = fs * float(np.sum(win**2))
    nbins = nfft // 2 + 1
    scale = np.ones(nbins) * 2.0
    scale[0] = 1.0
    if nfft % 2 == 0:
        scale[-1] = 1.0

    n = np.arange(nperseg)
    cols = []
    slices = []
    start = 0
    for band in bands:
        idx = np.nonzero((freqs >= band[0]) & (freqs <= band[1]))[0]
        for k in idx:
            c = np.sqrt(scale[k] / norm)
            ang = 2.0 * np.pi * k * n / nfft
            for basis in (np.cos(ang), np.sin(ang)):  # sign of -sin is squared away
                v = win * basis * c
                v = v - v.mean()  # detrend 'constant' folded in (symmetric)
                cols.append(v)
        slices.append((start, start + 2 * len(idx)))
        start += 2 * len(idx)
    P = np.stack(cols, axis=1).astype(np.float32)
    return P, tuple(slices)


def welch_band_sums_db(
    x: jnp.ndarray,
    nperseg: int,
    projection: jnp.ndarray,
    slices,
    noverlap: int | None = None,
):
    """Band dB levels over the last axis via :func:`welch_band_matrix` —
    equal to ``band_sum_db(welch_psd(x, ...), band)`` per band to f32
    reduction-order noise.  Returns a list of (...,)-shaped dB arrays."""
    if noverlap is None:
        noverlap = nperseg // 2
    hop = nperseg - noverlap
    seg = frame_signal(x.astype(jnp.float32), nperseg, hop)  # (..., nseg, nperseg)
    proj = seg @ projection  # (..., nseg, 2*total)
    pw = proj * proj
    out = []
    for a, b in slices:
        s = jnp.mean(jnp.sum(pw[..., a:b], axis=-1), axis=-1)
        out.append(10.0 * jnp.log10(s))
    return out


def band_sum_db(
    psd: jnp.ndarray, freqs: np.ndarray, band: Tuple[float, float], floor: float = 0.0
) -> jnp.ndarray:
    """10*log10 of the PSD summed over a band (inclusive edges), the
    streaming pipeline's per-block channel level (`processor.py:349-367`).

    The reference emits -inf when the band sum is exactly 0; with floor=0
    jnp.log10(0) = -inf reproduces that.
    """
    mask = (freqs >= band[0]) & (freqs <= band[1])
    idx = np.nonzero(mask)[0]
    s = jnp.sum(psd[..., idx], axis=-1) + floor
    return 10.0 * jnp.log10(s)
