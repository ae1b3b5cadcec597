"""FIR design + filtering + polyphase resampling.

The reference ingests *pre-resampled* recordings (filenames like
``..._resampled.wav`` / ``..._sampled.wav``, `dsp/src/live/main.py:23,45`) —
the decimation happened offline in GQRX/HDSDR.  This framework does it on
device: an SDR front-end at its native rate is FIR-bandpassed around the
beacon tone and polyphase-decimated to the analysis rate, all expressed as
strided/dilated convolutions that XLA lowers onto the MXU.

FIR design is the classic window method (scipy.firwin-equivalent, Hamming
window, unity passband gain), implemented from first principles in numpy.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _hamming(m: int) -> np.ndarray:
    n = np.arange(m, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (m - 1))


def firwin_lowpass(numtaps: int, cutoff: float, fs: float = 2.0) -> np.ndarray:
    """Windowed-sinc lowpass; ``cutoff`` in Hz for sample rate ``fs``.
    Normalized to unity gain at DC (scipy.firwin convention)."""
    fc = cutoff / (fs / 2.0)  # normalized to Nyquist
    m = numtaps
    alpha = (m - 1) / 2.0
    n = np.arange(m, dtype=np.float64) - alpha
    h = fc * np.sinc(fc * n) * _hamming(m)
    return h / np.sum(h)


def firwin_bandpass(numtaps: int, f_lo: float, f_hi: float, fs: float) -> np.ndarray:
    """Bandpass as difference of two lowpasses, gain-normalized at the band
    center so the beacon tone passes at unity."""
    if numtaps % 2 == 0:
        raise ValueError("bandpass FIR needs odd numtaps (type-I symmetry)")

    def _lp(cut):  # un-normalized windowed sinc

        fc = cut / (fs / 2.0)
        alpha = (numtaps - 1) / 2.0
        n = np.arange(numtaps, dtype=np.float64) - alpha
        return fc * np.sinc(fc * n) * _hamming(numtaps)

    h = _lp(f_hi) - _lp(f_lo)
    # normalize to unity gain at band center
    fc_mid = 0.5 * (f_lo + f_hi)
    n = np.arange(numtaps, dtype=np.float64)
    gain = abs(np.sum(h * np.exp(-2j * np.pi * fc_mid / fs * n)))
    return h / gain


def fir_filter(x: jnp.ndarray, taps: np.ndarray, mode: str = "same") -> jnp.ndarray:
    """1-D FIR along the last axis via XLA convolution.

    mode 'same' matches np.convolve(x, taps, 'same'); 'valid' drops the
    transient edges; 'full' keeps everything.
    """
    t = len(taps)
    if mode == "same":
        pad = ((t - 1) // 2, t - 1 - (t - 1) // 2)
    elif mode == "valid":
        pad = (0, 0)
    elif mode == "full":
        pad = (t - 1, t - 1)
    else:
        raise ValueError(mode)
    return _conv1d(x, taps, stride=1, pad=pad, lhs_dilation=1)


def polyphase_decimate(x: jnp.ndarray, taps: np.ndarray, q: int) -> jnp.ndarray:
    """Anti-alias filter + keep every q-th sample, computed polyphase: the
    strided convolution only evaluates the outputs that survive, so the
    filter runs at the *output* rate (q× cheaper than filter-then-slice)."""
    t = len(taps)
    pad = ((t - 1) // 2, t - 1 - (t - 1) // 2)
    return _conv1d(x, taps, stride=q, pad=pad, lhs_dilation=1)


def resample_poly(x: jnp.ndarray, up: int, down: int, numtaps_per_phase: int = 20) -> jnp.ndarray:
    """Rational-rate polyphase resampler (scipy.signal.resample_poly
    analog).  Upsampling is expressed as lhs_dilation and downsampling as
    window stride of one XLA convolution — the compiler sees the whole
    upfirdn structure and skips the zero multiplies."""
    g = math.gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x
    max_rate = max(up, down)
    numtaps = 2 * numtaps_per_phase * max_rate + 1
    # cutoff at min(1/up, 1/down) of the upsampled Nyquist
    h = firwin_lowpass(numtaps, 1.0 / max_rate, fs=2.0) * up
    t = len(h)
    n = x.shape[-1]
    n_out = int(math.ceil(n * up / down))
    # left pad centers the filter (phase-preserving); right pad is sized so
    # the strided conv emits exactly n_out samples even when the dilated
    # input (n-1)*up+1 ends short of the last output's support
    pl = (t - 1) // 2
    l_dil = (n - 1) * up + 1
    pr = max((n_out - 1) * down + t - l_dil - pl, 0)
    y = _conv1d(x, h, stride=down, pad=(pl, pr), lhs_dilation=up)
    return y[..., :n_out]


def _conv1d(x, taps, stride, pad, lhs_dilation):
    taps = jnp.asarray(np.asarray(taps, dtype=np.float32)[::-1].copy())
    orig_shape = x.shape
    xf = x.astype(jnp.float32).reshape(-1, 1, orig_shape[-1])  # (N, C=1, W)
    k = taps.reshape(1, 1, -1)  # (O=1, I=1, W)
    y = jax.lax.conv_general_dilated(
        xf,
        k,
        window_strides=(stride,),
        padding=[pad],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(orig_shape[:-1] + (y.shape[-1],))


def channelize(
    x: jnp.ndarray,
    fs: float,
    center_freqs: np.ndarray,
    bandwidth: float,
    decim: int,
    numtaps: int = 257,
    channel_chunk: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-channel DDC bank: mix each beacon channel to baseband, lowpass,
    and decimate — the front half of BASELINE config 4's "polyphase
    channelizer".  Returns the complex baseband as a *real pair*
    ``(re, im)``, each (n_channels, n_out) float32 — this TPU backend has
    no complex dtype support, and I/Q-as-two-reals is the faster layout
    anyway (pure VPU multiplies + batched real convolutions).

    The mixer for an integer-Hz channel repeats every ``fs/gcd(fc, fs)``
    samples, so only one period table per channel is built on the host and
    tiled on device — no (C, n) float64 phase ramp is ever materialized
    (that costs more than the filtering at MS/s rates).  Channels are
    processed in chunks that share one batched strided convolution.
    """
    n = x.shape[-1]
    fs_i = int(round(fs))
    if abs(fs - fs_i) > 1e-6:
        raise ValueError("channelize requires an integer sample rate")
    h = firwin_lowpass(numtaps, bandwidth / 2.0, fs)
    xj = jnp.asarray(x, jnp.float32)

    def mixer_tables(fc: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
        fc_i = int(round(fc))
        if abs(fc - fc_i) > 1e-9:
            raise ValueError("channel centers must be integer Hz")
        period = fs_i // math.gcd(abs(fc_i) % fs_i or fs_i, fs_i)
        k = np.arange(min(period, n), dtype=np.int64)
        phase = 2.0 * np.pi * ((k * (fc_i % fs_i)) % fs_i) / fs_i
        reps = -(-n // len(k))
        cos_t = jnp.tile(jnp.asarray(np.cos(phase), dtype=jnp.float32), reps)[:n]
        sin_t = jnp.tile(jnp.asarray(np.sin(phase), dtype=jnp.float32), reps)[:n]
        return cos_t, sin_t

    res, ims = [], []
    freqs = list(np.asarray(center_freqs).ravel())
    for c0 in range(0, len(freqs), channel_chunk):
        group = freqs[c0 : c0 + channel_chunk]
        tables = [mixer_tables(fc) for fc in group]
        cos_m = jnp.stack([t[0] for t in tables])  # (G, n)
        sin_m = jnp.stack([t[1] for t in tables])
        # e^{-j2πft} · x  =  x·cos  −  j·x·sin
        res.append(polyphase_decimate(xj[None, :] * cos_m, h, decim))
        ims.append(polyphase_decimate(-(xj[None, :] * sin_m), h, decim))
    return jnp.concatenate(res, axis=0), jnp.concatenate(ims, axis=0)
