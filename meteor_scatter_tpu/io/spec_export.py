"""Per-event spectrogram image export.

Array-native replacement for the reference's matplotlib figure exports:
the batch analyzer's ±3 s context crop around each detection
(`dsp/src/main.py:721-790`) and the live pipeline's waterfall-window export
(`processor.py:294-343`, frequency-limited to signal_freq ±
limit_freq_offset_wf2_and_export, dB range auto-gained from the
initialization PSD mean ± wf_offset_vmin/vmax).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from meteor_scatter_tpu.io.events_csv import OutputDetection
from meteor_scatter_tpu.io.png import colorize, upscale_to, write_png
from meteor_scatter_tpu.ops.spectrogram import spectrogram_scipy


def export_detection_spec(
    out_dir: str,
    det: OutputDetection,
    wav_data: np.ndarray,
    fs: float,
    n_fft: int = 1024,
    context_before_sec: float = 3.0,
    context_after_sec: float = 3.0,
    freq_band: Optional[Tuple[float, float]] = None,
    eps: float = 1e-10,
) -> str:
    """Crop ±context seconds around one detection, render its spectrogram
    (scipy convention, like `internal_print_spec_and_psd_mod`,
    main.py:52-54), and write ``spec_and_psd_{t0:.2f}_{t1:.2f}.png``.

    Larger windows get the doubled n_fft the reference picks
    (`main.py:749-752`).
    """
    t0 = max(det.t_start - context_before_sec, 0.0)
    t1 = min(det.t_stop + context_after_sec, len(wav_data) / fs)
    cut = np.asarray(wav_data[int(t0 * fs) : int(t1 * fs)], dtype=np.float32)
    dur = len(cut) / fs
    if dur > context_before_sec + context_after_sec + 2:
        n_fft = n_fft * 2

    freqs, times, sxx = spectrogram_scipy(cut, fs, nperseg=n_fft)
    sxx_db = 10.0 * np.log10(np.asarray(sxx) + eps)
    if freq_band is not None:
        mask = (freqs >= freq_band[0] - 50) & (freqs <= freq_band[1] + 50)
        sxx_db = sxx_db[mask]
    # time on x, low frequencies at the bottom (origin='lower')
    img = upscale_to(colorize(sxx_db[::-1, :]))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"spec_and_psd_{det.t_start:.2f}_{det.t_stop:.2f}.png")
    write_png(path, img)
    return path


def export_waterfall_window(
    out_dir: str,
    waterfall_db: np.ndarray,  # (n_blocks, n_bins), most recent last
    freqs: np.ndarray,
    block_times: Sequence[float],
    time_start: float,
    time_stop: float,
    duration: float,
    signal_freq: float,
    limit_freq_offset: float = 100.0,
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    time_before_sec: float = 3.0,
    time_after_sec: float = 3.0,
) -> Optional[str]:
    """Live-path export: once [time_start - before, time_stop + after] fits
    inside the waterfall ring (`processor.py:304`), crop it in time and to
    signal_freq ± limit_freq_offset in frequency, and write
    ``spec_{t0:.2f}_{t1:.2f}.png``.  Returns None while the window has not
    fully entered the buffer yet."""
    t_lo = time_start - time_before_sec
    t_hi = time_stop + time_after_sec
    times = np.asarray(block_times)
    if len(times) == 0 or not (times[0] <= t_lo and t_hi <= times[-1]):
        return None
    tmask = (times >= t_lo) & (times <= t_hi)
    fmask = (freqs >= signal_freq - limit_freq_offset) & (freqs <= signal_freq + limit_freq_offset)
    crop = np.asarray(waterfall_db)[tmask][:, fmask]
    img = upscale_to(colorize(crop.T[::-1, :], vmin=vmin, vmax=vmax))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"spec_{time_start:.2f}_{time_stop:.2f}.png")
    write_png(path, img)
    return path
