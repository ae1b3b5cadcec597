"""Dependency-free PNG writer + colormaps for spectrogram export.

The reference renders every spectrogram through matplotlib
(`prime_detection.py:61-98`, `processor.py:294-343`) — a heavy dependency
and the slowest phase of its live loop.  Here the dB array is colorized
with a viridis-style lookup and written as a zlib-compressed PNG directly;
matplotlib is optional everywhere in this framework.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# 17-anchor approximation of viridis (linear interpolation between rows).
_VIRIDIS = np.array(
    [
        [68, 1, 84], [71, 19, 101], [72, 36, 117], [70, 52, 128],
        [65, 68, 135], [59, 82, 139], [53, 95, 141], [47, 108, 142],
        [42, 120, 142], [37, 132, 142], [33, 145, 140], [30, 156, 137],
        [34, 168, 132], [47, 180, 124], [68, 191, 112], [94, 201, 98],
        [122, 209, 81],
    ],
    dtype=np.float64,
)
_VIRIDIS_TAIL = np.array(
    [[122, 209, 81], [155, 217, 60], [189, 223, 38], [223, 227, 24], [253, 231, 37]],
    dtype=np.float64,
)
_VIRIDIS_FULL = np.concatenate([_VIRIDIS, _VIRIDIS_TAIL[1:]], axis=0)

_GRAY = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.float64)


def colorize(
    values: np.ndarray,
    vmin: float | None = None,
    vmax: float | None = None,
    cmap: str = "viridis",
) -> np.ndarray:
    """Map a 2-D float array to (H, W, 3) uint8 via a colormap, clipping to
    [vmin, vmax] like matplotlib's imshow vmin/vmax."""
    v = np.asarray(values, dtype=np.float64)
    finite = np.isfinite(v)
    if vmin is None:
        vmin = float(v[finite].min()) if finite.any() else 0.0
    if vmax is None:
        vmax = float(v[finite].max()) if finite.any() else 1.0
    if vmax <= vmin:
        vmax = vmin + 1.0
    x = np.clip((v - vmin) / (vmax - vmin), 0.0, 1.0)
    x = np.where(finite, x, 0.0)

    table = _VIRIDIS_FULL if cmap == "viridis" else _GRAY
    pos = x * (len(table) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(table) - 1)
    frac = (pos - lo)[..., None]
    rgb = table[lo] * (1 - frac) + table[hi] * frac
    return rgb.astype(np.uint8)


def upscale_to(rgb: np.ndarray, min_w: int = 640, min_h: int = 320) -> np.ndarray:
    """Integer nearest-neighbor upscale so raw STFT-bin images (often only
    tens of pixels) become readable, without interpolation artifacts."""
    h, w = rgb.shape[:2]
    fy = max(1, int(np.ceil(min_h / h)))
    fx = max(1, int(np.ceil(min_w / w)))
    return np.repeat(np.repeat(rgb, fy, axis=0), fx, axis=1)


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as an RGB PNG (filter 0, one IDAT)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)
    h, w, _ = rgb.shape

    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = rgb.reshape(h, w * 3)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), 6)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", idat))
        fh.write(chunk(b"IEND", b""))


def read_png_size(path: str) -> tuple[int, int]:
    """(width, height) from the IHDR — used by tests."""
    with open(path, "rb") as fh:
        fh.seek(16)
        w, h = struct.unpack(">II", fh.read(8))
    return w, h
