"""Fused band-power Pallas kernel.

One pass over the audio: a tile of frames streams HBM→VMEM, hits the MXU
against the windowed DFT-selector matrix (resident in VMEM), and only the
per-block dB levels leave the kernel — the (num_blocks, 2K) projection and
the power spectra are never materialized in HBM.  This is the Pallas form
of :func:`meteor_scatter_tpu.ops.bandpower.band_power_db` (the reference
hot loop, dsp/src/main.py:376-388).

Layout notes (see pallas guide "Tiling Constraints"):
* frames tile: (TILE_FRAMES, L) f32 — L=1200 for the 0.2 s BRAMS block;
* projection padded to 128 lanes so the MXU tile is full;
* outputs packed as (TILE_FRAMES, 128) with lanes 0/1/2 = band dB,
  noise dB, delta dB (narrow stores are layout-hostile on TPU; the caller
  slices lanes).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(frames_ref, proj_ref, out_ref, *, n_band: int, n_noise: int, floor: float):
    # HIGHEST keeps the f32 matmul out of bf16 passes — detection thresholds
    # sit 4 sigma out and the XLA path is exact-f32 (bandpower.py)
    p = jnp.dot(
        frames_ref[:],
        proj_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    p2 = p * p
    band_e = jnp.sum(p2[:, :n_band], axis=1) + floor
    noise_e = jnp.sum(p2[:, n_band : n_band + n_noise], axis=1) + floor
    band_db = 10.0 * jnp.log10(band_e)
    noise_db = 10.0 * jnp.log10(noise_e)
    tb = out_ref.shape[0]
    # pack into lanes 0/1/2 with select (scatter doesn't lower on TPU)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 1)
    out = jnp.where(lane == 0, band_db[:, None], 0.0)
    out = jnp.where(lane == 1, noise_db[:, None], out)
    out = jnp.where(lane == 2, (band_db - noise_db)[:, None], out)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("n_band", "n_noise", "floor", "tile_frames", "interpret"))
def _run(frames, proj_padded, n_band, n_noise, floor, tile_frames, interpret):
    nf, L = frames.shape
    grid = (pl.cdiv(nf, tile_frames),)
    kernel = functools.partial(_kernel, n_band=n_band, n_noise=n_noise, floor=floor)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nf, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_frames, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_frames, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * nf * L * LANES,
            bytes_accessed=nf * L * 4 + L * LANES * 4 + nf * LANES * 4,
            transcendentals=2 * nf,
        ),
        interpret=interpret,
    )(frames, proj_padded)


def band_power_db_pallas(
    frames: jnp.ndarray,
    projection: np.ndarray,
    slices: Sequence[slice],
    power_floor: float = 1e-12,
    tile_frames: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused (band_db, noise_db, delta) from raw frames.

    ``projection``/``slices`` come from
    :func:`meteor_scatter_tpu.ops.bandpower.band_projection_matrix` with
    exactly two bands (signal, noise).  Frames beyond a multiple of
    ``tile_frames`` are handled by padding with zero frames (their dB is
    the floor; callers slice to the true count).
    """
    if len(slices) != 2:
        raise ValueError("expected exactly [signal, noise] bands")
    n_band = slices[0].stop - slices[0].start
    n_noise = slices[1].stop - slices[1].start
    L, ncols = projection.shape
    if n_band + n_noise != ncols:
        raise ValueError("projection/slices mismatch")

    proj_padded = np.zeros((L, LANES), np.float32)
    proj_padded[:, :ncols] = projection
    nf = frames.shape[0]
    # ragged grids are fine: pallas masks the partial tile's output write and
    # rows past nf are sliced away, so the 86 MB frame array is NOT copied
    # into a padded buffer (that copy costs more than the kernel itself)
    out = _run(
        frames[:, :L].astype(jnp.float32),
        jnp.asarray(proj_padded),
        n_band,
        n_noise,
        power_floor,
        tile_frames,
        interpret,
    )
    return out[:nf, 0], out[:nf, 1], out[:nf, 2]


def fused_bandpower_delta(
    x: jnp.ndarray,
    fs: float,
    n_fft: int,
    block_size: int,
    freq_band: Tuple[float, float],
    noise_band: Tuple[float, float],
    power_floor: float = 1e-12,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """End-to-end hot loop with the Pallas kernel (drop-in for
    :func:`meteor_scatter_tpu.ops.bandpower.delta_power_db`)."""
    from meteor_scatter_tpu.ops.bandpower import band_projection_matrix
    from meteor_scatter_tpu.ops.framing import frame_signal

    M, slices = band_projection_matrix(fs, n_fft, block_size, [freq_band, noise_band])
    L = M.shape[0]
    frames = frame_signal(x.astype(jnp.float32), block_size, block_size)[..., :L]
    return band_power_db_pallas(frames, M, slices, power_floor, interpret=interpret)
