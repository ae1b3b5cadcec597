"""Fused adaptive-threshold solver Pallas kernel.

One kernel computes everything between the delta-dB series and the event
mask of the reference's adaptive detector (`dsp/src/main.py:450-522`):
rolling-window mean/std prefix statistics, and the freeze-recurrence
fixpoint of :func:`meteor_scatter_tpu.models.adaptive.adaptive_thresholds_parallel`.

Why: profiled on the target chip, the XLA formulation spends ~0.7 ms in
`jnp.cumsum` passes and ~0.5 ms across the fixpoint rounds' `cummax` /
gather launches — pure launch/pass overhead on a 72 KB series.  Here the
series lives in VMEM as one (rows, 128) tile-set and every prefix scan is
log2 shift-and-combine steps on the VPU (`pltpu.roll` along lanes, then
along sublanes for the row stage), so the entire solver is a single
launch with zero HBM round-trips between passes.

Layout: the block series is reshaped row-major to (R, 128), R a multiple
of 8 (f32 tile = 8×128).  A flattened shift by ``s = a*128 + b`` is a
lane roll by ``b`` with row-carry plus a sublane roll by ``a``; prefix
scans run lanes-first then combine row totals (scan of row sums) as
broadcast offsets.  The "threshold value of the last updatable block"
gather is replaced by an argmax-style pair scan carrying (index, value),
so nothing needs dynamic indexing.

Capacity: everything stays in VMEM, so one launch is bounded by
:data:`MAX_FUSED_BLOCKS`.  Longer series run as exact sequential chunks
(:func:`adaptive_solver_fused_chunk`): each chunk carries the freeze
horizon + standing threshold in SMEM scalars and a window-sized delta
halo for the rolling statistics, so a 24 h file is 4 launches with
results identical to the whole-series solution
(`meteor_scatter_tpu.models.adaptive._detect_adaptive_fused`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_FUSED_BLOCKS = 131072  # (R=1024, 128) → ~12 × 512 KB live in VMEM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ids(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row, col, row * shape[1] + col


def _flat_shift(x, s: int, fill):
    """result[i] = x[i-s] over the flattened row-major array; fill for i<s."""
    R, C = x.shape
    if s == 0:
        return x
    a, b = s // C, s % C
    y = x
    if b:
        _, col, _ = _ids((R, C))
        same = pltpu.roll(x, shift=b, axis=1)
        prev = pltpu.roll(pltpu.roll(x, shift=1, axis=0), shift=b, axis=1)
        y = jnp.where(col >= b, same, prev)
    if a:
        y = pltpu.roll(y, shift=a, axis=0)
    _, _, flat = _ids((R, C))
    return jnp.where(flat >= s, y, fill)


def _row_scan(t, combine, fill):
    """Inclusive scan down the rows of a (R, k) array."""
    R = t.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    k = 1
    while k < R:
        sh = jnp.where(row >= k, pltpu.roll(t, shift=k, axis=0), fill)
        t = combine(t, sh)
        k *= 2
    return t


def _prefix_flat(x, combine, fill):
    """Inclusive prefix scan over the flattened row-major (R, 128) array."""
    R, C = x.shape
    _, col, _ = _ids((R, C))
    k = 1
    while k < C:
        sh = jnp.where(col >= k, pltpu.roll(x, shift=k, axis=1), fill)
        x = combine(x, sh)
        k *= 2
    totals = _row_scan(x[:, C - 1 : C], combine, fill)  # inclusive row totals
    row1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    offs = jnp.where(row1 >= 1, pltpu.roll(totals, shift=1, axis=0), fill)
    return combine(x, offs)


def _prefix_sum_flat(x):
    return _prefix_flat(x, jnp.add, jnp.float32(0))


def _prefix_max_flat(x):
    return _prefix_flat(x, jnp.maximum, jnp.int32(-1))


def _prefix_last_flat(key, val):
    """Prefix scan carrying the value at the largest key so far (keys are
    block indices or -1) — the gatherless form of ``val[cummax(key)]``."""
    R, C = key.shape
    _, col, _ = _ids((R, C))

    def step(k, v, ksh, vsh):
        take = ksh > k
        return jnp.where(take, ksh, k), jnp.where(take, vsh, v)

    s = 1
    while s < C:
        inb = col >= s
        ksh = jnp.where(inb, pltpu.roll(key, shift=s, axis=1), -1)
        vsh = jnp.where(inb, pltpu.roll(val, shift=s, axis=1), 0.0)
        key, val = step(key, val, ksh, vsh)
        s *= 2

    kt = key[:, C - 1 : C]
    vt = val[:, C - 1 : C]
    row1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    s = 1
    while s < R:
        inb = row1 >= s
        ksh = jnp.where(inb, pltpu.roll(kt, shift=s, axis=0), -1)
        vsh = jnp.where(inb, pltpu.roll(vt, shift=s, axis=0), 0.0)
        kt, vt = step(kt, vt, ksh, vsh)
        s *= 2
    k_off = jnp.where(row1 >= 1, pltpu.roll(kt, shift=1, axis=0), -1)
    v_off = jnp.where(row1 >= 1, pltpu.roll(vt, shift=1, axis=0), 0.0)
    return step(key, val, k_off, v_off)


def _kernel(
    delta_ref,
    carry_i_ref,  # VMEM (8, LANES) i32, lane-replicated rows: [0]=i0 (absolute
    #               index of first main block), [1]=freeze_until_in
    carry_f_ref,  # VMEM (8, LANES) f32, lane-replicated rows: [0]=fixed_thr,
    #               [1]=thr_in (threshold carried into the chunk)
    thr_ref,
    sincl_ref,
    csm_ref,
    *,
    n: int,
    halo: int,
    window: int,
    freeze_before: int,
    freeze_after: int,
    fixed_blocks: int,
    k_std: float,
    max_rounds: int,
):
    """One chunk: positions [0, halo) are history-only (their crossings are
    already folded into the carry), [halo, halo+n) are solved.  For a
    whole-series call: halo=0, i0=0, freeze_in=-1, thr_in=fixed_thr."""
    R, C = delta_ref.shape
    _, _, idx = _ids((R, C))
    # (1, C) row slices, every lane holding the same value — they only feed
    # elementwise ops, so broadcasting reproduces the former SMEM scalars
    # bit-for-bit.  VMEM instead of SMEM so `jax.vmap` of the solver lowers:
    # the batching rule turns operands into (batch, ...) blocks, and Mosaic
    # accepts (Squeezed(), 8, 128) VMEM blocks but not (Squeezed(), 2) SMEM.
    i0 = carry_i_ref[0:1, :]
    freeze_in = carry_i_ref[1:2, :]
    fixed_thr = carry_f_ref[0:1, :]
    thr_in = carry_f_ref[1:2, :]
    total = halo + n
    in_buf = idx < total  # halo + main (stats); excludes padding
    valid = (idx >= halo) & in_buf  # main region (solved)
    iabs = idx - halo + i0  # absolute block index of main positions
    d = jnp.where(in_buf, delta_ref[:], 0.0)

    # rolling stats over delta[max(0, i-W) : i) — current block excluded.
    # The halo IS the window history, so local prefix differences equal the
    # absolute-series window whenever halo >= min(i_abs, W).
    cs = _prefix_sum_flat(d) - d  # exclusive prefix sums
    cs2 = _prefix_sum_flat(d * d) - d * d
    # callers guarantee halo == 0 (first chunk, i0 == 0) or halo == window,
    # so the static-W shifted prefix covers exactly the absolute window and
    # the element count is min(i_abs, W)
    cnt = jnp.minimum(iabs, window).astype(jnp.float32)
    safe = jnp.maximum(cnt, 1.0)
    m = (cs - _flat_shift(cs, window, jnp.float32(0))) / safe
    m2 = (cs2 - _flat_shift(cs2, window, jnp.float32(0))) / safe
    std = jnp.sqrt(jnp.maximum(m2 - m * m, 0.0))
    # cnt==0 only at absolute block 0: the sequential scan computes 0+k*0
    # = 0 there (empty-window stats), reachable when fixed_blocks == 0 —
    # keep bit-equality with the XLA solvers (models/adaptive.py)
    windowed = jnp.where(cnt > 0, m + k_std * std, 0.0)

    new_freeze = jnp.maximum(iabs + freeze_after, jnp.maximum(0, iabs - freeze_before))
    in_fixed = iabs < fixed_blocks

    # masks are carried as i32 — Mosaic cannot legalize i1 vectors in the
    # while-loop carry (scf.yield on vector<8x128xi1>)
    def thresholds_from(above_i32):
        f = jnp.where((above_i32 > 0) & valid, new_freeze, -1)
        # seed with the carried freeze horizon from previous chunks
        freeze_prev = jnp.maximum(
            _flat_shift(_prefix_max_flat(f), 1, jnp.int32(-1)), freeze_in
        )
        upd = (iabs > freeze_prev) & jnp.logical_not(in_fixed) & valid
        key = jnp.where(upd, idx, -1)
        val = jnp.where(upd, windowed, fixed_thr)
        lk, lv = _prefix_last_flat(key, val)
        # nothing updatable yet in this chunk → the carried-in threshold
        return jnp.where(in_fixed, fixed_thr, jnp.where(lk >= 0, lv, thr_in))

    zeros_i32 = jnp.zeros_like(idx)
    above0 = (d > thresholds_from(zeros_i32)).astype(jnp.int32)

    def cond(state):
        above, prev, rounds = state
        return jnp.any(above != prev) & (rounds < max_rounds)

    def body(state):
        above, _, rounds = state
        thr = thresholds_from(above)
        return (d > thr).astype(jnp.int32), above, rounds + 1

    above, _, _ = jax.lax.while_loop(cond, body, (above0, zeros_i32, jnp.int32(1)))
    thr = thresholds_from(above)
    thr_ref[:] = thr

    # Run metadata for gather-only event extraction (events_from_run_sums):
    # runs-started prefix count and the masked-series prefix sum.  Halo and
    # padding are masked out — padded delta (=0) can sit above a negative
    # threshold and would otherwise fabricate phantom runs.
    above_f = (d > thr) & valid
    a_i32 = above_f.astype(jnp.int32)
    is_start = a_i32 * (1 - _flat_shift(a_i32, 1, jnp.int32(0)))
    sincl_ref[:] = _prefix_flat(is_start, jnp.add, jnp.int32(0))
    csm_ref[:] = _prefix_sum_flat(jnp.where(above_f, d, 0.0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "halo", "k_std", "window", "freeze_before", "freeze_after",
        "fixed_blocks", "max_rounds", "interpret",
    ),
)
def _run(delta_haloed, i0, freeze_in, fixed_thr, thr_in, halo, k_std, window,
         freeze_before, freeze_after, fixed_blocks, max_rounds, interpret):
    total = delta_haloed.shape[0]
    n = total - halo
    rows = max(_round_up(pl.cdiv(total, LANES), 8), 8)
    pad = rows * LANES - total
    d2 = jnp.pad(delta_haloed.astype(jnp.float32), (0, pad)).reshape(rows, LANES)
    # lane-replicated (8, LANES) carry rows — see _kernel's carry docstring
    carry_i = (
        jnp.zeros((8, LANES), jnp.int32)
        .at[0, :].set(jnp.asarray(i0, jnp.int32))
        .at[1, :].set(jnp.asarray(freeze_in, jnp.int32))
    )
    carry_f = (
        jnp.zeros((8, LANES), jnp.float32)
        .at[0, :].set(jnp.asarray(fixed_thr, jnp.float32))
        .at[1, :].set(jnp.asarray(thr_in, jnp.float32))
    )
    kernel = functools.partial(
        _kernel,
        n=n,
        halo=halo,
        window=window,
        freeze_before=freeze_before,
        freeze_after=freeze_after,
        fixed_blocks=fixed_blocks,
        k_std=k_std,
        max_rounds=max_rounds,
    )
    thr2, sincl2, csm2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(d2, carry_i, carry_f)
    thr = thr2.reshape(-1)[halo:total]
    above = delta_haloed[halo:].astype(jnp.float32) > thr
    # run counts/sums are zero over the halo by construction, so the main
    # slice is directly consumable by events_from_run_sums
    return thr, above, sincl2.reshape(-1)[halo:total], csm2.reshape(-1)[halo:total]


def adaptive_thresholds_fused(
    delta: jnp.ndarray,
    threshold_std_factor: float,
    window_blocks: int,
    freeze_blocks_before: int,
    freeze_blocks_after: int,
    fixed_threshold_blocks: int,
    max_rounds: int | None = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for
    :func:`meteor_scatter_tpu.models.adaptive.adaptive_thresholds_parallel`
    (same (thresholds, above) contract), single fused kernel.

    Raises ValueError past :data:`MAX_FUSED_BLOCKS` — longer series go
    through the exact chunked driver in ``models.adaptive``.
    """
    thr, above, _, _ = adaptive_solver_fused(
        delta,
        threshold_std_factor,
        window_blocks,
        freeze_blocks_before,
        freeze_blocks_after,
        fixed_threshold_blocks,
        max_rounds,
        interpret,
    )
    return thr, above


def adaptive_solver_fused(
    delta: jnp.ndarray,
    threshold_std_factor: float,
    window_blocks: int,
    freeze_blocks_before: int,
    freeze_blocks_after: int,
    fixed_threshold_blocks: int,
    max_rounds: int | None = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full fused solver: (thresholds, above, runs_started_prefix,
    masked_series_prefix_sum).  The last two feed
    :func:`meteor_scatter_tpu.models.events.events_from_run_sums` so event
    extraction needs no further full-series passes.
    """
    n = delta.shape[0]
    if n > MAX_FUSED_BLOCKS:
        raise ValueError(f"series too long for the fused kernel ({n} blocks)")
    if max_rounds is None:
        max_rounds = n
    fixed_thr = jnp.mean(delta) + threshold_std_factor * jnp.std(delta)
    return _run(
        delta,
        0,
        -1,
        fixed_thr,
        fixed_thr,
        0,
        float(threshold_std_factor),
        int(window_blocks),
        int(freeze_blocks_before),
        int(freeze_blocks_after),
        int(fixed_threshold_blocks),
        int(max_rounds),
        interpret,
    )


def adaptive_solver_fused_chunk(
    delta_haloed: jnp.ndarray,
    i0,
    freeze_until_in,
    fixed_thr,
    thr_in,
    halo: int,
    threshold_std_factor: float,
    window_blocks: int,
    freeze_blocks_before: int,
    freeze_blocks_after: int,
    fixed_threshold_blocks: int,
    max_rounds: int | None = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One chunk of an exact chunked run over an arbitrarily long series.

    ``delta_haloed`` = ``window_blocks`` history blocks (``halo`` of them;
    0 for the first chunk) followed by the chunk's blocks; ``i0`` is the
    absolute index of the first solved block; ``freeze_until_in`` /
    ``thr_in`` carry the freeze horizon and the standing threshold from
    previous chunks; ``fixed_thr`` is the whole-series fixed threshold
    (the reference computes it over the full file, main.py:399-400).
    Returns (thr, above, s_incl, csm) for the solved region only — run
    indices are chunk-local, so seam-spanning runs merge via
    ``models.events.merge_adjacent`` with ``right_offset=i0``.
    """
    n = delta_haloed.shape[0]
    if n > MAX_FUSED_BLOCKS:
        raise ValueError(f"chunk too long for the fused kernel ({n} blocks)")
    if max_rounds is None:
        max_rounds = n
    return _run(
        delta_haloed,
        i0,
        freeze_until_in,
        fixed_thr,
        thr_in,
        int(halo),
        float(threshold_std_factor),
        int(window_blocks),
        int(freeze_blocks_before),
        int(freeze_blocks_after),
        int(fixed_threshold_blocks),
        int(max_rounds),
        interpret,
    )
