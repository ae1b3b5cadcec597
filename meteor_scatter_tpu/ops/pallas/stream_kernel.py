"""Fused streaming-state-machine Pallas kernel.

One kernel runs the reference's sequential 3-state live detector
(`dsp/src/live/backend/processor.py:444-510`) over a whole block series,
with every per-block op on a (1, 128) vector register row — channels on
lanes — and the carry held in registers across a `fori_loop`.

Why: measured on the target chip (2026-08-21, 64 stations × 3000 blocks),
the XLA `lax.scan` formulation costs ~22 µs per sequential step — each of
its ~45 elementwise ops on (64,) vectors pays a fixed launch/HBM-latency
toll inside the loop, and unrolling doesn't amortize it (68 ms at every
unroll factor 16–128).  The episode-jump `while_loop` solvers fare worse
at batch (~0.4–7 ms per lockstep iteration of pure loop structure).  In
Mosaic the same 45 ops are ~45 VPU instructions on registers: the whole
3000-step machine runs in well under a millisecond, and the series
streams HBM→VMEM chunk by chunk through a sequential grid.

Layout: series arrays are (n, C) with channels padded to the 128-lane
tile; the grid walks time chunks of :data:`CHUNK` rows; the 16-field
machine state lives in two (8, 128) VMEM scratch rows that persist across
the sequential grid steps (grid dimension is "arbitrary" = executed in
order on the single TensorCore).  Padded lanes compute garbage that never
crosses lanes (the body has no cross-lane ops) and is sliced off by the
caller.

Exactness: the step body mirrors
:func:`meteor_scatter_tpu.models.streaming.stream_scan`'s scan body
op-for-op (same IEEE f32 elementwise ops, same order, same
`base_thr` array computed by the identical XLA prologue), so thresholds,
transitions, and event statistics are bit-exact vs the scan — pinned in
``tests/test_streaming_fused.py`` (interpret mode) and by the on-chip
event-equality gates in `tools/stations_bench.py` / `bench.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHUNK = 512  # time rows per grid step; 12 live (CHUNK,128) f32 arrays = 3 MB

INIT = 0
DETECT = 1
TRACK = 2

# state-field rows inside the (8, 128) carry scratches
_F_LOCKED, _F_TSTART, _F_TRS, _F_TRSS, _F_TRMN, _F_TRMX, _F_ISUM, _F_PINIT = range(8)
_I_STATE, _I_LUNTIL, _I_TSBLK, _I_TRC, _I_ICNT, _I_I0 = range(6)


def _kernel(
    on_ref, pm_ref, bt_ref,            # (CHUNK, 128) f32 per grid step
    cf0_ref, ci0_ref,                  # (8, 128) f32 / i32 initial state
    thr_ref, emit_ref,                 # (CHUNK, 128) f32 / i32 outputs
    ts_ref, tp_ref, du_ref, mn_ref, mx_ref, me_ref, sd_ref,  # (CHUNK, 128) f32
    cf_out_ref, ci_out_ref,            # (8, 128) final state outputs
    cf_ref, ci_ref,                    # (8, 128) scratch carrying state
    *,
    n_total: int,
    block_sec: float,
    init_wait_sec: float,
    min_mean_db: float,
    min_dur_b: int,
    lock_tail: int,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        cf_ref[:] = cf0_ref[:]
        ci_ref[:] = ci0_ref[:]

    inf = jnp.float32(jnp.inf)
    bs = jnp.float32(block_sec)

    def row_f(ref, r):
        return ref[r : r + 1, :]

    carry0 = (
        row_f(ci_ref, _I_STATE), row_f(cf_ref, _F_LOCKED),
        row_f(ci_ref, _I_LUNTIL), row_f(cf_ref, _F_TSTART),
        row_f(ci_ref, _I_TSBLK), row_f(ci_ref, _I_TRC),
        row_f(cf_ref, _F_TRS), row_f(cf_ref, _F_TRSS),
        row_f(cf_ref, _F_TRMN), row_f(cf_ref, _F_TRMX),
        row_f(cf_ref, _F_ISUM), row_f(ci_ref, _I_ICNT),
        row_f(cf_ref, _F_PINIT),
    )
    i0v = row_f(ci_ref, _I_I0)

    # Dynamic per-row VMEM indexing over a (CHUNK, 128) buffer is the one
    # thing Mosaic cannot do cheaply (it lowers to a select chain over all
    # CHUNK/8 tiles — measured ~22 µs/step, as slow as the XLA scan this
    # kernel replaces).  So the loop walks aligned (8, 128) tiles: each
    # input tile is loaded once, the 8 in-tile rows are *static* slices of
    # register values, and each output tile is assembled in registers and
    # stored once.  Steps past ``n_total`` keep the carry via a scalar
    # ``active`` mask (their output rows are garbage the caller slices off).
    def step(on, pm, bt, i, active, c):
        (st, locked, luntil, tstart, tsblk, trc, trs, trss, trmn, trmx,
         isum, icnt, pinit) = c
        t_start = i.astype(jnp.float32) * bs

        # --- mirror of stream_scan's scan body (bit-exact contract) ---
        thr = jnp.where(
            st == TRACK,
            locked,
            jnp.where((st == DETECT) & (i <= luntil), locked, bt),
        )

        new_isum = isum + pm
        new_icnt = icnt + 1
        init_done = t_start >= init_wait_sec
        pinit_new = new_isum / jnp.maximum(new_icnt, 1).astype(jnp.float32)

        enter_track = on > thr
        n_trc = trc + 1
        n_trs = trs + on
        n_trss = trss + on * on
        n_trmn = jnp.minimum(trmn, on)
        n_trmx = jnp.maximum(trmx, on)
        leave_track = on < thr

        dur = t_start - tstart
        h_cnt = jnp.maximum(n_trc, 1).astype(jnp.float32)
        h_mean = n_trs / h_cnt
        h_std = jnp.sqrt(jnp.maximum(n_trss / h_cnt - h_mean * h_mean, 0))
        accept = (h_mean >= min_mean_db) & (i - tsblk >= min_dur_b)

        is_init = st == INIT
        is_detect = st == DETECT
        is_track = st == TRACK
        emit = is_track & leave_track & accept

        next_state = jnp.where(
            is_init,
            jnp.where(init_done, DETECT, INIT),
            jnp.where(
                is_detect,
                jnp.where(enter_track, TRACK, DETECT),
                jnp.where(leave_track, DETECT, TRACK),
            ),
        ).astype(jnp.int32)
        start_track = is_detect & enter_track

        out = (thr, emit.astype(jnp.int32), tstart, t_start, dur,
               n_trmn, n_trmx, h_mean, h_std)
        new_c = (
            next_state,
            jnp.where(start_track, thr, locked),
            jnp.where(is_track & leave_track, i + (lock_tail - 1), luntil).astype(jnp.int32),
            jnp.where(start_track, t_start, tstart),
            jnp.where(start_track, i, tsblk).astype(jnp.int32),
            jnp.where(start_track, 0, jnp.where(is_track, n_trc, trc)),
            jnp.where(start_track, 0.0, jnp.where(is_track, n_trs, trs)),
            jnp.where(start_track, 0.0, jnp.where(is_track, n_trss, trss)),
            jnp.where(start_track, inf, jnp.where(is_track, n_trmn, trmn)),
            jnp.where(start_track, -inf, jnp.where(is_track, n_trmx, trmx)),
            jnp.where(is_init, new_isum, isum),
            jnp.where(is_init, new_icnt, icnt),
            jnp.where(is_init & init_done, pinit_new, pinit),
        )
        return tuple(jnp.where(active, n, o) for n, o in zip(new_c, c)), out

    out_refs = (thr_ref, emit_ref, ts_ref, tp_ref, du_ref, mn_ref, mx_ref,
                me_ref, sd_ref)

    def tile_body(tb, c):
        r0 = pl.multiple_of(tb * 8, 8)
        on_t = on_ref[pl.ds(r0, 8), :]
        pm_t = pm_ref[pl.ds(r0, 8), :]
        bt_t = bt_ref[pl.ds(r0, 8), :]
        rows = tuple([] for _ in out_refs)
        for r in range(8):
            s = tb * 8 + r
            i = i0v + t * CHUNK + s
            active = (t * CHUNK + s) < n_total
            c, out = step(
                on_t[r : r + 1, :], pm_t[r : r + 1, :], bt_t[r : r + 1, :],
                i, active, c,
            )
            for acc, v in zip(rows, out):
                acc.append(v)
        for ref, acc in zip(out_refs, rows):
            ref[pl.ds(r0, 8), :] = jnp.concatenate(acc, axis=0)
        return c

    (st, locked, luntil, tstart, tsblk, trc, trs, trss, trmn, trmx,
     isum, icnt, pinit) = jax.lax.fori_loop(0, CHUNK // 8, tile_body, carry0)

    cf_ref[_F_LOCKED : _F_LOCKED + 1, :] = locked
    cf_ref[_F_TSTART : _F_TSTART + 1, :] = tstart
    cf_ref[_F_TRS : _F_TRS + 1, :] = trs
    cf_ref[_F_TRSS : _F_TRSS + 1, :] = trss
    cf_ref[_F_TRMN : _F_TRMN + 1, :] = trmn
    cf_ref[_F_TRMX : _F_TRMX + 1, :] = trmx
    cf_ref[_F_ISUM : _F_ISUM + 1, :] = isum
    cf_ref[_F_PINIT : _F_PINIT + 1, :] = pinit
    ci_ref[_I_STATE : _I_STATE + 1, :] = st
    ci_ref[_I_LUNTIL : _I_LUNTIL + 1, :] = luntil
    ci_ref[_I_TSBLK : _I_TSBLK + 1, :] = tsblk
    ci_ref[_I_TRC : _I_TRC + 1, :] = trc
    ci_ref[_I_ICNT : _I_ICNT + 1, :] = icnt

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        cf_out_ref[:] = cf_ref[:]
        ci_out_ref[:] = ci_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_sec", "init_wait_sec", "min_mean_db", "min_dur_b",
        "lock_tail", "interpret",
    ),
)
def stream_machine_fused(
    on2: jnp.ndarray,   # (n, C<=128) f32
    pm2: jnp.ndarray,   # (n, C) f32
    bt2: jnp.ndarray,   # (n, C) f32 — base thresholds from _ring_base_thresholds
    carry_f: jnp.ndarray,  # (8, C) f32 init state rows (see _F_* order)
    carry_i: jnp.ndarray,  # (6, C) i32 init state rows (see _I_* order)
    *,
    block_sec: float,
    init_wait_sec: float,
    min_mean_db: float,
    min_dur_b: int,
    lock_tail: int,
    interpret: bool = False,
):
    """Run the fused machine; returns (ys..., carry_f', carry_i') with ys =
    (thr, emit, tstart, t_stop, dur, trmn, trmx, h_mean, h_std), each
    (n, C) — the exact per-step outputs of ``stream_scan``'s scan."""
    n, C = on2.shape
    if C > LANES:
        raise ValueError(f"at most {LANES} channels per kernel call, got {C}")
    grid = pl.cdiv(n, CHUNK)
    n_pad = grid * CHUNK

    def pad(x):
        return jnp.pad(x, ((0, n_pad - n), (0, LANES - C)))

    on_p, pm_p, bt_p = pad(on2), pad(pm2), pad(bt2)
    cf0 = jnp.pad(carry_f, ((0, 0), (0, LANES - C)))
    ci0 = jnp.pad(carry_i, ((0, 2), (0, LANES - C)))

    series = pl.BlockSpec((CHUNK, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((8, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel,
        n_total=n,
        block_sec=float(block_sec),
        init_wait_sec=float(init_wait_sec),
        min_mean_db=float(min_mean_db),
        min_dur_b=int(min_dur_b),
        lock_tail=int(lock_tail),
    )
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[series, series, series, whole, whole],
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, LANES), f32),        # thr
            jax.ShapeDtypeStruct((n_pad, LANES), jnp.int32),  # emit
            *[jax.ShapeDtypeStruct((n_pad, LANES), f32) for _ in range(7)],
            jax.ShapeDtypeStruct((8, LANES), f32),            # carry_f out
            jax.ShapeDtypeStruct((8, LANES), jnp.int32),      # carry_i out
        ),
        out_specs=(
            series, series, series, series, series, series, series,
            series, series, whole, whole,
        ),
        scratch_shapes=[
            pltpu.VMEM((8, LANES), f32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(on_p, pm_p, bt_p, cf0, ci0)

    ys = tuple(o[:n, :C] for o in outs[:9])
    cf1 = outs[9][:, :C]
    ci1 = outs[10][:6, :C]
    return ys, cf1, ci1
