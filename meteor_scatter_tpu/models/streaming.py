"""Streaming 3-state detector (Initialization → Detection → Tracking).

TPU-native re-design of `dsp/src/live/backend/processor.py:176-510`.  The
reference walks blocks in a Python loop mutating dataclass states
(`aggregates.py:4-24`); here the whole decision process is ONE flat carry
struct advanced by ``lax.scan``, and the per-block spectral work (Welch PSD
+ three band sums) is batched *outside* the scan so it runs as a single
fused FFT+reduction over the whole chunk.

Per-block semantics preserved exactly (verified in tests against a numpy
oracle of the reference loop):

* over-noise level: ms_db − mean(noise1_db, noise2_db)   (`processor.py:393`)
* rolling mean/std over the last ``avg_win`` values *excluding* the current
  block (`processor.py:394-404`; the history slice is taken before append)
* threshold = mean + k·std, overridden by the locked threshold while
  Tracking, or while Detection with ``use_locked_until > block_end_sec``
  (`processor.py:406-413`)
* Initialization: accumulate mean PSD dB until
  ``block_start_sec >= init_detection_wait_sec`` (`processor.py:444-457`)
* Detection→Tracking on ``over_noise > threshold`` with the threshold
  locked at that value (`processor.py:459-471`)
* Tracking appends the current block to the event history *before* the
  below-threshold check, so the terminating block is included in the event
  statistics (`processor.py:475-488`)
* event accepted iff mean ≥ detection_db_over_noise_mean_min and duration
  ≥ detection_dur_min_sec; duration = block_start − track_start
  (`processor.py:476-493`)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from meteor_scatter_tpu.config import DetectionConfig
from meteor_scatter_tpu.ops.welch import band_sum_db, welch_freqs, welch_psd

# State machine encoding
INIT, DETECT, TRACK = 0, 1, 2


class StreamConfig(NamedTuple):
    """Static (trace-time) parameters derived from DetectionConfig."""

    block_sec: float
    avg_win: int  # blocks
    init_wait_sec: float
    after_wait_sec: float
    k_std: float
    min_mean_db: float
    min_dur_sec: float
    cap: int

    @staticmethod
    def from_config(cfg: DetectionConfig) -> "StreamConfig":
        return StreamConfig(
            block_sec=cfg.proc_block_sec,
            avg_win=int(cfg.avg_win_sec / cfg.proc_block_sec),
            init_wait_sec=cfg.init_detection_wait_sec,
            after_wait_sec=cfg.after_tracking_wait_sec,
            k_std=cfg.threshold_std_factor,
            min_mean_db=cfg.detection_db_over_noise_mean_min,
            min_dur_sec=cfg.detection_dur_min_sec,
            cap=cfg.max_events,
        )


class StreamEvents(NamedTuple):
    """DetectedMeteor fields (`aggregates.py:66-74`) as fixed-cap arrays."""

    time_start: jnp.ndarray
    time_stop: jnp.ndarray
    duration: jnp.ndarray
    db_min: jnp.ndarray
    db_max: jnp.ndarray
    db_mean: jnp.ndarray
    db_std: jnp.ndarray
    count: jnp.ndarray
    overflow: jnp.ndarray


class StreamState(NamedTuple):
    """Scan carry — the flattened union of the reference's three state
    dataclasses plus the rolling history."""

    state: jnp.ndarray  # int32: INIT/DETECT/TRACK
    block_idx: jnp.ndarray  # int32 absolute block counter
    ring: jnp.ndarray  # f32 [avg_win] trailing over-noise values
    locked_threshold: jnp.ndarray
    use_locked_until: jnp.ndarray  # seconds
    track_start_sec: jnp.ndarray
    # running stats of the tracking history
    tr_count: jnp.ndarray
    tr_sum: jnp.ndarray
    tr_sumsq: jnp.ndarray
    tr_min: jnp.ndarray
    tr_max: jnp.ndarray
    # initialization-phase PSD accumulation (auto-gain, processor.py:448-454)
    init_sum: jnp.ndarray
    init_count: jnp.ndarray
    psd_db_mean_from_init: jnp.ndarray


def stream_init(cfg: StreamConfig, dtype=jnp.float32) -> StreamState:
    z = jnp.zeros((), dtype)
    return StreamState(
        state=jnp.asarray(INIT, jnp.int32),
        block_idx=jnp.asarray(0, jnp.int32),
        ring=jnp.zeros(cfg.avg_win, dtype),
        locked_threshold=z - 1.0,
        use_locked_until=z - 1.0,
        track_start_sec=z,
        tr_count=jnp.asarray(0, jnp.int32),
        tr_sum=z,
        tr_sumsq=z,
        tr_min=z + jnp.inf,
        tr_max=z - jnp.inf,
        init_sum=z,
        init_count=jnp.asarray(0, jnp.int32),
        psd_db_mean_from_init=z,
    )


def _empty_events(cap: int, dtype) -> StreamEvents:
    zf = jnp.zeros(cap, dtype)
    return StreamEvents(
        time_start=zf,
        time_stop=zf,
        duration=zf,
        db_min=zf,
        db_max=zf,
        db_mean=zf,
        db_std=zf,
        count=jnp.asarray(0, jnp.int32),
        overflow=jnp.asarray(False),
    )


def stream_step(cfg: StreamConfig, state: StreamState, events: StreamEvents, over_noise, psd_db_mean):
    """Advance one block.  Returns (state, events, effective_threshold)."""
    dtype = over_noise.dtype
    i = state.block_idx
    bs = jnp.asarray(cfg.block_sec, dtype)
    t_start = i.astype(dtype) * bs
    t_end = (i + 1).astype(dtype) * bs

    # rolling stats over trailing window (current block excluded)
    w = cfg.avg_win
    cnt = jnp.minimum(i, w)
    valid = jnp.arange(w) < cnt
    cnt_f = jnp.maximum(cnt, 1).astype(dtype)
    m = jnp.sum(jnp.where(valid, state.ring, 0)) / cnt_f
    m2 = jnp.sum(jnp.where(valid, state.ring * state.ring, 0)) / cnt_f
    std = jnp.sqrt(jnp.maximum(m2 - m * m, 0))
    base_thr = jnp.where(cnt > 0, m + cfg.k_std * std, jnp.nan)

    thr = jnp.where(
        state.state == TRACK,
        state.locked_threshold,
        jnp.where(
            (state.state == DETECT) & (state.use_locked_until > t_end),
            state.locked_threshold,
            base_thr,
        ),
    )

    # ---- INIT ----
    new_init_sum = state.init_sum + psd_db_mean
    new_init_count = state.init_count + 1
    init_done = t_start >= cfg.init_wait_sec
    psd_mean_from_init = new_init_sum / jnp.maximum(new_init_count, 1).astype(dtype)

    # ---- DETECT: enter tracking? ----
    enter_track = over_noise > thr

    # ---- TRACK: update history stats (current block appended first) ----
    tr_count = state.tr_count + 1
    tr_sum = state.tr_sum + over_noise
    tr_sumsq = state.tr_sumsq + over_noise * over_noise
    tr_min = jnp.minimum(state.tr_min, over_noise)
    tr_max = jnp.maximum(state.tr_max, over_noise)
    leave_track = over_noise < thr

    dur = t_start - state.track_start_sec
    h_cnt = jnp.maximum(tr_count, 1).astype(dtype)
    h_mean = tr_sum / h_cnt
    h_var = jnp.maximum(tr_sumsq / h_cnt - h_mean * h_mean, 0)
    h_std = jnp.sqrt(h_var)
    accept = (h_mean >= cfg.min_mean_db) & (dur >= cfg.min_dur_sec)

    is_init = state.state == INIT
    is_detect = state.state == DETECT
    is_track = state.state == TRACK

    emit = is_track & leave_track & accept
    slot = jnp.where(emit & (events.count < cfg.cap), events.count, cfg.cap)
    events = StreamEvents(
        time_start=events.time_start.at[slot].set(state.track_start_sec, mode="drop"),
        time_stop=events.time_stop.at[slot].set(t_start, mode="drop"),
        duration=events.duration.at[slot].set(dur, mode="drop"),
        db_min=events.db_min.at[slot].set(tr_min, mode="drop"),
        db_max=events.db_max.at[slot].set(tr_max, mode="drop"),
        db_mean=events.db_mean.at[slot].set(h_mean, mode="drop"),
        db_std=events.db_std.at[slot].set(h_std, mode="drop"),
        count=events.count + emit.astype(jnp.int32),
        overflow=events.overflow | (emit & (events.count >= cfg.cap)),
    )

    next_state = jnp.where(
        is_init,
        jnp.where(init_done, DETECT, INIT),
        jnp.where(
            is_detect,
            jnp.where(enter_track, TRACK, DETECT),
            jnp.where(leave_track, DETECT, TRACK),
        ),
    ).astype(jnp.int32)

    new_state = StreamState(
        state=next_state,
        block_idx=i + 1,
        ring=state.ring.at[jnp.mod(i, w)].set(over_noise),
        locked_threshold=jnp.where(
            is_detect & enter_track, thr, state.locked_threshold
        ),
        use_locked_until=jnp.where(
            is_track & leave_track, t_start + cfg.after_wait_sec, state.use_locked_until
        ),
        track_start_sec=jnp.where(is_detect & enter_track, t_start, state.track_start_sec),
        tr_count=jnp.where(is_detect & enter_track, 0, jnp.where(is_track, tr_count, state.tr_count)),
        tr_sum=jnp.where(is_detect & enter_track, 0.0, jnp.where(is_track, tr_sum, state.tr_sum)),
        tr_sumsq=jnp.where(is_detect & enter_track, 0.0, jnp.where(is_track, tr_sumsq, state.tr_sumsq)),
        tr_min=jnp.where(is_detect & enter_track, jnp.inf, jnp.where(is_track, tr_min, state.tr_min)),
        tr_max=jnp.where(is_detect & enter_track, -jnp.inf, jnp.where(is_track, tr_max, state.tr_max)),
        init_sum=jnp.where(is_init, new_init_sum, state.init_sum),
        init_count=jnp.where(is_init, new_init_count, state.init_count),
        psd_db_mean_from_init=jnp.where(
            is_init & init_done, psd_mean_from_init, state.psd_db_mean_from_init
        ),
    )
    return new_state, events, thr


def stream_process(
    cfg: DetectionConfig,
    state: StreamState,
    samples: jnp.ndarray,
    fs: float,
) -> Tuple[StreamState, StreamEvents, dict]:
    """Process a chunk of audio (any whole number of blocks).

    Vectorized front half (Welch PSD + band sums for every block at once,
    `processor.py:206,349-393`), then the sequential state machine as one
    scan.  Returns (new_state, events_found_in_chunk, diagnostics) where
    diagnostics carries the per-block series the live UI plots
    (over_noise, threshold, band dBs, psd waterfall).
    """
    scfg = StreamConfig.from_config(cfg)
    block = int(round(cfg.proc_block_sec * fs))
    n_blocks = samples.shape[-1] // block
    x = samples[..., : n_blocks * block].reshape(n_blocks, block)

    psd = welch_psd(x, fs, cfg.n_fft, nperseg=cfg.welch_nperseg)
    psd_db = 10.0 * jnp.log10(psd)
    freqs = welch_freqs(fs, cfg.n_fft)

    ms_db = band_sum_db(psd, freqs, cfg.signal_band)
    n1_db = band_sum_db(psd, freqs, cfg.noise_band_1)
    n2_db = band_sum_db(psd, freqs, cfg.noise_band_2)
    over_noise = ms_db - (n1_db + n2_db) / 2.0
    psd_db_mean = jnp.mean(psd_db, axis=-1)

    events0 = _empty_events(scfg.cap, over_noise.dtype)

    def body(carry, inp):
        st, ev = carry
        on, pm = inp
        st, ev, thr = stream_step(scfg, st, ev, on, pm)
        return (st, ev), thr

    (state, events), thresholds = jax.lax.scan(
        body, (state, events0), (over_noise, psd_db_mean)
    )

    diags = {
        "over_noise": over_noise,
        "threshold": thresholds,
        "ms_db": ms_db,
        "noise1_db": n1_db,
        "noise2_db": n2_db,
        "psd_db": psd_db,
        "freqs": freqs,
    }
    return state, events, diags
