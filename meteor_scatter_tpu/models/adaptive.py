"""Adaptive-threshold detector with post-detection freeze.

TPU-native re-design of `dsp/src/main.py:450-522`
(``get_detections_adaptive``).  The reference's recurrence per block i:

* first ``fixed_init`` seconds: threshold = global mean + k·global std
  (population std over the *whole* series — it is a two-pass algorithm);
* else if i > freeze_until: threshold = mean + k·std over the trailing
  window ``delta[max(0, i-W) : i]`` (current block excluded);
* else: threshold keeps its previous value (frozen);
* any above-threshold block sets
  ``freeze_until = max(i + freeze_after, max(0, i - freeze_before))``
  (`main.py:491-493`).

The recurrence is inherently sequential, so it runs as one ``lax.scan``
whose carry holds a ring buffer of the last W delta values plus running
window sums — O(1) state per step, O(W) work for the masked mean/std (the
re-reduction over the ring keeps f32 numerics exact instead of drifting
running sums).  Event extraction afterwards is the same vectorized
run-splitting as the fixed detector: the reference merges only directly
consecutive above-threshold blocks (`main.py:486-489`), i.e. maximal runs,
with stop = last index + 1 (`main.py:498-499`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from meteor_scatter_tpu.models.events import Events, events_from_mask


def adaptive_thresholds(
    delta: jnp.ndarray,
    threshold_std_factor: float,
    window_blocks: int,
    freeze_blocks_before: int,
    freeze_blocks_after: int,
    fixed_threshold_blocks: int,
    init_carry=None,
    global_stats: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, tuple]:
    """Scan the freeze/threshold recurrence.

    Returns ``(thresholds, above, carry)``.  ``init_carry`` / the returned
    carry allow chunked execution over long streams (and warm-started time
    shards): feed the carry of chunk c into chunk c+1 together with the
    absolute block offset it contains.

    ``global_stats=(mean, std)`` are the whole-series statistics used for
    the fixed initial threshold; pass them explicitly when processing in
    chunks (the reference computes them over the full file).
    """
    dtype = delta.dtype
    w = window_blocks

    if global_stats is None:
        g_mean = jnp.mean(delta)
        g_std = jnp.std(delta)
    else:
        g_mean, g_std = global_stats
    fixed_threshold = g_mean + threshold_std_factor * g_std

    if init_carry is None:
        init_carry = (
            jnp.zeros(w, dtype),  # ring of trailing deltas
            jnp.asarray(0, jnp.int32),  # absolute block index i
            jnp.asarray(-1, jnp.int32),  # freeze_until
            fixed_threshold.astype(dtype),  # previous threshold
        )

    slot_ids = jnp.arange(w, dtype=jnp.int32)

    def step(carry, d):
        ring, i, freeze_until, prev_thr = carry

        cnt = jnp.minimum(i, w)
        valid = slot_ids < cnt  # ring fills slots 0..i-1 before wrapping
        cnt_f = jnp.maximum(cnt, 1).astype(dtype)
        m = jnp.sum(jnp.where(valid, ring, 0)) / cnt_f
        m2 = jnp.sum(jnp.where(valid, ring * ring, 0)) / cnt_f
        std = jnp.sqrt(jnp.maximum(m2 - m * m, 0))
        windowed = m + threshold_std_factor * std

        in_fixed = i < fixed_threshold_blocks
        can_update = jnp.logical_and(~in_fixed, i > freeze_until)
        thr = jnp.where(
            in_fixed, fixed_threshold, jnp.where(can_update, windowed, prev_thr)
        ).astype(dtype)

        above = d > thr
        new_freeze = jnp.maximum(
            i + freeze_blocks_after, jnp.maximum(0, i - freeze_blocks_before)
        )
        freeze_until = jnp.where(above, new_freeze, freeze_until)

        ring = ring.at[jnp.mod(i, w)].set(d)
        return (ring, i + 1, freeze_until, thr), (thr, above)

    carry, (thresholds, above) = jax.lax.scan(step, init_carry, delta)
    return thresholds, above, carry


def detect_adaptive(
    delta: jnp.ndarray,
    threshold_std_factor: float,
    block_duration_sec: float,
    threshold_estimation_window_sec: float = 120.0,
    threshold_freeze_before_detection_sec: float = 3.0,
    threshold_freeze_after_detection_sec: float = 20.0,
    threshold_fixed_init_duration_sec: float = 10.0,
    cap: int = 4096,
) -> Tuple[Events, jnp.ndarray]:
    """Full-series adaptive detection: (events, per-block thresholds).

    Block→seconds conversion (`main.py:503-505`): t_start = start·bd,
    t_stop = (last+1)·bd, dB mean over [start, last+1).
    """
    bd = block_duration_sec
    ev_thr = adaptive_thresholds(
        delta,
        threshold_std_factor,
        window_blocks=int(threshold_estimation_window_sec / bd),
        freeze_blocks_before=int(threshold_freeze_before_detection_sec / bd),
        freeze_blocks_after=int(threshold_freeze_after_detection_sec / bd),
        fixed_threshold_blocks=int(threshold_fixed_init_duration_sec / bd),
    )
    thresholds, above, _ = ev_thr
    events = events_from_mask(above, delta, cap)
    return events, thresholds
