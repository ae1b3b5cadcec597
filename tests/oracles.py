"""Clean-room numpy oracles of the reference detector algorithms, written
from their documented semantics (file:line cited per function) for golden
comparison against the JAX implementations.  Deliberately sequential and
simple — these define correctness, not performance."""

from __future__ import annotations

import numpy as np


def oracle_fixed(delta, k):
    """dsp/src/main.py:396-448 semantics."""
    thr = np.mean(delta) + k * np.std(delta)
    above = delta > thr
    d = np.diff(above.astype(int))
    starts = list(np.where(d == 1)[0] + 1)
    stops = list(np.where(d == -1)[0] + 1)
    if above[0]:
        starts = [0] + starts
    if above[-1]:
        stops = stops + [len(delta) - 1]
    out = []
    for s, e in zip(starts, stops):
        seg = delta[s:e]
        out.append((s, e, float(np.mean(seg)) if len(seg) else np.nan))
    return out, thr


def oracle_adaptive(delta, k, window_blocks, freeze_before, freeze_after, fixed_blocks):
    """dsp/src/main.py:450-522 semantics."""
    n = len(delta)
    g_thr = np.mean(delta) + k * np.std(delta)
    thr = g_thr
    freeze_until = -1
    thresholds = []
    dets = []
    for i in range(n):
        if i < fixed_blocks:
            thr = g_thr
        elif i > freeze_until:
            w = delta[max(0, i - window_blocks) : i]
            thr = np.mean(w) + k * np.std(w) if len(w) else np.nan
        thresholds.append(thr)
        if delta[i] > thr:
            if not dets or i > dets[-1][1] + 1:
                dets.append([i, i])
            else:
                dets[-1][1] = i
            freeze_until = max(i + freeze_after, max(0, i - freeze_before))
    out = []
    for s, e in dets:
        seg = delta[s : e + 1]
        out.append((s, e + 1, float(np.mean(seg))))
    return out, np.array(thresholds)


def oracle_streaming(
    over_noise,
    psd_db_mean,
    block_sec,
    avg_win,
    init_wait_sec,
    after_wait_sec,
    k,
    min_mean_db,
    min_dur_sec,
):
    """dsp/src/live/backend/processor.py:176-510 state machine semantics,
    driven by precomputed per-block over-noise and mean-PSD series.

    Lock-window and minimum-duration comparisons use exact integer block
    arithmetic (matching models/streaming.py): the reference's float
    ``use_locked_until > block_end_sec`` / ``duration >= min_dur`` equal
    these everywhere except exact real-arithmetic ties, where float
    rounding direction is unspecified (FMA-contraction-dependent)."""
    import math

    lock_tail = int(math.ceil(after_wait_sec / block_sec - 1e-9)) - 1
    min_dur_blocks = int(math.ceil(min_dur_sec / block_sec - 1e-9))
    state = "init"
    history = []
    init_hist = []
    locked = -1.0
    locked_until_block = -1
    t0 = 0.0
    t0_block = 0
    track_hist = []
    events = []
    thresholds = []
    for i in range(len(over_noise)):
        t_start = i * block_sec
        on = over_noise[i]

        window = history[-avg_win:]
        m = np.mean(window) if window else np.nan
        s = np.std(window) if window else np.nan
        history.append(on)
        thr = m + k * s
        if state == "track":
            thr = locked
        elif state == "detect" and i <= locked_until_block:
            thr = locked
        thresholds.append(thr)

        if state == "init":
            init_hist.append(psd_db_mean[i])
            if t_start >= init_wait_sec:
                state = "detect"
        elif state == "detect":
            if on > thr:
                locked = thr
                t0 = t_start
                t0_block = i
                track_hist = []
                state = "track"
        elif state == "track":
            track_hist.append(on)
            if on < thr:
                dur = t_start - t0
                h = np.array(track_hist)
                if np.mean(h) >= min_mean_db and i - t0_block >= min_dur_blocks:
                    events.append(
                        dict(
                            time_start=t0,
                            time_stop=t_start,
                            duration=dur,
                            db_min=float(h.min()),
                            db_max=float(h.max()),
                            db_mean=float(h.mean()),
                            db_std=float(h.std()),
                        )
                    )
                locked_until_block = i + (lock_tail - 1)
                state = "detect"
    return events, np.array(thresholds)


def oracle_dbscan(points, eps, min_samples):
    """Clean-room DBSCAN per the published algorithm (Ester, Kriegel,
    Sander, Xu 1996 — the semantics of sklearn's DBSCAN as invoked at
    meteor_detect_class/detector_and_classification.py:20, eps=30,
    min_samples=5, on ORB keypoint (x, y) pixel coordinates):

    * a point is CORE iff >= min_samples points (itself included) lie
      within L2 distance eps;
    * clusters are grown only through core points (density-reachability):
      BFS over core->neighbor edges;
    * non-core points within eps of a core join the first cluster that
      reaches them (scan order); everything else is noise (-1).

    O(n^2), deliberately simple — it defines correctness for the image
    path's count-level contract (VERDICT r4 item 4).  Returns int labels,
    -1 for noise.
    """
    pts = np.asarray(points, np.float64)
    n = len(pts)
    labels = np.full(n, -1, np.int64)
    if n == 0:
        return labels
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    neigh = d2 <= eps * eps
    core = neigh.sum(1) >= min_samples
    cid = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        labels[i] = cid
        frontier = [i]
        while frontier:
            j = frontier.pop()
            if not core[j]:
                continue  # border points join but do not expand
            for k in np.nonzero(neigh[j])[0]:
                if labels[k] == -1:
                    labels[k] = cid
                    frontier.append(k)
        cid += 1
    return labels
