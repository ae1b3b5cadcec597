"""Wide-station-batch solver comparison (BASELINE config 5; VERDICT r2 §2).

Times the streaming state machine's three solvers — the restructured scan
(`stream_scan`), the per-channel episode-jump (`stream_scan_jump`), and the
windowed episode-jump built for vmapped batches (`stream_scan_jump_batch`,
``impl="hop"``) — at N vmapped stations on the current backend, using the
same workload and in-graph chained-state timing as ``bench.py
--stations``.  Cross-checks that every solver reports identical event
boundaries (bit-exact starts/stops/counts per channel; dB statistics to
f32 reduction order) before any timing claim is made.

This is the measured basis for the crossover notes in TODO.md and the
solver choice in `bench.py::stations_pipeline`.  Reference semantics
anchor: `dsp/src/live/backend/processor.py:444-510`.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/stations_bench.py \
        [--stations 64] [--seconds 600] [--impls scan,jump,hop]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--stations", type=int, default=64)
    p.add_argument("--seconds", type=float, default=600.0)
    p.add_argument("--impls", default="scan,jump,hop")
    # chain sized so per-exec device time (~2.5-8 ms) x chain dominates the
    # +-5-10 ms dispatch noise (see BASELINE.md on reading chained timings)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--chain", type=int, default=21)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import bench
    from meteor_scatter_tpu.config import DetectionConfig
    from meteor_scatter_tpu.models.streaming import (
        StreamConfig,
        _headless_projection,
        _sanitize_levels,
        stream_front_headless,
        stream_init_batch,
        stream_scan,
        stream_scan_fused_batch,
        stream_scan_jump,
        stream_scan_jump_batch,
    )
    from meteor_scatter_tpu.ops.welch import block_band_sums_db

    solvers = {
        "scan": stream_scan,
        "jump": stream_scan_jump,
        "hop": stream_scan_jump_batch,
        "fused": None,  # natively batched — called without vmap below
    }

    fs = 4000
    cfg = DetectionConfig(
        signal_freq=1000.0,
        detection_db_over_noise_mean_min=1.0,
        detection_dur_min_sec=0.5,
    )
    scfg = StreamConfig.from_config(cfg)

    # identical workload to bench.stations_pipeline
    rng = np.random.default_rng(7)
    blk0 = int(round(cfg.proc_block_sec * fs))
    # truncate to whole blocks like models/streaming.py::_blocked — an
    # off-grid --seconds must not crash the pre-blocked reshape
    n = int(fs * args.seconds) // blk0 * blk0
    x_np = rng.standard_normal((args.stations, n)).astype(np.float32) * 0.3
    t = np.arange(n) / fs
    for c in range(args.stations):
        s0 = 20.0 + (7.0 * c) % max(args.seconds - 30.0, 1.0)
        m = (t >= s0) & (t < s0 + 1.0)
        x_np[c, m] += 1.5 * np.sin(2 * np.pi * 1000.0 * t[m]).astype(np.float32)
    # pre-blocked upload (..., n_blocks, block): a flat (C, S) capture pays
    # a ~13 ms in-graph relayout per chunk on TPU (models/streaming.py::_blocked)
    blk = int(round(cfg.proc_block_sec * fs))
    x = jnp.asarray(x_np.reshape(args.stations, n // blk, blk))
    print(
        f"# backend={jax.default_backend()} stations={args.stations} "
        f"samples/ch={n:,}",
        file=sys.stderr,
    )

    baseline = None
    for impl in args.impls.split(","):
        solver = solvers[impl]

        if solver is None:
            def batch_solve(st, on, pm):
                return stream_scan_fused_batch(scfg, st, on, pm)
        else:
            def batch_solve(st, on, pm, solver=solver):
                return jax.vmap(lambda s, o, p: solver(scfg, s, o, p))(st, on, pm)

        @jax.jit
        def run(xj, st, batch_solve=batch_solve):
            on, pm, _ = stream_front_headless(cfg, xj, fs)
            st2, ev, _ = batch_solve(st, on, pm)
            return st2, ev

        # chain dependency threads through the tiny projection matrix — the
        # former `xj + eps` re-materialized the whole input every chained
        # iteration (measured 2.2 ms/iter artifact,
        # tools/stations_breakdown.py S5−S4)
        block = int(round(cfg.proc_block_sec * fs))
        n_blocks_ch = n // block
        nperseg = min(cfg.welch_nperseg, block)
        P, slices, nseg = _headless_projection(
            fs, cfg.n_fft, nperseg,
            (cfg.signal_band, cfg.noise_band_1, cfg.noise_band_2),
            block,
        )
        Pj = jnp.asarray(P)

        @jax.jit
        def runk(xj, Pp, st, k, batch_solve=batch_solve):
            def body(_, s):
                eps = jnp.where(
                    jnp.isnan(s.tr_sum[0]), jnp.float32(1.0), jnp.float32(0.0)
                )
                ms, n1, n2 = (
                    _sanitize_levels(v)
                    for v in block_band_sums_db(xj, Pp + eps, slices, nseg)
                )
                on = ms - (n1 + n2) / 2.0
                s2, _, _ = batch_solve(s, on, jnp.zeros_like(on))
                return s2

            return jax.lax.fori_loop(0, k, body, st)

        st0 = stream_init_batch(scfg, args.stations)
        _, ev = run(x, st0)
        cnt = np.asarray(ev.count)
        starts = np.asarray(ev.time_start)
        stops = np.asarray(ev.time_stop)
        if baseline is None:
            baseline = (cnt, starts, stops)
            print(f"# {impl}: {int(cnt.sum())} events total (baseline)",
                  file=sys.stderr)
        else:
            c0, s0_, p0 = baseline
            same = (
                np.array_equal(cnt, c0)
                and np.array_equal(starts, s0_)
                and np.array_equal(stops, p0)
            )
            print(f"# {impl}: events_equal_to_{args.impls.split(',')[0]}={same}",
                  file=sys.stderr)
            if not same:
                print(f"{impl}: EVENT MISMATCH — timing skipped")
                continue

        int(np.asarray(runk(x, Pj, st0, 1).block_idx[0]))  # compile + warm

        def chained(k, runk=runk, st0=st0, Pj=Pj):
            t0 = time.perf_counter()
            sK = runk(x, Pj, st0, k)
            np.asarray(sK.block_idx)
            return time.perf_counter() - t0

        t1 = min(chained(1) for _ in range(args.reps))
        tk = min(chained(args.chain) for _ in range(args.reps))
        dt = (tk - t1) / (args.chain - 1)
        if dt <= 0:
            print("# warning: noise-bound; using tk/k upper bound", file=sys.stderr)
            dt = tk / args.chain
        agg = x_np.size / dt
        print(
            f"{impl}: {dt * 1e3:.2f} ms per {args.seconds:.0f} s x "
            f"{args.stations} ch, {agg / 1e9:.3f} G agg samples/s, "
            f"{agg / (fs * args.stations):,.0f}x realtime"
        )
    # keep bench's workload contract honest: fail loudly if bench drifts
    assert hasattr(bench, "stations_pipeline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
