"""On-chip cost breakdown of the 64-station streaming pipeline (VERDICT r3
stretch item / TODO "shared streaming-pipeline floor").

tools/stations_bench.py (2026-08-21) showed fused 29.7 ms vs scan 30.7 ms
end-to-end at 64 ch × 600 s while the raw fused kernel runs in ~4 ms — so
~25 ms is *shared* work.  This script times the pipeline cumulatively, one
stage at a time, with the same in-graph fori-chained methodology:

  S1  bins front (frame + band matmul + dB)
  S2  + base-threshold prologue (vmapped _ring_base_thresholds)
  S3  + fused stream kernel (stream_machine_fused, no epilogue)
  S4  + compaction epilogue + final-ring extraction (= full
        stream_scan_fused_batch, what bench.py --stations times)
  S5  S4 but threading the chain dependency through ``x + eps`` instead of
      the tiny projection matrix — the methodology bench.py/stations_bench
      used *before* round 4, so S5 − S4 is the retired harness's artifact:
      each chained iteration re-materialized the 614 MB input, pure
      timing-loop cost the pipeline never pays (measured 2.0-2.5 ms; both
      harnesses now thread eps through the projection matrix).

Stage deltas attribute the floor; the printed table is the measured basis
for deciding whether fusing the bins matmul INTO the stream kernel is
worth it (only if S1 dominates) — record the decision in TODO.md.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/stations_breakdown.py \
        [--stations 64] [--seconds 600] [--stages S1,S2,S3,S4,S5]
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
    p.add_argument("--stages", default="S1,S2,S3,S4,S5")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--chain", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.config import DetectionConfig
    from meteor_scatter_tpu.models.streaming import (
        StreamConfig,
        _headless_projection,
        _ring_base_thresholds,
        _sanitize_levels,
        lock_tail_blocks,
        min_duration_blocks,
        stream_init_batch,
        stream_scan_fused_batch,
    )
    from meteor_scatter_tpu.ops.pallas.stream_kernel import stream_machine_fused
    from meteor_scatter_tpu.ops.welch import block_band_sums_db

    fs = 4000
    cfg = DetectionConfig(
        signal_freq=1000.0,
        detection_db_over_noise_mean_min=1.0,
        detection_dur_min_sec=0.5,
    )
    scfg = StreamConfig.from_config(cfg)
    C = args.stations
    block = int(round(cfg.proc_block_sec * fs))
    n = int(fs * args.seconds)
    n_blocks = n // block
    nperseg = min(cfg.welch_nperseg, block)
    P, slices, nseg = _headless_projection(
        fs, cfg.n_fft, nperseg,
        (cfg.signal_band, cfg.noise_band_1, cfg.noise_band_2),
        block,
    )
    Pj = jnp.asarray(P)
    w = scfg.avg_win
    lock_tail = lock_tail_blocks(scfg.after_wait_sec, scfg.block_sec)
    min_dur_b = min_duration_blocks(scfg.min_dur_sec, scfg.block_sec)

    # identical workload to bench.stations_pipeline
    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((C, n)).astype(np.float32) * 0.3
    t = np.arange(n) / fs
    for c in range(C):
        s0 = 20.0 + (7.0 * c) % max(args.seconds - 30.0, 1.0)
        m = (t >= s0) & (t < s0 + 1.0)
        x_np[c, m] += 1.5 * np.sin(2 * np.pi * 1000.0 * t[m]).astype(np.float32)
    # pre-blocked upload — a flat (C, S) capture pays a ~13 ms in-graph
    # relayout per chunk on TPU (models/streaming.py::_blocked)
    x = jnp.asarray(x_np.reshape(C, n_blocks, block))
    st0 = stream_init_batch(scfg, C)
    print(f"# backend={jax.default_backend()} C={C} n_blocks={n_blocks} "
          f"nperseg={nperseg} w={w}", file=sys.stderr)

    def front(xj, Pp):
        # mirrors stream_front_headless: per-level sanitize (round 5)
        ms, n1, n2 = (
            _sanitize_levels(v) for v in block_band_sums_db(xj, Pp, slices, nseg)
        )
        return ms - (n1 + n2) / 2.0

    def prologue(st, on):
        return jax.vmap(
            lambda r, i, o: _ring_base_thresholds(r, i, o, w, scfg.k_std, jnp.float32)
        )(st.ring, st.block_idx, on)

    def kernel(st, on, bt):
        pm = jnp.zeros_like(on)
        carry_f = jnp.stack([
            st.locked_threshold, st.track_start_sec,
            st.tr_sum, st.tr_sumsq, st.tr_min, st.tr_max,
            st.init_sum, st.psd_db_mean_from_init,
        ]).astype(jnp.float32)
        carry_i = jnp.stack([
            st.state, st.locked_until_block, st.track_start_block,
            st.tr_count, st.init_count, st.block_idx,
        ]).astype(jnp.int32)
        ys, cf1, ci1 = stream_machine_fused(
            on.T, pm.T, bt.T, carry_f, carry_i,
            block_sec=float(scfg.block_sec),
            init_wait_sec=float(scfg.init_wait_sec),
            min_mean_db=float(scfg.min_mean_db),
            min_dur_b=int(min_dur_b),
            lock_tail=int(lock_tail),
        )
        return ys, cf1

    # every stage body returns a scalar the next iteration's eps derives
    # from, so XLA can neither hoist nor reorder chained iterations.
    # x/Pj/st0 are jit ARGUMENTS, never closed over — the remote compiler
    # rejects jaxprs with the 614 MB input embedded as a constant (HTTP
    # 413) and handles large baked-in literals pathologically anyway.
    def s1_body(xj, Pp, st, eps):
        return front(xj, Pp + eps).sum()

    def s2_body(xj, Pp, st, eps):
        on = front(xj, Pp + eps)
        bt, ext = prologue(st, on)
        return bt.sum()

    def s3_body(xj, Pp, st, eps):
        on = front(xj, Pp + eps)
        bt, ext = prologue(st, on)
        ys, cf1 = kernel(st, on, bt)
        return ys[0].sum() + cf1.sum()

    def s4_body(xj, Pp, st, eps):
        on = front(xj, Pp + eps)
        pm = jnp.zeros_like(on)
        st2, ev, thr = stream_scan_fused_batch(scfg, st, on, pm)
        return thr.sum() + st2.tr_sum.sum() + ev.count.sum().astype(jnp.float32)

    def s5_body(xj, Pp, st, eps):
        on = front(xj + eps, Pp)  # bench methodology: dep through the 614 MB input
        pm = jnp.zeros_like(on)
        st2, ev, thr = stream_scan_fused_batch(scfg, st, on, pm)
        return thr.sum() + st2.tr_sum.sum() + ev.count.sum().astype(jnp.float32)

    bodies = {"S1": s1_body, "S2": s2_body, "S3": s3_body,
              "S4": s4_body, "S5": s5_body}
    results = {}
    for name in args.stages.split(","):
        body = bodies[name]

        @jax.jit
        def runk(xj, Pp, st, k, body=body):
            def it(_, carry):
                eps = jnp.where(jnp.isnan(carry), jnp.float32(1.0), jnp.float32(0.0))
                return body(xj, Pp, st, eps)

            return jax.lax.fori_loop(0, k, it, jnp.float32(0.0))

        float(np.asarray(runk(x, Pj, st0, 1)))  # compile + warm

        def timed(k, runk=runk):
            t0 = time.perf_counter()
            out = runk(x, Pj, st0, k)
            np.asarray(out)
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(args.reps))
        tk = min(timed(args.chain) for _ in range(args.reps))
        dt = (tk - t1) / (args.chain - 1)
        if dt <= 0:
            print(f"# {name}: noise-bound, using tk/k", file=sys.stderr)
            dt = tk / args.chain
        results[name] = dt
        prev = None
        order = ["S1", "S2", "S3", "S4", "S5"]
        if name in order[1:]:
            pidx = order.index(name) - 1
            prev = results.get(order[pidx])
        delta = f"  (+{(dt - prev) * 1e3:.2f} ms vs previous stage)" if prev else ""
        print(f"{name}: {dt * 1e3:.2f} ms{delta}")

    if {"S4", "S5"} <= results.keys():
        print(f"harness x+eps artifact (S5-S4): "
              f"{(results['S5'] - results['S4']) * 1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
