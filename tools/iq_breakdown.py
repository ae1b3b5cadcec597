"""On-chip cost breakdown of the IQ front-end chain (VERDICT r4 item 1).

bench.py --frontend-iq records ~2.5 G complex samples/s ≈ 8 ms per
10 s × 2 MS/s capture, but the chain's unavoidable traffic (~160 MB in +
one framed copy) bounds it at ~0.5–0.8 ms on this chip's measured
~600 GB/s practical HBM rate, and the bank matmul is ~6 GFLOP (≪1 ms on
the MXU) — the recorded time is ~10× the floor.  Round 4 proved
(stations: 28 → 2.5 ms) that attribution-first is how these floors fall,
so this script times the chain cumulatively with the same in-graph
fori-chained methodology (tools/stations_breakdown.py):

  S1  in-graph framing (pad + reshape to (2, m, q)) + bank GEMM
  P1  bank GEMM from PRE-FRAMED upload (host numpy framing — free), so
      S1 − P1 is the in-graph flat→framed relayout cost (the same
      tiled-layout relayout class models/streaming.py::_blocked documents)
  P2  + the _bank_apply rotation (a_cols strided slices + moveaxis) =
      full channelize_iq from frames
  P3  + the headless bins front (optional, known cheap at this width)
  P4  + fused streaming solver = the FULL chain from pre-framed input
  S4  full chain with in-graph framing, eps through the tap table
  S5  full chain with in-graph framing, eps through ``xr + eps`` — the
      pre-round-5 bench methodology, so S5 − S4 is the harness's own
      re-materialization artifact (VERDICT r4 weak #3)

Every stage threads the chained-timing dependency through the TINY
(q, 2·C·A) tap table (never the 160 MB capture), per the repo's
chained-eps doctrine.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/iq_breakdown.py \
        [--seconds 10] [--stations 8] [--stages S1,P1,P2,P4,S4,S5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--stations", type=int, default=8)
    p.add_argument("--stages", default="S1,P1,P2,P4,S4,S5")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--chain", type=int, default=11)
    args = p.parse_args(argv)

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
        _bank_apply,
        _polyphase_frames,
        channel_bank_plan,
        frame_capture_host,
    )

    # identical workload to bench.frontend_iq_pipeline
    fs = 2_000_000
    audio_rate = 4000
    tone = 1000.0
    decim = fs // audio_rate  # 500, exact
    n_stations = args.stations
    half = n_stations // 2
    freqs = [50_000.0 * (i - half) or 25_000.0 for i in range(n_stations)]
    centers = np.asarray([f - tone for f in freqs])
    x_re, x_im, _ = synth_wideband_iq(fs, args.seconds, freqs, seed=3)
    n = x_re.size

    cfg = DetectionConfig(
        signal_freq=tone,
        detection_db_over_noise_mean_min=1.0,
        detection_dur_min_sec=0.5,
    )
    scfg = StreamConfig.from_config(cfg)

    plan, tables = channel_bank_plan(
        n, fs, centers, bandwidth=1500.0, decim=decim, numtaps=2001
    )
    hh, cr, sr = tables
    print(f"# backend={jax.default_backend()} n={n} m={plan['m']} q={plan['q']} "
          f"a_cols={plan['a_cols']} n_out={plan['n_out']} C={plan['c_n']}",
          file=sys.stderr)

    st0 = stream_init_batch(scfg, n_stations)
    xr = jnp.asarray(x_re)
    xi = jnp.asarray(x_im)
    f_host = jnp.asarray(frame_capture_host(np.stack([x_re, x_im]), plan))

    c_n, a_cols, n_out = plan["c_n"], plan["a_cols"], plan["n_out"]
    pl, m, q = plan["pl"], plan["m"], plan["q"]

    def bank_post(dc, ds):
        return dc[0] + ds[1], dc[1] - ds[0]

    def chain_tail(audio, st):
        on, pm, _ = stream_front_headless(cfg, audio, audio_rate)
        s2, _, _ = stream_scan_fused_batch(scfg, st, on, pm)
        return s2.tr_sum.sum() + s2.block_idx.sum().astype(jnp.float32)

    # stage bodies: (xr, xi, f, hhj, eps, crj, srj, st) -> scalar.  eps is
    # the chain dependency (0.0 in steady state); every stage folds it into
    # the tiny tap table except S5, which threads it through the 80 MB
    # capture instead (the retired methodology under study).  All tables
    # ride as jit *arguments* — closing over a device array would bake it
    # into the traced graph as a literal, which compiles pathologically on
    # the tunneled backend (CLAUDE.md).
    def s1_body(xr, xi, f, hhj, eps, crj, srj, st):
        x = jnp.stack([xr, xi])
        fr = _polyphase_frames(x, pl, m, q)
        g = jnp.dot(fr, hhj + eps, precision=jax.lax.Precision.HIGHEST)
        return g.sum()

    def p1_body(xr, xi, f, hhj, eps, crj, srj, st):
        g = jnp.dot(f, hhj + eps, precision=jax.lax.Precision.HIGHEST)
        return g.sum()

    def p2_body(xr, xi, f, hhj, eps, crj, srj, st):
        dc, ds = _bank_apply(f, hhj + eps, crj, srj, c_n, a_cols, n_out)
        y_re, y_im = bank_post(dc, ds)
        return y_re.sum() + y_im.sum()

    def p3_body(xr, xi, f, hhj, eps, crj, srj, st):
        dc, ds = _bank_apply(f, hhj + eps, crj, srj, c_n, a_cols, n_out)
        y_re, _ = bank_post(dc, ds)
        on, pm, _ = stream_front_headless(cfg, y_re, audio_rate)
        return on.sum()

    def p4_body(xr, xi, f, hhj, eps, crj, srj, st):
        dc, ds = _bank_apply(f, hhj + eps, crj, srj, c_n, a_cols, n_out)
        y_re, _ = bank_post(dc, ds)
        return chain_tail(y_re, st)

    def s4_body(xr, xi, f, hhj, eps, crj, srj, st):
        x = jnp.stack([xr, xi])
        fr = _polyphase_frames(x, pl, m, q)
        dc, ds = _bank_apply(fr, hhj + eps, crj, srj, c_n, a_cols, n_out)
        y_re, _ = bank_post(dc, ds)
        return chain_tail(y_re, st)

    def s5_body(xr, xi, f, hhj, eps, crj, srj, st):
        # retired methodology: eps through the 80 MB capture, taps clean
        x = jnp.stack([xr + eps, xi])
        fr = _polyphase_frames(x, pl, m, q)
        dc, ds = _bank_apply(fr, hhj, crj, srj, c_n, a_cols, n_out)
        y_re, _ = bank_post(dc, ds)
        return chain_tail(y_re, st)

    bodies = {"S1": s1_body, "P1": p1_body, "P2": p2_body, "P3": p3_body,
              "P4": p4_body, "S4": s4_body, "S5": s5_body}

    results = {}
    for name in args.stages.split(","):
        body = bodies[name]

        @jax.jit
        def runk(xr, xi, f, hhj, crj, srj, st, k, body=body):
            def it(_, carry):
                eps = jnp.where(jnp.isnan(carry), jnp.float32(1.0), jnp.float32(0.0))
                return body(xr, xi, f, hhj, eps, crj, srj, st)

            return jax.lax.fori_loop(0, k, it, jnp.float32(0.0))

        float(np.asarray(runk(xr, xi, f_host, hh, cr, sr, st0, 1)))  # compile + warm

        def timed(k, runk=runk):
            t0 = time.perf_counter()
            out = runk(xr, xi, f_host, hh, cr, sr, st0, k)
            np.asarray(out)
            return time.perf_counter() - t0

        t1 = min(timed(1) for _ in range(args.reps))
        tk = min(timed(args.chain) for _ in range(args.reps))
        dt = (tk - t1) / (args.chain - 1)
        note = ""
        if dt <= 0:
            note = "  (noise-bound, tk/k upper bound)"
            dt = tk / args.chain
        results[name] = dt
        rate = n / dt / 1e9
        print(f"{name}: {dt * 1e3:.2f} ms  ({rate:.2f} G complex samples/s){note}")

    if {"S1", "P1"} <= results.keys():
        print(f"in-graph framing relayout (S1-P1): "
              f"{(results['S1'] - results['P1']) * 1e3:.2f} ms")
    if {"P2", "P1"} <= results.keys():
        print(f"bank rotation (P2-P1): {(results['P2'] - results['P1']) * 1e3:.2f} ms")
    if {"P4", "P2"} <= results.keys():
        print(f"front+solver (P4-P2): {(results['P4'] - results['P2']) * 1e3:.2f} ms")
    if {"S4", "P4"} <= results.keys():
        print(f"framing cost inside full chain (S4-P4): "
              f"{(results['S4'] - results['P4']) * 1e3:.2f} ms")
    if {"S5", "S4"} <= results.keys():
        print(f"harness x+eps artifact (S5-S4): "
              f"{(results['S5'] - results['S4']) * 1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
