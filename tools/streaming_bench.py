"""Streaming-pipeline timing on the current backend (the measured basis for
TODO.md's streaming throughput numbers).

Times one hour of 4 kHz audio through `stream_process` for each requested
(front, impl) combination with chained-state timing (each call consumes the
previous call's carry, so the K executions are data-dependent — the only
reliable device-time isolation on this tunneled backend, see bench.py), and
cross-checks that every combination reports the same event boundaries as
the reference-formulation scan on the same series.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/streaming_bench.py \
        [--combos welch:scan,bins:scan,bins:jump] [--hours 1.0]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def synth_hour(fs: int, seconds: float, seed: int = 9) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    x = rng.standard_normal(len(t)).astype(np.float32) * 0.05
    s = 15.0
    while s < seconds - 10.0:
        dur = 0.8 + (s % 3.0) / 2.0
        m = (t >= s) & (t < s + dur)
        x[m] += 0.6 * np.sin(2 * np.pi * 1000.0 * t[m]).astype(np.float32)
        s += 120.0
    return x


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--combos", default="welch:scan,bins:scan,bins:jump")
    p.add_argument("--hours", type=float, default=1.0)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--chain", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from meteor_scatter_tpu.config import DetectionConfig
    from meteor_scatter_tpu.models.streaming import (
        StreamConfig,
        stream_init,
        stream_process,
    )

    fs = 4000
    cfg = DetectionConfig(
        signal_freq=1000.0,
        detection_db_over_noise_mean_min=1.0,
        detection_dur_min_sec=0.5,
    )
    scfg = StreamConfig.from_config(cfg)
    seconds = 3600.0 * args.hours
    x = jnp.asarray(synth_hour(fs, seconds))
    print(f"# backend={jax.default_backend()} samples={x.shape[-1]:,}",
          file=sys.stderr)

    baseline_events = None
    for combo in args.combos.split(","):
        front, impl = combo.split(":")

        @jax.jit
        def run(xj, st, front=front, impl=impl):
            st2, ev, _ = stream_process(cfg, st, xj, fs, front=front, impl=impl)
            return st2, ev

        # In-graph chained timing: k dependent runs in ONE dispatch, immune
        # to host/tunnel dispatch latency (which can reach ms on this
        # backend).  The front half depends only on x, so XLA would hoist
        # it out of the loop as invariant — eps (derived from the carried
        # state, provably 0 but unprovable to the compiler) keeps every
        # iteration's full pipeline in the loop body.
        @jax.jit
        def runk(xj, st, k, front=front, impl=impl):
            def body(_, s):
                eps = jnp.where(jnp.isnan(s.tr_sum), jnp.float32(1.0), jnp.float32(0.0))
                s2, _, _ = stream_process(cfg, s, xj + eps, fs, front=front, impl=impl)
                return s2
            return jax.lax.fori_loop(0, k, body, st)

        st0 = stream_init(scfg)
        st, ev = run(x, st0)
        cnt = int(np.asarray(ev.count))
        starts = np.asarray(ev.time_start)[:cnt]
        stops = np.asarray(ev.time_stop)[:cnt]
        if baseline_events is None:
            baseline_events = (cnt, starts, stops)
        else:
            c0, s0, p0 = baseline_events
            same = cnt == c0 and np.array_equal(starts, s0) and np.array_equal(stops, p0)
            print(f"# {combo}: events_equal_to_{args.combos.split(',')[0]}={same}",
                  file=sys.stderr)

        int(np.asarray(runk(x, st0, 1).block_idx))  # compile + warm

        def chained(k, runk=runk, st0=st0):
            t0 = time.perf_counter()
            sK = runk(x, st0, k)
            np.asarray(sK.block_idx)
            return time.perf_counter() - t0

        t1 = min(chained(1) for _ in range(args.reps))
        tk = min(chained(args.chain) for _ in range(args.reps))
        dt = (tk - t1) / (args.chain - 1)
        if dt <= 0:
            print("# warning: noise-bound; using tk/k upper bound", file=sys.stderr)
            dt = tk / args.chain
        rt = seconds / dt
        print(f"{combo}: {dt * 1e3 / args.hours:.2f} ms/hour-of-audio, "
              f"{rt:,.0f}x realtime, {cnt} events")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
