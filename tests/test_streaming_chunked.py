"""Chunked streaming equality: feeding audio in many small chunks must give
exactly the same events as one big chunk (the device carry is the only
state — processor.py's Python loop has no such invariant to test)."""

import numpy as np

import jax.numpy as jnp

from meteor_scatter_tpu.config import DetectionConfig
from meteor_scatter_tpu.models.streaming import StreamConfig, stream_init, stream_process


def make_audio(fs=4000, dur=60.0):
    rng = np.random.default_rng(9)
    t = np.arange(int(fs * dur)) / fs
    x = rng.standard_normal(len(t)).astype(np.float32) * 0.05
    for s, l, a in [(15.0, 1.0, 0.6), (35.0, 2.0, 0.5)]:
        m = (t >= s) & (t < s + l)
        x[m] += a * np.sin(2 * np.pi * 1000.0 * t[m]).astype(np.float32)
    return x


def collect(cfg, fs, x, chunk_blocks):
    block = int(cfg.proc_block_sec * fs)
    state = stream_init(StreamConfig.from_config(cfg))
    events = []
    step = chunk_blocks * block
    for i in range(0, len(x) - step + 1, step):
        state, ev, _ = stream_process(cfg, state, jnp.asarray(x[i : i + step]), fs)
        cnt = int(ev.count)
        for k in range(cnt):
            events.append(
                (
                    round(float(ev.time_start[k]), 6),
                    round(float(ev.time_stop[k]), 6),
                    round(float(ev.db_mean[k]), 4),
                )
            )
    return events


def test_chunk_size_invariance():
    fs = 4000
    cfg = DetectionConfig(
        signal_freq=1000, detection_db_over_noise_mean_min=1, detection_dur_min_sec=0.5
    )
    x = make_audio(fs)
    big = collect(cfg, fs, x, chunk_blocks=300)  # one 60 s chunk
    small = collect(cfg, fs, x, chunk_blocks=25)  # 5 s chunks
    tiny = collect(cfg, fs, x, chunk_blocks=10)  # 2 s chunks
    assert len(big) >= 2
    assert big == small == tiny


def test_empty_chunk_diag_schema_matches_front_and_impl():
    """An empty chunk (shorter than one block) must return diagnostics with
    the SAME key schema the resolved front/impl produces on real chunks —
    the old path always returned welch-shaped diags (psd_db/freqs present,
    thr_degraded absent), breaking per-chunk diag accumulation for bins
    fronts and the hop solver (round-5 review finding)."""
    fs = 4000
    cfg = DetectionConfig(signal_freq=1000)
    x = make_audio(fs, dur=10.0)
    for front, impl in [("welch", "scan"), ("bins", "hop"), ("bins", "fused"),
                        ("bins", "jump")]:
        state = stream_init(StreamConfig.from_config(cfg))
        state, _, d_full = stream_process(cfg, state, jnp.asarray(x), fs,
                                          front=front, impl=impl)
        state, _, d_empty = stream_process(
            cfg, state, jnp.asarray(x[:10]), fs, front=front, impl=impl
        )
        assert set(d_empty) == set(d_full), (front, impl)
        assert d_empty["over_noise"].shape == (0,)


class TestProcessMatchesStepScan:
    """The restructured stream_process (hoisted rolling stats, output-based
    event emission) must equal a plain scan of stream_step — the oracle-
    pinned reference formulation — on the same audio."""

    def test_equal_to_reference_formulation(self):
        import jax
        import jax.numpy as jnp

        from meteor_scatter_tpu.models.streaming import (
            StreamConfig,
            _empty_events,
            stream_init,
            stream_process,
            stream_step,
        )
        from meteor_scatter_tpu.ops.welch import band_sum_db, welch_freqs, welch_psd

        fs = 4000
        cfg = DetectionConfig(
            signal_freq=1000,
            detection_db_over_noise_mean_min=1,
            detection_dur_min_sec=0.5,
        )
        scfg = StreamConfig.from_config(cfg)
        x = make_audio(fs)

        st_new, ev_new, diags = stream_process(cfg, stream_init(scfg), jnp.asarray(x), fs)

        # reference formulation on the identical per-block series
        block = int(cfg.proc_block_sec * fs)
        nb = len(x) // block
        xx = jnp.asarray(x[: nb * block]).reshape(nb, block)
        psd = welch_psd(xx, fs, cfg.n_fft, nperseg=cfg.welch_nperseg)
        freqs = welch_freqs(fs, cfg.n_fft)
        on = band_sum_db(psd, freqs, cfg.signal_band) - (
            band_sum_db(psd, freqs, cfg.noise_band_1)
            + band_sum_db(psd, freqs, cfg.noise_band_2)
        ) / 2.0
        pm = jnp.mean(10.0 * jnp.log10(psd), axis=-1)

        def body(carry, inp):
            st, ev = carry
            st, ev, thr = stream_step(scfg, st, ev, inp[0], inp[1])
            return (st, ev), thr

        (st_ref, ev_ref), thr_ref = jax.lax.scan(
            body, (stream_init(scfg), _empty_events(scfg.cap, on.dtype)), (on, pm)
        )

        np.testing.assert_allclose(
            np.asarray(diags["threshold"]), np.asarray(thr_ref), rtol=1e-6, equal_nan=True
        )
        assert int(ev_new.count) == int(ev_ref.count)
        c = int(ev_ref.count)
        for f in ("time_start", "time_stop", "duration", "db_min", "db_max",
                  "db_mean", "db_std"):
            np.testing.assert_allclose(
                np.asarray(getattr(ev_new, f))[:c],
                np.asarray(getattr(ev_ref, f))[:c],
                rtol=1e-6,
                err_msg=f,
            )
        # carried state equal too (ring in identical slot order)
        np.testing.assert_allclose(np.asarray(st_new.ring), np.asarray(st_ref.ring), rtol=1e-6)
        assert int(st_new.state) == int(st_ref.state)
        assert int(st_new.block_idx) == int(st_ref.block_idx)
        np.testing.assert_allclose(
            float(st_new.psd_db_mean_from_init), float(st_ref.psd_db_mean_from_init), rtol=1e-6
        )
