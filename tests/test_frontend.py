"""IQ front-end end-to-end test (BASELINE config 4 path, CPU mesh)."""

import numpy as np
import pytest

import jax

from meteor_scatter_tpu.apps.frontend import (
    detect_channels,
    iq_frontend,
    synth_wideband,
    synth_wideband_iq,
)


def run_chain(fs, stations, seconds, mesh=None, window_sec=10.0):
    x, truth = synth_wideband(fs, seconds, stations, bursts_per_station=1, seed=4)
    audio = iq_frontend(x, fs, stations, tone_freq=1000.0)
    events, delta = detect_channels(
        audio,
        tone_freq=1000.0,
        threshold_estimation_window_sec=window_sec,
        threshold_fixed_init_sec=2.0,
        threshold_freeze_after_sec=5.0,
        mesh=mesh,
    )
    return events, truth, audio


class TestIqFrontend:
    def test_integer_decimation_chain(self):
        # 48 kHz -> /8 -> 6 kHz (single-stage path)
        fs = 48_000.0
        stations = [10_000.0, 16_000.0]
        events, truth, audio = run_chain(fs, stations, seconds=20.0)
        assert audio.shape == (2, int(20.0 * 6000))
        for c in range(2):
            cnt = int(events.count[c])
            assert cnt >= 1, f"channel {c} found nothing"
            t0_truth, dur_truth = truth[c][0]
            starts = [float(events.start[c, i]) * 0.2 for i in range(cnt)]
            assert min(abs(s - t0_truth) for s in starts) < 0.5

    def test_rational_resample_chain(self):
        # 200 kHz -> /20 -> 10 kHz -> x3/5 -> 6 kHz (two-stage path)
        fs = 200_000.0
        stations = [50_000.0]
        events, truth, audio = run_chain(fs, stations, seconds=20.0)
        assert audio.shape[1] == int(20.0 * 6000)
        assert int(events.count[0]) >= 1

    def test_complex_iq_capture_chain(self):
        # complex capture with stations on BOTH sides of 0 Hz — the
        # negative-offset channel only exists for an I/Q front end
        fs = 48_000.0
        stations = [-10_000.0, 16_000.0]
        x_re, x_im, truth = synth_wideband_iq(fs, 20.0, stations, bursts_per_station=1, seed=7)
        audio = iq_frontend(x_re, fs, stations, tone_freq=1000.0, x_im=x_im)
        assert audio.shape == (2, int(20.0 * 6000))
        events, _ = detect_channels(
            audio,
            tone_freq=1000.0,
            threshold_estimation_window_sec=10.0,
            threshold_fixed_init_sec=2.0,
            threshold_freeze_after_sec=5.0,
        )
        for c in range(2):
            cnt = int(events.count[c])
            assert cnt >= 1, f"channel {c} found nothing"
            t0_truth, _ = truth[c][0]
            starts = [float(events.start[c, i]) * 0.2 for i in range(cnt)]
            assert min(abs(s - t0_truth) for s in starts) < 0.5

    def test_sharded_mesh_path(self):
        assert len(jax.devices()) == 8
        from meteor_scatter_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_station=2, n_time=4)
        fs = 48_000.0
        stations = [10_000.0, 16_000.0]
        # 32 s -> 160 blocks -> 40/time-shard >= the 20-block window
        events, truth, _ = run_chain(fs, stations, seconds=32.0, mesh=mesh, window_sec=4.0)
        for c in range(2):
            assert int(events.count[c]) >= 1
