"""Detector parity vs the numpy oracles (SURVEY.md §4 plan, items 1-2).

x64 is enabled here so the JAX scans run in float64 and must match the
oracles *exactly* on detection boundaries (same blocks above threshold)."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from meteor_scatter_tpu.models.events import events_from_mask, merge_adjacent  # noqa: E402
from meteor_scatter_tpu.models.fixed import detect_fixed  # noqa: E402
from meteor_scatter_tpu.models.adaptive import detect_adaptive, adaptive_thresholds  # noqa: E402
from meteor_scatter_tpu.models.streaming import (  # noqa: E402
    StreamConfig,
    _empty_events,
    stream_init,
    stream_step,
)

from oracles import oracle_adaptive, oracle_fixed, oracle_streaming  # noqa: E402

RNG = np.random.default_rng(7)


def burst_series(n=3000, n_bursts=12, seed=7):
    """Synthetic delta-power series: Gaussian noise + boxcar bursts."""
    rng = np.random.default_rng(seed)
    d = rng.standard_normal(n) * 0.8
    for _ in range(n_bursts):
        s = rng.integers(50, n - 60)
        w = rng.integers(2, 40)
        d[s : s + w] += rng.uniform(5, 15)
    return d


class TestEventsFromMask:
    def test_simple_runs(self):
        above = np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1], bool)
        series = np.arange(10.0)
        ev = events_from_mask(jnp.asarray(above), jnp.asarray(series), cap=8)
        assert int(ev.count) == 3
        np.testing.assert_array_equal(np.asarray(ev.start[:3]), [1, 5, 7])
        np.testing.assert_array_equal(np.asarray(ev.stop[:3]), [3, 6, 10])
        np.testing.assert_allclose(np.asarray(ev.db_mean[:3]), [1.5, 5.0, 8.0])

    def test_all_false_and_all_true(self):
        series = jnp.arange(5.0)
        ev = events_from_mask(jnp.zeros(5, bool), series, cap=4)
        assert int(ev.count) == 0
        ev = events_from_mask(jnp.ones(5, bool), series, cap=4)
        assert int(ev.count) == 1
        assert (int(ev.start[0]), int(ev.stop[0])) == (0, 5)

    def test_overflow_flag(self):
        above = jnp.asarray(np.tile([True, False], 10))
        ev = events_from_mask(above, jnp.zeros(20), cap=4)
        assert bool(ev.overflow)
        assert int(ev.count) == 4

    def test_merge_adjacent_spanning(self):
        # left run [8,10) continues into right run [0,2) at offset 10
        la = jnp.asarray([False] * 8 + [True, True])
        ra = jnp.asarray([True, True] + [False] * 8)
        ls = jnp.arange(10.0)
        rs = jnp.arange(10.0, 20.0)
        lev = events_from_mask(la, ls, cap=4)
        rev = events_from_mask(ra, rs, cap=4)
        merged = merge_adjacent(lev, rev, right_offset=10)
        assert int(merged.count) == 1
        assert (int(merged.start[0]), int(merged.stop[0])) == (8, 12)
        np.testing.assert_allclose(float(merged.db_mean[0]), np.mean([8, 9, 10, 11]))

    def test_merge_adjacent_disjoint(self):
        la = jnp.asarray([True, True] + [False] * 8)
        ra = jnp.asarray([False] * 4 + [True] + [False] * 5)
        lev = events_from_mask(la, jnp.arange(10.0), cap=4)
        rev = events_from_mask(ra, jnp.arange(10.0), cap=4)
        merged = merge_adjacent(lev, rev, right_offset=10)
        assert int(merged.count) == 2
        assert (int(merged.start[1]), int(merged.stop[1])) == (14, 15)


class TestFixedDetector:
    def test_matches_oracle(self):
        d = burst_series()
        want, want_thr = oracle_fixed(d, 4.0)
        ev, thr = detect_fixed(jnp.asarray(d), 4.0, cap=256)
        assert abs(float(thr) - want_thr) < 1e-9
        assert int(ev.count) == len(want)
        for i, (s, e, m) in enumerate(want):
            assert int(ev.start[i]) == s
            assert int(ev.stop[i]) == e
            np.testing.assert_allclose(float(ev.db_mean[i]), m, rtol=1e-12)

    def test_open_run_at_end(self):
        d = np.zeros(50)
        d[45:] = 100.0  # run reaches the end
        want, _ = oracle_fixed(d, 1.0)
        ev, _ = detect_fixed(jnp.asarray(d), 1.0, cap=8)
        assert int(ev.count) == len(want) == 1
        s, e, m = want[0]
        assert (int(ev.start[0]), int(ev.stop[0])) == (s, e) == (45, 49)
        np.testing.assert_allclose(float(ev.db_mean[0]), m)

    def test_open_run_at_end_under_overflow_keeps_survivors_intact(self):
        """When the buffer overflowed, the run touching the end was dropped
        by events_from_mask — the end-of-series patch must not rewrite the
        last SURVIVING event's stop/mean (round-5 review finding)."""
        d = np.zeros(100)
        for s in range(0, 90, 10):  # 9 closed runs of 3 blocks
            d[s : s + 3] = 100.0
        d[97:] = 100.0  # 10th run reaches the end
        ev, _ = detect_fixed(jnp.asarray(d), 1.0, cap=4)
        assert bool(ev.overflow)
        assert int(ev.count) == 4
        # the surviving events are the first four closed runs, untouched
        for k in range(4):
            assert (int(ev.start[k]), int(ev.stop[k])) == (10 * k, 10 * k + 3)
            np.testing.assert_allclose(float(ev.db_mean[k]), 100.0)

    def test_open_run_at_start(self):
        d = np.zeros(50)
        d[:4] = 100.0
        want, _ = oracle_fixed(d, 1.0)
        ev, _ = detect_fixed(jnp.asarray(d), 1.0, cap=8)
        assert int(ev.count) == 1
        assert (int(ev.start[0]), int(ev.stop[0])) == want[0][:2] == (0, 4)


class TestAdaptiveDetector:
    PARAMS = dict(window_blocks=600, freeze_before=15, freeze_after=100, fixed_blocks=50)

    def test_matches_oracle(self):
        d = burst_series(n=4000)
        want, want_thr = oracle_adaptive(d, 4.0, **self.PARAMS)
        thr, above, _ = adaptive_thresholds(
            jnp.asarray(d),
            4.0,
            window_blocks=self.PARAMS["window_blocks"],
            freeze_blocks_before=self.PARAMS["freeze_before"],
            freeze_blocks_after=self.PARAMS["freeze_after"],
            fixed_threshold_blocks=self.PARAMS["fixed_blocks"],
        )
        np.testing.assert_allclose(np.asarray(thr), want_thr, rtol=1e-10)
        ev = events_from_mask(above, jnp.asarray(d), cap=256)
        assert int(ev.count) == len(want)
        for i, (s, e, m) in enumerate(want):
            assert (int(ev.start[i]), int(ev.stop[i])) == (s, e)
            np.testing.assert_allclose(float(ev.db_mean[i]), m, rtol=1e-12)

    def test_detect_adaptive_reference_params(self):
        # reference defaults: 0.2 s blocks, 120 s window, 3/20 s freeze, 10 s init
        d = burst_series(n=6000, seed=11)
        want, want_thr = oracle_adaptive(
            d, 4.0, window_blocks=600, freeze_before=15, freeze_after=100, fixed_blocks=50
        )
        ev, thr = detect_adaptive(jnp.asarray(d), 4.0, block_duration_sec=0.2, cap=512)
        np.testing.assert_allclose(np.asarray(thr), want_thr, rtol=1e-10)
        assert int(ev.count) == len(want)

    def test_fast_path_equals_scan(self):
        from meteor_scatter_tpu.models.adaptive import adaptive_thresholds_fast

        d = burst_series(n=4000, seed=13)
        kw = dict(
            threshold_std_factor=4.0,
            window_blocks=600,
            freeze_blocks_before=15,
            freeze_blocks_after=100,
            fixed_threshold_blocks=50,
        )
        thr_scan, above_scan, _ = adaptive_thresholds(jnp.asarray(d), **kw)
        thr_fast, above_fast = adaptive_thresholds_fast(jnp.asarray(d), **kw)
        np.testing.assert_allclose(np.asarray(thr_fast), np.asarray(thr_scan), rtol=1e-9)
        np.testing.assert_array_equal(np.asarray(above_fast), np.asarray(above_scan))

    def test_zero_fixed_blocks_solvers_agree(self):
        """fixed_threshold_blocks=0 makes block 0 use the (empty-window)
        windowed threshold, which the sequential scan evaluates as 0 — the
        restructured solvers returned NaN there, silently suppressing a
        block-0 detection (round-5 review finding)."""
        from meteor_scatter_tpu.models.adaptive import (
            adaptive_thresholds_fast,
            adaptive_thresholds_parallel,
        )

        d = burst_series(n=1500, seed=41)
        d[0] = abs(d[0]) + 5.0  # block 0 above the zero threshold
        kw = dict(
            threshold_std_factor=4.0,
            window_blocks=300,
            freeze_blocks_before=15,
            freeze_blocks_after=100,
            fixed_threshold_blocks=0,
        )
        thr_scan, above_scan, _ = adaptive_thresholds(jnp.asarray(d), **kw)
        assert bool(above_scan[0])  # the sequential semantics fire at 0
        for fn in (adaptive_thresholds_fast, adaptive_thresholds_parallel):
            thr, above = fn(jnp.asarray(d), **kw)
            assert np.isfinite(np.asarray(thr)).all()
            np.testing.assert_array_equal(np.asarray(above), np.asarray(above_scan))
            np.testing.assert_allclose(
                np.asarray(thr), np.asarray(thr_scan), rtol=1e-9
            )

    @pytest.mark.parametrize("seed,k", [(13, 4.0), (17, 4.0), (23, 3.0), (29, 2.0), (31, 1.5)])
    def test_parallel_fixpoint_equals_scan(self, seed, k):
        # lower k → denser detections → more freeze episodes → harder fixpoint
        from meteor_scatter_tpu.models.adaptive import adaptive_thresholds_parallel

        d = burst_series(n=4000, seed=seed, n_bursts=20)
        kw = dict(
            threshold_std_factor=k,
            window_blocks=300,
            freeze_blocks_before=15,
            freeze_blocks_after=100,
            fixed_threshold_blocks=50,
        )
        thr_scan, above_scan, _ = adaptive_thresholds(jnp.asarray(d), **kw)
        thr_par, above_par = adaptive_thresholds_parallel(jnp.asarray(d), **kw)
        np.testing.assert_array_equal(np.asarray(above_par), np.asarray(above_scan))
        np.testing.assert_allclose(
            np.asarray(thr_par), np.asarray(thr_scan), rtol=1e-9, equal_nan=True
        )

    def test_parallel_fixpoint_pure_noise(self):
        from meteor_scatter_tpu.models.adaptive import adaptive_thresholds_parallel

        rng = np.random.default_rng(99)
        d = rng.standard_normal(5000)
        kw = dict(
            threshold_std_factor=2.5,
            window_blocks=200,
            freeze_blocks_before=5,
            freeze_blocks_after=30,
            fixed_threshold_blocks=20,
        )
        thr_scan, above_scan, _ = adaptive_thresholds(jnp.asarray(d), **kw)
        thr_par, above_par = adaptive_thresholds_parallel(jnp.asarray(d), **kw)
        np.testing.assert_array_equal(np.asarray(above_par), np.asarray(above_scan))

    def test_chunked_equals_full(self):
        d = burst_series(n=2000, seed=3)
        kw = dict(
            threshold_std_factor=4.0,
            window_blocks=300,
            freeze_blocks_before=15,
            freeze_blocks_after=100,
            fixed_threshold_blocks=50,
        )
        thr_full, above_full, _ = adaptive_thresholds(jnp.asarray(d), **kw)
        g = (jnp.mean(jnp.asarray(d)), jnp.std(jnp.asarray(d)))
        carry = None
        thrs, aboves = [], []
        for c in range(4):
            chunk = jnp.asarray(d[c * 500 : (c + 1) * 500])
            t, a, carry = adaptive_thresholds(chunk, global_stats=g, init_carry=carry, **kw)
            thrs.append(np.asarray(t))
            aboves.append(np.asarray(a))
        np.testing.assert_allclose(np.concatenate(thrs), np.asarray(thr_full), rtol=1e-12)
        np.testing.assert_array_equal(np.concatenate(aboves), np.asarray(above_full))


class TestStreamingStateMachine:
    CFG = StreamConfig(
        block_sec=0.2,
        avg_win=40,
        init_wait_sec=8.0,
        after_wait_sec=12.0,
        k_std=4.0,
        min_mean_db=1.0,
        min_dur_sec=0.5,
        cap=64,
    )

    def run_machine(self, over_noise, psd_db_mean):
        cfg = self.CFG
        state = stream_init(cfg, dtype=jnp.float64)
        events = _empty_events(cfg.cap, jnp.float64)

        def body(carry, inp):
            st, ev = carry
            st, ev, thr = stream_step(cfg, st, ev, inp[0], inp[1])
            return (st, ev), thr

        (state, events), thrs = jax.lax.scan(
            body,
            (state, events),
            (jnp.asarray(over_noise, jnp.float64), jnp.asarray(psd_db_mean, jnp.float64)),
        )
        return state, events, np.asarray(thrs)

    def test_matches_oracle(self):
        on = burst_series(n=1200, n_bursts=6, seed=21)
        pm = RNG.standard_normal(1200)
        want, want_thr = oracle_streaming(
            on, pm, 0.2, 40, 8.0, 12.0, 4.0, 1.0, 0.5
        )
        state, events, thrs = self.run_machine(on, pm)
        np.testing.assert_allclose(thrs, want_thr, rtol=1e-7, equal_nan=True)
        assert int(events.count) == len(want)
        for i, w in enumerate(want):
            np.testing.assert_allclose(float(events.time_start[i]), w["time_start"], atol=1e-9)
            np.testing.assert_allclose(float(events.time_stop[i]), w["time_stop"], atol=1e-9)
            np.testing.assert_allclose(float(events.duration[i]), w["duration"], atol=1e-9)
            np.testing.assert_allclose(float(events.db_min[i]), w["db_min"], rtol=1e-12)
            np.testing.assert_allclose(float(events.db_max[i]), w["db_max"], rtol=1e-12)
            np.testing.assert_allclose(float(events.db_mean[i]), w["db_mean"], rtol=1e-12)
            np.testing.assert_allclose(float(events.db_std[i]), w["db_std"], rtol=1e-9)

    def test_init_phase_psd_mean(self):
        on = np.zeros(60)
        pm = np.arange(60.0)
        state, _, _ = self.run_machine(on, pm)
        # init covers blocks with t_start <= 8.0 → i = 0..40 inclusive
        want = np.mean(pm[:41])
        np.testing.assert_allclose(float(state.psd_db_mean_from_init), want)

    def test_min_duration_filter(self):
        # a 1-block burst must be rejected with min_dur 0.5 s
        on = np.zeros(200)
        on[100] = 50.0
        pm = np.zeros(200)
        want, _ = oracle_streaming(on, pm, 0.2, 40, 8.0, 12.0, 4.0, 1.0, 0.5)
        _, events, _ = self.run_machine(on, pm)
        assert int(events.count) == len(want) == 0
