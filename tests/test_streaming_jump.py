"""Episode-jump streaming solver vs the block-rate scan.

`stream_scan_jump` must reproduce `stream_scan` (itself pinned against the
stream_step oracle formulation of processor.py:444-510): event boundaries,
thresholds, and state transitions bit-exact; dB statistics to f32
reduction order (masked vector sums vs sequential adds).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from meteor_scatter_tpu.models.streaming import (
    StreamConfig,
    stream_init,
    stream_scan,
    stream_scan_jump,
)


def make_series(n, seed, bursts=(), noise=0.3, base=0.0):
    """Synthetic over_noise series: gaussian noise + raised spans."""
    rng = np.random.default_rng(seed)
    on = (base + rng.standard_normal(n) * noise).astype(np.float32)
    for b0, b1, amp in bursts:
        on[b0:b1] += amp
    pm = (-80.0 + rng.standard_normal(n)).astype(np.float32)
    return jnp.asarray(on), jnp.asarray(pm)


def default_cfg(**kw):
    d = dict(
        block_sec=0.2,
        avg_win=40,
        init_wait_sec=8.0,
        after_wait_sec=12.0,
        k_std=4.0,
        min_mean_db=1.0,
        min_dur_sec=0.5,
        cap=16,
    )
    d.update(kw)
    return StreamConfig(**d)


# Exact: integer state (incl. the integer-block lock window and entry
# block), boundary times (single-rounded products i*bs), and threshold
# values (copies of the shared base-threshold computation).
# Close: accumulated statistics (masked vector sums vs sequential adds) and
# the reported float duration (product-minus-product, which XLA may fuse
# into an FMA in one graph but not the other — a one-ulp difference
# observed in practice on the CPU backend; decisions never depend on it).
EXACT_STATE = ("state", "block_idx", "locked_threshold", "locked_until_block",
               "track_start_sec", "track_start_block", "tr_count", "init_count")
CLOSE_STATE = ("tr_sum", "tr_sumsq", "tr_min", "tr_max",
               "init_sum", "psd_db_mean_from_init")
EXACT_EV = ("time_start", "time_stop")
CLOSE_EV = ("duration", "db_min", "db_max", "db_mean", "db_std")


def assert_jump_equals_scan(scfg, st0_a, st0_b, on, pm):
    st_s, ev_s, thr_s = stream_scan(scfg, st0_a, on, pm)
    st_j, ev_j, thr_j = stream_scan_jump(scfg, st0_b, on, pm)

    np.testing.assert_array_equal(np.asarray(thr_s), np.asarray(thr_j))
    assert int(ev_s.count) == int(ev_j.count)
    assert bool(ev_s.overflow) == bool(ev_j.overflow)
    c = min(int(ev_s.count), scfg.cap)
    for f in EXACT_EV:
        np.testing.assert_array_equal(
            np.asarray(getattr(ev_s, f))[:c], np.asarray(getattr(ev_j, f))[:c],
            err_msg=f"events.{f}",
        )
    for f in CLOSE_EV:
        np.testing.assert_allclose(
            np.asarray(getattr(ev_s, f))[:c], np.asarray(getattr(ev_j, f))[:c],
            rtol=1e-5, atol=1e-5, err_msg=f"events.{f}",
        )
    for f in EXACT_STATE:
        np.testing.assert_array_equal(
            np.asarray(getattr(st_s, f)), np.asarray(getattr(st_j, f)),
            err_msg=f"state.{f}",
        )
    for f in CLOSE_STATE:
        np.testing.assert_allclose(
            np.asarray(getattr(st_s, f)), np.asarray(getattr(st_j, f)),
            rtol=1e-5, atol=1e-5, err_msg=f"state.{f}",
        )
    np.testing.assert_array_equal(np.asarray(st_s.ring), np.asarray(st_j.ring))
    return st_s, st_j, ev_s


class TestJumpEqualsScan:
    def test_noise_only(self):
        scfg = default_cfg()
        on, pm = make_series(900, seed=0)
        _, _, ev = assert_jump_equals_scan(
            scfg, stream_init(scfg), stream_init(scfg), on, pm
        )
        assert int(ev.count) == 0

    def test_bursty_series(self):
        scfg = default_cfg()
        # long accepted bursts, a too-short spike (rejected crossing), and a
        # burst inside a previous event's after_wait lock window
        bursts = [(100, 110, 8.0), (120, 121, 9.0), (160, 170, 8.0),
                  (400, 420, 6.0), (700, 704, 7.0)]
        on, pm = make_series(900, seed=1, bursts=bursts)
        _, _, ev = assert_jump_equals_scan(
            scfg, stream_init(scfg), stream_init(scfg), on, pm
        )
        assert int(ev.count) >= 3, "fixture must produce accepted events"

    def test_track_survives_chunk_end(self):
        scfg = default_cfg()
        # burst still above threshold at the end of the series
        on, pm = make_series(300, seed=2, bursts=[(280, 300, 8.0)])
        st_s, st_j, _ = assert_jump_equals_scan(
            scfg, stream_init(scfg), stream_init(scfg), on, pm
        )
        assert int(st_s.state) == 2  # TRACK carried out

    def test_cap_overflow_contract(self):
        scfg = default_cfg(cap=2)
        bursts = [(b, b + 6, 8.0) for b in range(60, 800, 90)]
        on, pm = make_series(900, seed=3, bursts=bursts)
        _, _, ev = assert_jump_equals_scan(
            scfg, stream_init(scfg), stream_init(scfg), on, pm
        )
        assert int(ev.count) > 2 and bool(ev.overflow)

    def test_chunked_carry(self):
        scfg = default_cfg()
        bursts = [(100, 110, 8.0), (400, 412, 6.0), (640, 650, 7.0)]
        on, pm = make_series(910, seed=4, bursts=bursts)
        st_s, st_j = stream_init(scfg), stream_init(scfg)
        total = 0
        # 70-block chunks: the first boundary lands mid-INIT (40 init blocks
        # < 70 but chunk 0 covers it; use 30 to cut inside INIT)
        step = 30
        for i in range(0, 900, step):
            st_s, st_j, ev = assert_jump_equals_scan(
                scfg, st_s, st_j, on[i : i + step], pm[i : i + step]
            )
            total += int(ev.count)
        assert total >= 3

    @pytest.mark.parametrize("seed", range(5, 11))
    def test_fuzz_random_walks(self, seed):
        # high-variance series with many borderline crossings
        rng = np.random.default_rng(seed)
        scfg = default_cfg(
            avg_win=int(rng.integers(8, 60)),
            after_wait_sec=float(rng.uniform(0.0, 6.0)),
            k_std=float(rng.uniform(1.0, 3.0)),
            min_mean_db=float(rng.uniform(0.0, 1.0)),
            min_dur_sec=float(rng.uniform(0.0, 1.0)),
            cap=8,
        )
        n = int(rng.integers(200, 700))
        on, pm = make_series(n, seed=seed + 100, noise=1.0)
        assert_jump_equals_scan(scfg, stream_init(scfg), stream_init(scfg), on, pm)
