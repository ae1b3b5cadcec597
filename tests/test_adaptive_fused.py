"""Fused Pallas adaptive-solver parity tests (interpret mode on CPU).

The kernel must produce the exact same above-threshold mask as the XLA
fixpoint solver (which is itself pinned bit-exact to the sequential oracle
in test_detectors.py); thresholds agree to f32 reduction-order noise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from meteor_scatter_tpu.models.adaptive import adaptive_thresholds_parallel
from meteor_scatter_tpu.models.events import events_from_mask, events_from_run_sums
from meteor_scatter_tpu.ops.pallas.adaptive_kernel import (
    MAX_FUSED_BLOCKS,
    adaptive_solver_fused,
    adaptive_thresholds_fused,
)


def series(n, seed, n_bursts=14, amp=7.0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal(n).astype(np.float32)
    if n_bursts:
        for s in np.linspace(60, n - 60, n_bursts).astype(int):
            d[s : s + 5] += amp
    return d


def both(d, **kw):
    thr_x, ab_x = adaptive_thresholds_parallel(jnp.asarray(d), **kw)
    thr_p, ab_p = adaptive_thresholds_fused(jnp.asarray(d), interpret=True, **kw)
    return (np.asarray(thr_x), np.asarray(ab_x)), (np.asarray(thr_p), np.asarray(ab_p))


KW = dict(
    threshold_std_factor=4.0,
    window_blocks=300,
    freeze_blocks_before=15,
    freeze_blocks_after=100,
    fixed_threshold_blocks=50,
)


class TestFusedSolver:
    @pytest.mark.parametrize("seed,k", [(17, 4.0), (23, 3.0), (29, 2.5)])
    def test_matches_xla_solver(self, seed, k):
        kw = dict(KW, threshold_std_factor=k)
        (tx, ax), (tp, ap) = both(series(4000, seed), **kw)
        np.testing.assert_array_equal(ax, ap)
        np.testing.assert_allclose(tp, tx, rtol=1e-4, equal_nan=True)

    def test_pure_noise_marginal_crossings(self):
        kw = dict(
            threshold_std_factor=2.5,
            window_blocks=200,
            freeze_blocks_before=5,
            freeze_blocks_after=30,
            fixed_threshold_blocks=20,
        )
        (_, ax), (_, ap) = both(series(5000, 99, n_bursts=0), **kw)
        np.testing.assert_array_equal(ax, ap)

    @pytest.mark.parametrize(
        "n,window",
        [
            (100, 50),  # shorter than one 128-lane row
            (129, 200),  # window longer than the series
            (1024, 128),  # window == exactly one row
            (2047, 601),  # odd length, window crossing a row boundary
        ],
    )
    def test_layout_edges(self, n, window):
        kw = dict(
            threshold_std_factor=2.0,
            window_blocks=window,
            freeze_blocks_before=3,
            freeze_blocks_after=10,
            fixed_threshold_blocks=5,
        )
        (_, ax), (_, ap) = both(series(n, n, n_bursts=2, amp=6.0), **kw)
        np.testing.assert_array_equal(ax, ap)

    def test_minimal_freeze_params(self):
        kw = dict(
            threshold_std_factor=3.0,
            window_blocks=128,
            freeze_blocks_before=0,
            freeze_blocks_after=1,
            fixed_threshold_blocks=1,
        )
        (_, ax), (_, ap) = both(series(1024, 3, n_bursts=6), **kw)
        np.testing.assert_array_equal(ax, ap)

    def test_randomized_parameter_sweep(self):
        # differential fuzz: random parameter draws must keep the fused
        # kernel bit-equal to the XLA solver on the above mask
        rng = np.random.default_rng(2026)
        for trial in range(6):
            n = int(rng.integers(300, 3000))
            kw = dict(
                threshold_std_factor=float(rng.uniform(1.5, 5.0)),
                window_blocks=int(rng.integers(16, max(n // 2, 17))),
                freeze_blocks_before=int(rng.integers(0, 30)),
                freeze_blocks_after=int(rng.integers(1, 200)),
                fixed_threshold_blocks=int(rng.integers(1, 100)),
            )
            d = rng.standard_normal(n).astype(np.float32)
            for s in rng.integers(10, n - 10, size=rng.integers(0, 12)):
                d[s : s + int(rng.integers(1, 8))] += float(rng.uniform(4, 10))
            (_, ax), (_, ap) = both(d, **kw)
            np.testing.assert_array_equal(ax, ap, err_msg=f"trial {trial} kw={kw}")

    def test_capacity_guard(self):
        with pytest.raises(ValueError):
            adaptive_thresholds_fused(
                jnp.zeros(MAX_FUSED_BLOCKS + 1, jnp.float32), **KW
            )


class TestChunkedFused:
    """Exact chunked execution for series beyond the VMEM capacity
    (MAX_FUSED_BLOCKS shrunk via monkeypatch so chunking kicks in)."""

    def run_chunked(self, d, monkeypatch, cap=64, limit=1500, **kw):
        import meteor_scatter_tpu.ops.pallas.adaptive_kernel as ak
        from meteor_scatter_tpu.models.adaptive import _detect_adaptive_fused

        monkeypatch.setattr(ak, "MAX_FUSED_BLOCKS", limit)
        return _detect_adaptive_fused(jnp.asarray(d), cap=cap, interpret=True, **kw)

    def test_matches_unchunked(self, monkeypatch):
        kw = dict(KW, threshold_std_factor=3.0)
        d = series(5000, 7, n_bursts=18)
        thr_x, ab_x = adaptive_thresholds_parallel(jnp.asarray(d), **kw)
        ev_x = events_from_mask(ab_x, jnp.asarray(d), cap=64)
        ev_c, thr_c = self.run_chunked(d, monkeypatch, **kw)
        np.testing.assert_array_equal(
            np.asarray(ab_x), np.asarray(jnp.asarray(d) > thr_c)
        )
        np.testing.assert_allclose(
            np.asarray(thr_c), np.asarray(thr_x), rtol=1e-4, equal_nan=True
        )
        c = int(ev_x.count)
        assert int(ev_c.count) == c
        np.testing.assert_array_equal(np.asarray(ev_c.start)[:c], np.asarray(ev_x.start)[:c])
        np.testing.assert_array_equal(np.asarray(ev_c.stop)[:c], np.asarray(ev_x.stop)[:c])
        np.testing.assert_allclose(
            np.asarray(ev_c.db_mean)[:c], np.asarray(ev_x.db_mean)[:c], rtol=1e-4
        )

    def test_run_straddling_chunk_seam(self, monkeypatch):
        # chunk = limit - window = 1200; put a strong run across block 1200
        kw = dict(KW, threshold_std_factor=3.0)
        d = series(3000, 11, n_bursts=0)
        d[1195:1210] += 9.0
        d[400:404] += 9.0
        thr_x, ab_x = adaptive_thresholds_parallel(jnp.asarray(d), **kw)
        ev_x = events_from_mask(ab_x, jnp.asarray(d), cap=16)
        ev_c, thr_c = self.run_chunked(d, monkeypatch, cap=16, **kw)
        c = int(ev_x.count)
        assert int(ev_c.count) == c
        np.testing.assert_array_equal(np.asarray(ev_c.start)[:c], np.asarray(ev_x.start)[:c])
        np.testing.assert_array_equal(np.asarray(ev_c.stop)[:c], np.asarray(ev_x.stop)[:c])
        # the straddling run must appear exactly once, merged
        starts = np.asarray(ev_c.start)[:c]
        assert (starts == 1195).sum() == 1

    def test_cap_contract_after_chunk_merge(self, monkeypatch):
        # many isolated runs across 3 chunks with a tiny cap: the merged
        # buffer must come back truncated to the requested cap with count
        # <= cap and the overflow flag set (same contract as the
        # single-launch / parallel paths)
        kw = dict(KW, threshold_std_factor=3.0)
        d = series(4000, 13, n_bursts=0)
        for s in range(100, 3900, 300):
            d[s : s + 3] += 9.0
        cap = 4
        ev_c, _ = self.run_chunked(d, monkeypatch, cap=cap, **kw)
        assert ev_c.capacity == cap
        assert int(ev_c.count) <= cap
        assert bool(ev_c.overflow)
        # the first `cap` events survive in order
        ev_x, _ = self.run_chunked(d, monkeypatch, cap=64, **kw)
        np.testing.assert_array_equal(
            np.asarray(ev_c.start), np.asarray(ev_x.start)[:cap]
        )


class TestEventsFromRunSums:
    @pytest.mark.parametrize("seed", [17, 23])
    def test_matches_events_from_mask(self, seed):
        d = series(4000, seed)
        _, above, s_incl, csm = adaptive_solver_fused(
            jnp.asarray(d), interpret=True, **KW
        )
        ev_new = events_from_run_sums(s_incl, csm, above, cap=64)
        ev_old = events_from_mask(above, jnp.asarray(d), cap=64)
        assert int(ev_new.count) == int(ev_old.count)
        c = int(ev_old.count)
        np.testing.assert_array_equal(
            np.asarray(ev_new.start)[:c], np.asarray(ev_old.start)[:c]
        )
        np.testing.assert_array_equal(
            np.asarray(ev_new.stop)[:c], np.asarray(ev_old.stop)[:c]
        )
        np.testing.assert_allclose(
            np.asarray(ev_new.db_mean)[:c], np.asarray(ev_old.db_mean)[:c], rtol=1e-5
        )
        assert bool(ev_new.overflow) == bool(ev_old.overflow)

    def test_overflow_and_empty(self):
        d = series(4000, 17)
        _, above, s_incl, csm = adaptive_solver_fused(
            jnp.asarray(d), interpret=True, **KW
        )
        n_runs = int(events_from_mask(above, jnp.asarray(d), cap=1024).count)
        ev = events_from_run_sums(s_incl, csm, above, cap=max(n_runs - 1, 1))
        assert bool(ev.overflow)
        quiet = series(1000, 5, n_bursts=0) * 0.01
        _, ab_q, s_q, c_q = adaptive_solver_fused(jnp.asarray(quiet), interpret=True, **KW)
        ev_q = events_from_run_sums(s_q, c_q, ab_q, cap=16)
        ev_q_ref = events_from_mask(ab_q, jnp.asarray(quiet), cap=16)
        assert int(ev_q.count) == int(ev_q_ref.count)


class TestVmappedBatch:
    def test_vmap_equals_per_channel(self):
        """bench.py --multi vmaps the fused solver over channels; the
        batching rule turns the carry operands into (batch, ...) blocks, so
        they must live in VMEM with Mosaic-tileable (8, 128) shapes — the
        former (2,) SMEM carries lowered under vmap to (Squeezed(), 2) SMEM
        blocks Mosaic rejects (found by the first full-surface bench
        capture, 2026-08-21).  Pin vmap == per-channel here."""
        import jax

        C = 4
        ds = np.stack([series(2000, 30 + c) for c in range(C)])
        thr_b, ab_b, s_b, c_b = jax.vmap(
            lambda d: adaptive_solver_fused(d, interpret=True, **KW)
        )(jnp.asarray(ds))
        for c in range(C):
            thr, ab, s_incl, csm = adaptive_solver_fused(
                jnp.asarray(ds[c]), interpret=True, **KW
            )
            np.testing.assert_array_equal(np.asarray(ab_b)[c], np.asarray(ab))
            np.testing.assert_array_equal(np.asarray(thr_b)[c], np.asarray(thr))
            np.testing.assert_array_equal(np.asarray(s_b)[c], np.asarray(s_incl))
            np.testing.assert_array_equal(np.asarray(c_b)[c], np.asarray(csm))
