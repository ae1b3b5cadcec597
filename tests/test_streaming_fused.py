"""Fused Pallas streaming-machine solver vs the scan.

Contract (`models/streaming.py::stream_scan_fused_batch`):

* vs **vmapped** ``stream_scan``: bit-exact everywhere — same base-
  threshold prologue, op-for-op body mirror, identical compaction;
* vs **unbatched** ``stream_scan``: additionally XLA may FMA-contract
  ``i·bs − t0`` in the scalar graph, shifting the reported ``duration``
  (and one ULP of ``tr_sumsq``/``db_std``) — decisions (boundaries, lock
  windows, counts, accepts) stay comparison/integer-exact.

Kernel: `ops/pallas/stream_kernel.py` (interpret mode on CPU; the grid
walks 512-block time chunks with the machine state carried in VMEM
scratch, so multi-chunk series exercise the revolver carry).
"""

import numpy as np

import jax
import jax.numpy as jnp

from meteor_scatter_tpu.models.streaming import (
    StreamEvents,
    StreamState,
    stream_init,
    stream_init_batch,
    stream_scan,
    stream_scan_fused,
    stream_scan_fused_batch,
)

from tests.test_streaming_jump import (
    CLOSE_EV,
    CLOSE_STATE,
    EXACT_EV,
    EXACT_STATE,
    default_cfg,
    make_series,
)


def assert_bitexact_vs_vmapped_scan(scfg, C, n, seed, bursts=()):
    ons, pms = [], []
    for c in range(C):
        on, pm = make_series(n, seed + c, bursts)
        ons.append(on)
        pms.append(pm)
    on = jnp.stack(ons)
    pm = jnp.stack(pms)
    st0 = stream_init_batch(scfg, C)
    st_s, ev_s, thr_s = jax.vmap(lambda s, o, p: stream_scan(scfg, s, o, p))(
        st0, on, pm
    )
    st_f, ev_f, thr_f = stream_scan_fused_batch(scfg, st0, on, pm, interpret=True)
    np.testing.assert_array_equal(np.asarray(thr_s), np.asarray(thr_f))
    for f in StreamEvents._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ev_s, f)), np.asarray(getattr(ev_f, f)),
            err_msg=f"events.{f}",
        )
    for f in StreamState._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st_s, f)), np.asarray(getattr(st_f, f)),
            err_msg=f"state.{f}",
        )
    return ev_f


class TestFusedVsVmappedScan:
    def test_quiet(self):
        scfg = default_cfg()
        ev = assert_bitexact_vs_vmapped_scan(scfg, 3, 700, seed=0)
        assert int(np.asarray(ev.count).sum()) == 0

    def test_bursts(self):
        scfg = default_cfg()
        ev = assert_bitexact_vs_vmapped_scan(
            scfg, 4, 900, seed=1, bursts=((120, 140, 8.0), (400, 430, 9.0))
        )
        assert np.asarray(ev.count).min() >= 1

    def test_multi_chunk_grid(self):
        # > 512 blocks crosses the kernel's CHUNK revolver boundary twice
        scfg = default_cfg()
        assert_bitexact_vs_vmapped_scan(
            scfg, 2, 1300, seed=2, bursts=((500, 530, 8.0), (1000, 1030, 8.0))
        )

    def test_rejected_events_and_locks(self):
        scfg = default_cfg(min_mean_db=6.0)
        assert_bitexact_vs_vmapped_scan(
            scfg, 3, 800, seed=3,
            bursts=((100, 104, 3.0), (300, 330, 12.0), (352, 380, 12.0)),
        )

    def test_fuzz(self):
        scfg = default_cfg()
        rng = np.random.default_rng(11)
        for trial in range(4):
            n = int(rng.integers(300, 1200))
            bursts = tuple(
                (int(b), int(b) + int(rng.integers(2, 40)), float(rng.uniform(2, 10)))
                for b in rng.integers(60, n - 60, size=rng.integers(0, 5))
            )
            assert_bitexact_vs_vmapped_scan(scfg, 2, n, seed=100 + trial, bursts=bursts)


class TestFusedSingleStream:
    def test_vs_unbatched_scan_fma_tolerance(self):
        scfg = default_cfg()
        on, pm = make_series(900, 7, bursts=((150, 180, 8.0), (500, 540, 9.0)))
        st_s, ev_s, thr_s = stream_scan(scfg, stream_init(scfg), on, pm)
        st_f, ev_f, thr_f = stream_scan_fused(
            scfg, stream_init(scfg), on, pm, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(thr_s), np.asarray(thr_f))
        assert int(ev_s.count) == int(ev_f.count)
        c = int(ev_s.count)
        for f in EXACT_EV:
            np.testing.assert_array_equal(
                np.asarray(getattr(ev_s, f))[:c], np.asarray(getattr(ev_f, f))[:c],
                err_msg=f"events.{f}",
            )
        for f in CLOSE_EV:
            np.testing.assert_allclose(
                np.asarray(getattr(ev_s, f))[:c], np.asarray(getattr(ev_f, f))[:c],
                rtol=1e-5, atol=1e-5, err_msg=f"events.{f}",
            )
        for f in EXACT_STATE:
            np.testing.assert_array_equal(
                np.asarray(getattr(st_s, f)), np.asarray(getattr(st_f, f)),
                err_msg=f"state.{f}",
            )
        for f in CLOSE_STATE:
            np.testing.assert_allclose(
                np.asarray(getattr(st_s, f)), np.asarray(getattr(st_f, f)),
                rtol=1e-5, atol=1e-5, err_msg=f"state.{f}",
            )
        np.testing.assert_array_equal(np.asarray(st_s.ring), np.asarray(st_f.ring))

    def test_chunked_state_carry(self):
        # three chunks through the fused path == one whole-series fused run
        scfg = default_cfg()
        on, pm = make_series(900, 9, bursts=((280, 310, 8.0), (600, 640, 9.0)))
        st_w, ev_w, thr_w = stream_scan_fused(
            scfg, stream_init(scfg), on, pm, interpret=True
        )
        st = stream_init(scfg)
        thrs = []
        counts = 0
        for sl in (slice(0, 300), slice(300, 600), slice(600, 900)):
            st, ev, thr = stream_scan_fused(scfg, st, on[sl], pm[sl], interpret=True)
            thrs.append(np.asarray(thr))
            counts += int(ev.count)
        for f in StreamState._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(st_w, f)), np.asarray(getattr(st, f)),
                err_msg=f"state.{f}",
            )
        assert counts == int(ev_w.count)
        np.testing.assert_array_equal(np.concatenate(thrs), np.asarray(thr_w))

    def test_stream_process_impl_fused(self):
        from meteor_scatter_tpu.config import DetectionConfig
        from meteor_scatter_tpu.models.streaming import stream_init as si
        from meteor_scatter_tpu.models.streaming import (
            StreamConfig,
            stream_process,
        )

        fs = 4000
        cfg = DetectionConfig(
            signal_freq=1000.0,
            detection_db_over_noise_mean_min=1.0,
            detection_dur_min_sec=0.5,
        )
        scfg = StreamConfig.from_config(cfg)
        rng = np.random.default_rng(4)
        t = np.arange(int(fs * 120)) / fs
        x = rng.standard_normal(len(t)).astype(np.float32) * 0.05
        m = (t >= 40.0) & (t < 41.2)
        x[m] += 0.6 * np.sin(2 * np.pi * 1000.0 * t[m]).astype(np.float32)
        x = jnp.asarray(x)
        _, ev_a, _ = stream_process(cfg, si(scfg), x, fs, front="welch", impl="scan")
        _, ev_b, _ = stream_process(cfg, si(scfg), x, fs, front="welch", impl="fused")
        assert int(ev_a.count) == int(ev_b.count) == 1
        np.testing.assert_array_equal(
            np.asarray(ev_a.time_start), np.asarray(ev_b.time_start)
        )
        np.testing.assert_array_equal(
            np.asarray(ev_a.time_stop), np.asarray(ev_b.time_stop)
        )


class TestFusedManyChannels:
    def test_over_128_channels_split(self):
        scfg = default_cfg()
        C, n = 130, 400
        rng = np.random.default_rng(6)
        on = jnp.asarray(rng.standard_normal((C, n)).astype(np.float32) * 0.3)
        on = on.at[:, 100:120].add(8.0)
        pm = jnp.asarray(rng.standard_normal((C, n)).astype(np.float32) - 80.0)
        st0 = stream_init_batch(scfg, C)
        st_s, ev_s, thr_s = jax.vmap(lambda s, o, p: stream_scan(scfg, s, o, p))(
            st0, on, pm
        )
        st_f, ev_f, thr_f = stream_scan_fused_batch(scfg, st0, on, pm, interpret=True)
        np.testing.assert_array_equal(np.asarray(thr_s), np.asarray(thr_f))
        np.testing.assert_array_equal(np.asarray(ev_s.count), np.asarray(ev_f.count))
        np.testing.assert_array_equal(
            np.asarray(ev_s.time_start), np.asarray(ev_f.time_start)
        )
