"""Unit tests for the halo exchange primitive, timing utils, and config
coercion edge cases."""

import configparser
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from meteor_scatter_tpu.parallel.halo import halo_exchange
from meteor_scatter_tpu.parallel.mesh import TIME_AXIS, make_mesh
from meteor_scatter_tpu.utils.timing import PhaseTimer, Throughput


class TestHaloExchange:
    def run_halo(self, x, lh, rh, n_dev=4):
        mesh = make_mesh(n_station=1, n_time=n_dev)
        fn = jax.shard_map(
            lambda xl: halo_exchange(xl[0], lh, rh, TIME_AXIS)[None],
            mesh=mesh,
            in_specs=P("station", TIME_AXIS),
            out_specs=P("station", TIME_AXIS),
        )
        xs = jax.device_put(
            x[None, :], jax.sharding.NamedSharding(mesh, P("station", TIME_AXIS))
        )
        out = np.asarray(fn(xs))[0]
        per = (len(x) // n_dev) + lh + rh
        return out.reshape(n_dev, per)

    def test_left_and_right_halos(self):
        x = np.arange(16, dtype=np.float32)
        shards = self.run_halo(jnp.asarray(x), lh=2, rh=2)
        # interior shard 1 local range is [4..8); halos from neighbors
        np.testing.assert_array_equal(shards[1], [2, 3, 4, 5, 6, 7, 8, 9])
        # edge shards get zero padding
        np.testing.assert_array_equal(shards[0][:2], [0, 0])
        np.testing.assert_array_equal(shards[3][-2:], [0, 0])
        np.testing.assert_array_equal(shards[0][2:6], [0, 1, 2, 3])

    def test_left_only(self):
        x = np.arange(8, dtype=np.float32)
        shards = self.run_halo(jnp.asarray(x), lh=1, rh=0, n_dev=2)
        np.testing.assert_array_equal(shards[0], [0, 0, 1, 2, 3])
        np.testing.assert_array_equal(shards[1], [3, 4, 5, 6, 7])


class TestTiming:
    def test_phase_timer_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("a"):
            time.sleep(0.01)
        assert t.counts["a"] == 2
        assert t.totals["a"] >= 0.02
        assert "a: total" in t.summary()

    def test_throughput(self):
        tp = Throughput()
        tp.add(1000, 0.5)
        tp.add(1000, 0.5)
        assert tp.samples_per_sec == 2000


class TestConfigCoercion:
    def test_ini_types(self):
        from meteor_scatter_tpu.config import from_ini

        cfg = from_ini(
            """
[detection]
proc_block_sec = 0.5
n_fft = 2048
signal_freq = 1020
[dashboard]
debug = true
port = 8080
[bandpower]
freq_band = 990,1010
"""
        )
        assert cfg.detection.proc_block_sec == 0.5
        assert cfg.detection.n_fft == 2048
        assert cfg.dashboard.debug is True
        assert cfg.dashboard.port == 8080
        assert cfg.bandpower.freq_band == (990.0, 1010.0)
        # analyze.band must track the [bandpower] section
        assert cfg.analyze.band.freq_band == (990.0, 1010.0)

    def test_save_load_roundtrip(self, tmp_path):
        from meteor_scatter_tpu.config import FrameworkConfig, load_config, save_config

        p = str(tmp_path / "c.ini")
        save_config(FrameworkConfig(), p)
        cfg = load_config(p)
        assert cfg == FrameworkConfig()
