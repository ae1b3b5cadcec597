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
