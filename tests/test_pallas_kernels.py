"""Pallas kernel parity (interpreter mode on CPU; real hardware exercised
by bench.py / the verify drive)."""

import numpy as np

import jax.numpy as jnp

from meteor_scatter_tpu.ops.bandpower import delta_power_db
from meteor_scatter_tpu.ops.pallas.bandpower_kernel import fused_bandpower_delta

FS = 6000
NFFT = 1024
BLOCK = 1200
FB = (993.0, 1013.0)
NB = (690.0, 710.0)


def test_fused_kernel_matches_xla_path():
    rng = np.random.default_rng(0)
    t = np.arange(FS * 10) / FS
    x = rng.standard_normal(len(t)).astype(np.float32) * 0.5
    m = (t >= 3.0) & (t < 4.0)
    x[m] += 2.0 * np.sin(2 * np.pi * 1003.0 * t[m]).astype(np.float32)

    want_b, want_n, want_d = delta_power_db(jnp.asarray(x), FS, NFFT, BLOCK, FB, NB)
    got_b, got_n, got_d = fused_bandpower_delta(
        jnp.asarray(x), FS, NFFT, BLOCK, FB, NB, interpret=True
    )
    assert got_b.shape == want_b.shape
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), atol=4e-3)


def test_non_multiple_of_tile():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(FS * 7).astype(np.float32)  # 35 blocks, tile 256
    want = delta_power_db(jnp.asarray(x), FS, NFFT, BLOCK, FB, NB)[2]
    got = fused_bandpower_delta(jnp.asarray(x), FS, NFFT, BLOCK, FB, NB, interpret=True)[2]
    assert got.shape == want.shape == (35,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=4e-3)
