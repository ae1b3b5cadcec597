"""Spectrogram-image detector tests (ML-path equivalent, SURVEY.md §7
"Image-path equivalence": judged at event/count level)."""

import numpy as np
import scipy.ndimage

import jax.numpy as jnp

from meteor_scatter_tpu.models.image import (
    _connected_components,
    cluster_bursts,
    corner_keypoints,
    detect_and_cluster_bursts,
    render_intensity,
    spectrogram_image,
)

FS = 5000.0


def segment_with_bursts(bursts, dur=30.0, seed=0, noise=0.3):
    """bursts: list of (t_start, t_len, freq, amp)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(FS * dur)) / FS
    x = rng.standard_normal(len(t)) * noise
    for s, l, f, a in bursts:
        m = (t >= s) & (t < s + l)
        x[m] += a * np.sin(2 * np.pi * f * t[m])
    return x.astype(np.float32)


class TestConnectedComponents:
    def test_matches_scipy_label(self):
        rng = np.random.default_rng(1)
        for _ in range(3):
            mask = rng.random((40, 60)) < 0.25
            got = np.asarray(_connected_components(jnp.asarray(mask)))
            want, n = scipy.ndimage.label(mask, structure=np.ones((3, 3)))
            # same partition: one-to-one mapping between label sets
            assert (got[~mask] == mask.size).all()
            seen = {}
            for g, w in zip(got[mask].ravel(), want[mask].ravel()):
                if w in seen:
                    assert seen[w] == g
                else:
                    assert g not in seen.values()
                    seen[w] = g
            assert len(seen) == n


class TestSpectrogramImage:
    def test_noise_floor_cut(self):
        x = segment_with_bursts([(10.0, 2.0, 1000.0, 3.0)])
        img = spectrogram_image(jnp.asarray(x), FS)
        assert img.db.shape[0] > 0
        # burst pixels must be visible above the cut, quiet region mostly not
        mask = np.asarray(img.db > img.vmin)
        frames = mask.shape[1]
        burst_cols = slice(int(10.0 / img.hop_sec), int(12.0 / img.hop_sec))
        quiet_cols = slice(int(20.0 / img.hop_sec), int(29.0 / img.hop_sec))
        assert mask[:, burst_cols].any()
        assert mask[:, quiet_cols].mean() < 0.05
        assert frames == int((30 * FS - 2048) // 1024 + 1)


class TestClusterBursts:
    def test_counts_and_critical(self):
        # one long (critical) and one short (non-critical) burst, separated
        # by >> eps in time
        x = segment_with_bursts(
            [(5.0, 2.0, 1000.0, 3.0), (20.0, 0.4, 1100.0, 6.0)]
        )
        img, bursts = detect_and_cluster_bursts(jnp.asarray(x), FS)
        assert int(bursts.count) == 2
        assert int(bursts.n_critical) == 1
        assert int(bursts.n_non_critical) == 1

    def test_empty_segment(self):
        x = segment_with_bursts([], noise=0.2, seed=3)
        img, bursts = detect_and_cluster_bursts(jnp.asarray(x), FS)
        assert int(bursts.count) == 0

    def test_eps_merging(self):
        # two bursts 0.5 s apart (< eps ≈ 1.5 s) merge into one cluster
        x = segment_with_bursts(
            [(10.0, 0.5, 1000.0, 3.0), (11.0, 0.5, 1000.0, 3.0)]
        )
        _, bursts = detect_and_cluster_bursts(jnp.asarray(x), FS)
        assert int(bursts.count) == 1
        # merged bbox spans both -> critical
        assert int(bursts.n_critical) == 1

    def test_min_samples_rejects_specks(self):
        x = segment_with_bursts([(15.0, 0.8, 1000.0, 3.0)], seed=5)
        img = spectrogram_image(jnp.asarray(x), FS)
        b_all = cluster_bursts(img, min_samples=1)
        b_strict = cluster_bursts(img, min_samples=5)
        assert int(b_strict.count) <= int(b_all.count)
        assert int(b_strict.count) >= 1


class TestCornerKeypoints:
    def test_keypoints_concentrate_on_burst(self):
        x = segment_with_bursts([(10.0, 2.0, 1000.0, 4.0)])
        img = spectrogram_image(jnp.asarray(x), FS)
        kp = np.asarray(corner_keypoints(img, nfeatures=500))
        assert kp.sum() > 0
        assert kp.sum() <= 500  # ORB's retention cap
        # keypoints live on/near the burst, not the quiet region
        burst_cols = slice(int(9.5 / img.hop_sec), int(12.5 / img.hop_sec))
        quiet_cols = slice(int(20.0 / img.hop_sec), int(29.0 / img.hop_sec))
        assert kp[:, burst_cols].sum() > kp[:, quiet_cols].sum()

    def test_corner_mode_detects_and_classifies(self):
        x = segment_with_bursts(
            [(5.0, 2.0, 1000.0, 4.0), (20.0, 0.4, 1100.0, 6.0)]
        )
        _, bursts = detect_and_cluster_bursts(jnp.asarray(x), FS, keypoint_mode="corner")
        assert int(bursts.count) >= 1
        assert int(bursts.n_critical) >= 1  # 2 s burst stays critical

    def test_corner_mode_quiet_segment(self):
        x = segment_with_bursts([], noise=0.2, seed=7)
        _, bursts = detect_and_cluster_bursts(jnp.asarray(x), FS, keypoint_mode="corner")
        # DBSCAN min_samples screens scattered noise corners
        assert int(bursts.count) <= 1

    def test_render_intensity_range(self):
        x = segment_with_bursts([(10.0, 1.0, 1000.0, 3.0)])
        img = spectrogram_image(jnp.asarray(x), FS)
        g = np.asarray(render_intensity(img))
        assert g.min() >= 0.0 and g.max() <= 255.0
        assert g.max() > 20.0  # burst clearly above the black cut
