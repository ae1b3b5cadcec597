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

    def test_cap_overflow_flagged(self):
        """More clusters than the cap must set the overflow flag (counts
        become lower bounds) instead of silently undercounting; within
        capacity the flag stays clear (fixed-capacity buffer convention)."""
        x = segment_with_bursts(
            [(2.0 + 3.0 * k, 0.4, 900.0 + 40.0 * k, 6.0) for k in range(8)]
        )
        img, _ = detect_and_cluster_bursts(jnp.asarray(x), FS)
        full = cluster_bursts(img, min_samples=1)
        assert int(full.count) >= 5 and not bool(full.overflow)
        small = cluster_bursts(img, min_samples=1, cap=2)
        assert bool(small.overflow)
        assert int(small.count) <= 2

    def test_min_samples_rejects_specks(self):
        x = segment_with_bursts([(15.0, 0.8, 1000.0, 3.0)], seed=5)
        img = spectrogram_image(jnp.asarray(x), FS)
        b_all = cluster_bursts(img, min_samples=1)
        b_strict = cluster_bursts(img, min_samples=5)
        assert int(b_strict.count) <= int(b_all.count)
        assert int(b_strict.count) >= 1


def _unit_px_image(h, w):
    """A SpectrogramImage whose grid pixels are exactly 1×1 reference
    rendered pixels (hop_sec = 25/496 s, hz_per_bin = 400/365 Hz), so
    oracle_dbscan runs on raw (col, row) coordinates with eps=30."""
    from meteor_scatter_tpu.models.image import (
        _REF_PX_PER_HZ,
        _REF_PX_PER_SEC,
        SpectrogramImage,
    )

    return SpectrogramImage(
        db=jnp.zeros((h, w), jnp.float32),
        vmin=jnp.asarray(1.0, jnp.float32),  # threshold keypoints: none
        freqs=np.arange(h) / _REF_PX_PER_HZ,
        hop_sec=1.0 / _REF_PX_PER_SEC,
        hz_per_bin=1.0 / _REF_PX_PER_HZ,
    )


def _oracle_counts(mask, eps=30.0, min_samples=5, px_f=1.0, px_t=1.0,
                   critical_px=5.0):
    """Cluster count + critical count from the clean-room DBSCAN oracle on
    the mask's keypoint coordinates (reference-px metric)."""
    from oracles import oracle_dbscan

    fi, ti = np.nonzero(mask)
    pts = np.stack([ti * px_t, fi * px_f], axis=1)
    labels = oracle_dbscan(pts, eps, min_samples)
    n_clusters = int(labels.max()) + 1 if len(labels) else 0
    n_crit = 0
    for c in range(n_clusters):
        xs = pts[labels == c, 0]
        if xs.max() - xs.min() >= critical_px:
            n_crit += 1
    return n_clusters, n_crit


class TestDbscanOracle:
    """VERDICT r4 item 4: quantify the image path against a clean-room
    DBSCAN oracle on (a) synthetic clouds incl. the divergence cases and
    (b) the repo's own corner-keypoint masks from synthetic bursts."""

    def _run_ours(self, mask, img, **kw):
        b = cluster_bursts(img, keypoint_mask=jnp.asarray(mask), **kw)
        return int(b.count), int(b.n_critical)

    def test_dense_blobs_agree(self):
        mask = np.zeros((80, 200), bool)
        mask[10:13, 10:18] = True   # 3x8 blob, width 7 px -> critical
        mask[50:53, 150:153] = True  # 3x3 blob, width 2 px -> non-critical
        img = _unit_px_image(*mask.shape)
        ours = self._run_ours(mask, img)
        assert ours == _oracle_counts(mask) == (2, 1)

    def test_sparse_bridge_no_longer_chains(self):
        # two dense one-row blobs 60 px apart with a lone bridge point
        # equidistant (30 px) from both edges: the bridge has only 3
        # eps-neighbors (not core), so DBSCAN keeps TWO clusters.  The
        # pre-round-5 box-dilation linking chained them into one — the
        # exact divergence VERDICT r4 documented.
        mask = np.zeros((20, 120), bool)
        mask[10, 0:8] = True      # blob A cols 0..7
        mask[8:13, 2:5] = True    #  ... fattened so every A point is core
        mask[10, 37] = True       # bridge: 30 px from col 7 and col 67
        mask[10, 67:75] = True    # blob B
        mask[8:13, 69:72] = True
        img = _unit_px_image(*mask.shape)
        n_oracle, _ = _oracle_counts(mask)
        assert n_oracle == 2
        n_core, _ = self._run_ours(mask, img, core_gate=True)
        assert n_core == 2  # matches DBSCAN
        n_legacy, _ = self._run_ours(mask, img, core_gate=False)
        assert n_legacy == 1  # the documented legacy divergence

    def test_box_corner_pair_uses_l2_metric(self):
        # nearest corners offset (28, 28): L-inf 28 <= eps -> the legacy box
        # linking merged them; L2 = 39.6 > eps -> DBSCAN (and the round-5
        # elliptical linking) keeps them separate.
        mask = np.zeros((80, 80), bool)
        mask[10:13, 10:13] = True
        mask[40:43, 40:43] = True  # corner (12,12) -> (40,40): d=(28,28)
        img = _unit_px_image(*mask.shape)
        n_oracle, _ = _oracle_counts(mask)
        assert n_oracle == 2
        n_core, _ = self._run_ours(mask, img, core_gate=True)
        assert n_core == 2
        n_legacy, _ = self._run_ours(mask, img, core_gate=False)
        assert n_legacy == 1

    def test_fuzzed_clouds_count_agreement(self):
        # random clouds across densities: cluster count and critical count
        # must match the oracle exactly (unit-px geometry, integer coords)
        rng = np.random.default_rng(42)
        for trial in range(6):
            mask = np.zeros((60, 150), bool)
            n_pts = rng.integers(10, 60)
            fi = rng.integers(0, 60, n_pts)
            ti = rng.integers(0, 150, n_pts)
            mask[fi, ti] = True
            # a couple of dense seeds so clusters actually form
            for _ in range(rng.integers(1, 4)):
                r0, c0 = rng.integers(0, 55), rng.integers(0, 140)
                mask[r0 : r0 + rng.integers(2, 5), c0 : c0 + rng.integers(2, 9)] = True
            img = _unit_px_image(*mask.shape)
            ours = self._run_ours(mask, img)
            want = _oracle_counts(mask)
            assert ours == want, f"trial {trial}: ours={ours} oracle={want}"

    def test_fuzzed_params_count_agreement(self):
        # sweep min_samples and eps too: the core rule, the eps-graph
        # linking, and the core-component validity rule must track the
        # oracle across parameterizations, including sparse clouds where
        # shared-border division between clusters matters
        rng = np.random.default_rng(1234)
        for trial in range(12):
            min_samples = int(rng.choice([2, 3, 5, 8]))
            eps = float(rng.choice([12.0, 20.0, 30.0]))
            mask = np.zeros((50, 120), bool)
            n_pts = rng.integers(15, 90)
            mask[rng.integers(0, 50, n_pts), rng.integers(0, 120, n_pts)] = True
            for _ in range(rng.integers(0, 3)):
                r0, c0 = rng.integers(0, 45), rng.integers(0, 110)
                mask[r0 : r0 + rng.integers(2, 6), c0 : c0 + rng.integers(2, 7)] = True
            img = _unit_px_image(*mask.shape)
            ours = self._run_ours(
                mask, img, eps_px=eps, min_samples=min_samples
            )
            want = _oracle_counts(mask, eps=eps, min_samples=min_samples)
            assert ours == want, (
                f"trial {trial} (eps={eps}, min_samples={min_samples}): "
                f"ours={ours} oracle={want}"
            )

    def test_corner_keypoint_masks_match_oracle(self):
        # (b) the repo's own corner-keypoint masks from synthetic bursts,
        # compared in the real (non-unit) pixel geometry
        from meteor_scatter_tpu.models.image import _REF_PX_PER_HZ, _REF_PX_PER_SEC

        for seed, bursts in [
            (0, [(5.0, 2.0, 1000.0, 4.0), (20.0, 0.4, 1100.0, 6.0)]),
            (1, [(10.0, 1.0, 950.0, 3.0)]),
            (7, []),
        ]:
            x = segment_with_bursts(bursts, seed=seed)
            img = spectrogram_image(jnp.asarray(x), FS)
            kp = np.asarray(corner_keypoints(img))
            ours = self._run_ours(kp, img)
            want = _oracle_counts(
                kp,
                px_f=img.hz_per_bin * _REF_PX_PER_HZ,
                px_t=img.hop_sec * _REF_PX_PER_SEC,
            )
            assert ours == want, f"seed {seed}: ours={ours} oracle={want}"


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
