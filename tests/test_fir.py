"""FIR design / filtering / polyphase resampling / channelizer tests."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from meteor_scatter_tpu.ops.fir import (
    channelize,
    fir_filter,
    firwin_bandpass,
    firwin_lowpass,
    polyphase_decimate,
    resample_poly,
)

RNG = np.random.default_rng(0)


class TestFirDesign:
    def test_lowpass_matches_scipy_firwin(self):
        for taps, cut, fs in [(101, 1000.0, 8000.0), (65, 500.0, 6000.0)]:
            got = firwin_lowpass(taps, cut, fs)
            want = scipy.signal.firwin(taps, cut, fs=fs, window="hamming")
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_bandpass_response(self):
        fs = 6000.0
        h = firwin_bandpass(201, 950.0, 1050.0, fs)
        w, resp = scipy.signal.freqz(h, fs=fs, worN=2048)
        mag = np.abs(resp)
        # unity in band center, strong rejection far out
        assert abs(mag[np.argmin(np.abs(w - 1000.0))] - 1.0) < 0.01
        assert mag[np.argmin(np.abs(w - 500.0))] < 1e-3
        assert mag[np.argmin(np.abs(w - 2000.0))] < 1e-3


class TestFilter:
    def test_same_mode_matches_numpy_convolve(self):
        x = RNG.standard_normal(500).astype(np.float32)
        h = firwin_lowpass(31, 0.2)
        got = np.asarray(fir_filter(jnp.asarray(x), h, mode="same"))
        want = np.convolve(x, h, mode="same")
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_valid_and_full(self):
        x = RNG.standard_normal(200).astype(np.float32)
        h = firwin_lowpass(15, 0.3)
        for mode in ("valid", "full"):
            got = np.asarray(fir_filter(jnp.asarray(x), h, mode=mode))
            want = np.convolve(x, h, mode=mode)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_decimate_equals_filter_then_slice(self):
        x = RNG.standard_normal(1000).astype(np.float32)
        h = firwin_lowpass(41, 0.1)
        q = 4
        got = np.asarray(polyphase_decimate(jnp.asarray(x), h, q))
        want = np.convolve(x, h, mode="same")[::q]
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestResamplePoly:
    @pytest.mark.parametrize("up,down", [(1, 2), (2, 3), (3, 1), (48, 6)])
    def test_tone_preserved(self, up, down):
        fs = 6000.0
        t = np.arange(int(fs * 1.0)) / fs
        x = np.sin(2 * np.pi * 500.0 * t).astype(np.float32)
        y = np.asarray(resample_poly(jnp.asarray(x), up, down))
        fs2 = fs * up / down
        n_out = int(np.ceil(len(x) * up / down))
        assert y.shape == (n_out,)
        # tone frequency preserved: correlate against expected tone (skip edges)
        t2 = np.arange(n_out) / fs2
        ref = np.sin(2 * np.pi * 500.0 * t2)
        core = slice(n_out // 8, -n_out // 8)
        corr = np.corrcoef(y[core], ref[core])[0, 1]
        assert corr > 0.999

    def test_rms_preserved_on_downsample(self):
        fs = 48000.0
        t = np.arange(int(fs * 0.5)) / fs
        x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        y = np.asarray(resample_poly(jnp.asarray(x), 1, 8))
        core = slice(len(y) // 8, -len(y) // 8)
        assert abs(np.sqrt((y[core] ** 2).mean()) - 1 / np.sqrt(2)) < 0.01


class TestChannelizer:
    def test_tones_land_in_their_channels(self):
        # 2 tones at distinct RF offsets -> each channel's baseband carries
        # only its own tone (BASELINE config 4 front half)
        fs = 200_000.0
        t = np.arange(int(fs * 0.1)) / fs
        f0, f1 = 50_000.0, 80_000.0
        x = (np.sin(2 * np.pi * f0 * t) + 0.5 * np.sin(2 * np.pi * f1 * t)).astype(np.float32)
        decim = 50
        re, im = channelize(jnp.asarray(x), fs, np.array([f0, f1]), bandwidth=2000.0, decim=decim)
        y = np.asarray(re) + 1j * np.asarray(im)
        assert y.shape[0] == 2
        # own channel: strong DC-ish magnitude; other channel attenuated
        p_own = np.mean(np.abs(y[0]) ** 2)
        # channel 0 should not contain the f1 tone: check spectral purity
        spec = np.abs(np.fft.fft(y[0][50:-50]))
        peak_bin = np.argmax(spec)
        fs2 = fs / decim
        freqs = np.fft.fftfreq(len(spec), 1 / fs2)
        assert abs(freqs[peak_bin]) < 100.0  # mixed to (near) DC
        assert p_own > 0.1
        p1 = np.mean(np.abs(y[1]) ** 2)
        assert p1 > 0.02  # 0.5 amplitude tone present in its own channel

    def test_channelize_matches_complex_ddc(self):
        # exact contract: channelize == float64 mix·e^{-j2πft} → FIR 'same'
        # → decimate-by-slicing, to f32 noise
        from meteor_scatter_tpu.ops.fir import firwin_lowpass

        fs, n, bw, q, T = 48_000, 48_000, 400.0, 8, 97
        rng = np.random.default_rng(0)
        x = rng.standard_normal(n).astype(np.float32)
        freqs = np.array([1000, 7777, 12000])
        re, im = channelize(jnp.asarray(x), fs, freqs, bandwidth=bw, decim=q, numtaps=T)
        re, im = np.asarray(re), np.asarray(im)
        h = firwin_lowpass(T, bw / 2.0, fs)
        t_idx = np.arange(n, dtype=np.float64)
        for c, fc in enumerate(freqs):
            mixed = x.astype(np.float64) * np.exp(-2j * np.pi * fc * t_idx / fs)
            dec = np.convolve(mixed, h, mode="same")[::q]
            nn = min(len(dec), re.shape[1])
            scale = np.abs(dec).max()
            assert np.abs(re[c, :nn] - dec.real[:nn]).max() / scale < 1e-5
            assert np.abs(im[c, :nn] - dec.imag[:nn]).max() / scale < 1e-5

    def test_channelize_iq_matches_complex_ddc(self):
        # complex-capture contract: channelize_iq == float64 (xr+j·xi)·e^{-j2πft}
        # → FIR 'same' → decimate-by-slicing; negative centers included
        # (the lower half of an I/Q span, unreachable from a real capture)
        from meteor_scatter_tpu.ops.fir import channelize_iq, firwin_lowpass

        fs, n, bw, q, T = 48_000, 48_000, 400.0, 8, 97
        rng = np.random.default_rng(1)
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        freqs = np.array([-12_000, -1000, 7777])
        re, im = channelize_iq(
            jnp.asarray(xr), jnp.asarray(xi), fs, freqs, bandwidth=bw, decim=q, numtaps=T
        )
        re, im = np.asarray(re), np.asarray(im)
        h = firwin_lowpass(T, bw / 2.0, fs)
        t_idx = np.arange(n, dtype=np.float64)
        x = xr.astype(np.float64) + 1j * xi.astype(np.float64)
        for c, fc in enumerate(freqs):
            mixed = x * np.exp(-2j * np.pi * fc * t_idx / fs)
            dec = np.convolve(mixed, h, mode="same")[::q]
            nn = min(len(dec), re.shape[1])
            scale = np.abs(dec).max()
            assert np.abs(re[c, :nn] - dec.real[:nn]).max() / scale < 1e-5
            assert np.abs(im[c, :nn] - dec.imag[:nn]).max() / scale < 1e-5

    def test_channelize_iq_zero_imag_equals_real_path(self):
        # xi = 0 must reproduce channelize bit-for-bit (shared core)
        from meteor_scatter_tpu.ops.fir import channelize_iq

        fs, n, bw, q, T = 48_000, 12_000, 400.0, 8, 97
        rng = np.random.default_rng(2)
        xr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        freqs = np.array([1000, 7777])
        re_r, im_r = channelize(xr, fs, freqs, bandwidth=bw, decim=q, numtaps=T)
        re_q, im_q = channelize_iq(
            xr, jnp.zeros_like(xr), fs, freqs, bandwidth=bw, decim=q, numtaps=T
        )
        assert np.array_equal(np.asarray(re_r), np.asarray(re_q))
        assert np.array_equal(np.asarray(im_r), np.asarray(im_q))

    def test_preframed_equals_flat_real(self):
        # channelize_frames(frame_capture_host(x)) must be bit-identical to
        # channelize(x): the pre-framed path exists purely so the device
        # never pays the flat->framed relayout (VERDICT r4 task 1)
        from meteor_scatter_tpu.ops.fir import (
            channel_bank_plan,
            channelize_frames,
            frame_capture_host,
        )

        fs, n, bw, q, T = 48_000, 12_000, 400.0, 8, 97
        rng = np.random.default_rng(9)
        x = rng.standard_normal(n).astype(np.float32)
        freqs = np.array([1000, 7777])
        re_f, im_f = channelize(jnp.asarray(x), fs, freqs, bandwidth=bw, decim=q, numtaps=T)
        plan, tables = channel_bank_plan(n, fs, freqs, bandwidth=bw, decim=q, numtaps=T)
        f = jnp.asarray(frame_capture_host(x, plan))
        re_p, im_p = channelize_frames(f, tables, plan)
        assert np.array_equal(np.asarray(re_f), np.asarray(re_p))
        assert np.array_equal(np.asarray(im_f), np.asarray(im_p))

    def test_preframed_equals_flat_iq(self):
        from meteor_scatter_tpu.ops.fir import (
            channel_bank_plan,
            channelize_iq,
            channelize_iq_frames,
            frame_capture_host,
        )

        fs, n, bw, q, T = 48_000, 12_000, 400.0, 8, 97
        rng = np.random.default_rng(10)
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        freqs = np.array([-7777, 1000])
        re_f, im_f = channelize_iq(
            jnp.asarray(xr), jnp.asarray(xi), fs, freqs, bandwidth=bw, decim=q, numtaps=T
        )
        plan, tables = channel_bank_plan(n, fs, freqs, bandwidth=bw, decim=q, numtaps=T)
        f = jnp.asarray(frame_capture_host(np.stack([xr, xi]), plan))
        re_p, im_p = channelize_iq_frames(f, tables, plan)
        assert np.array_equal(np.asarray(re_f), np.asarray(re_p))
        assert np.array_equal(np.asarray(im_f), np.asarray(im_p))

    def test_polyphase_decimate_asymmetric_taps_convolve(self):
        # convolution (not correlation) semantics for non-symmetric taps,
        # consistent between q==1 and q>1
        rng = np.random.default_rng(4)
        x = rng.standard_normal(5000).astype(np.float32)
        taps = rng.standard_normal(57)  # deliberately asymmetric
        for q in (1, 3, 166):
            got = np.asarray(polyphase_decimate(jnp.asarray(x), taps, q))
            want = np.convolve(x.astype(np.float64), taps, mode="same")[::q]
            nn = min(len(got), len(want))
            scale = np.abs(want).max()
            assert np.abs(got[:nn] - want[:nn]).max() / scale < 1e-5, q
