"""Native runtime tests: build the C++ library, exercise ring buffer and
WAV reader through ctypes, and check fallback parity."""

import threading

import numpy as np
import pytest

from meteor_scatter_tpu.io.native import (
    NativeWavReader,
    PcmRing,
    WavPump,
    build_native,
    native_available,
)
from meteor_scatter_tpu.io.wavio import write_wav


@pytest.fixture(scope="module", autouse=True)
def built():
    ok = build_native()
    if not ok:
        pytest.skip("no C++ toolchain")
    assert native_available()


class TestRing:
    def test_push_pop_roundtrip(self):
        r = PcmRing(1 << 14)
        assert r.native
        data = (np.arange(1000) % 500 - 250).astype(np.int16)
        assert r.push(data) == 1000
        assert r.available() == 1000
        out = r.pop(1000)
        np.testing.assert_allclose(out, data.astype(np.float32) / 32768.0)
        assert r.available() == 0

    def test_wraparound(self):
        r = PcmRing(1024)
        for _ in range(10):  # push/pop cycles crossing the wrap point
            data = np.random.default_rng(0).integers(-1000, 1000, 700).astype(np.int16)
            assert r.push(data) == 700
            out = r.pop(700)
            np.testing.assert_allclose(out, data.astype(np.float32) / 32768.0)

    def test_overflow_drops(self):
        r = PcmRing(256)  # rounds up to 256
        data = np.ones(1000, np.int16)
        pushed = r.push(data)
        assert pushed == r.capacity
        assert r.dropped() == 1000 - r.capacity

    def test_segment_contract(self):
        r = PcmRing(1 << 13)
        r.push(np.ones(4000, np.int16))
        assert r.pop_segment(5000) is None  # not enough yet
        r.push(np.ones(1000, np.int16))
        seg = r.pop_segment(5000)
        assert seg is not None and len(seg) == 5000

    def test_threaded_producer_consumer(self):
        r = PcmRing(1 << 15)
        total = 200_000
        src = (np.arange(total) % 32768 - 16384).astype(np.int16)
        got = []

        def producer():
            i = 0
            while i < total:
                n = r.push(src[i : i + 4096])
                i += n

        def consumer():
            count = 0
            while count < total:
                out = r.pop(4096)
                if len(out):
                    got.append(out)
                    count += len(out)

        tp = threading.Thread(target=producer)
        tc = threading.Thread(target=consumer)
        tp.start(); tc.start()
        tp.join(timeout=30); tc.join(timeout=30)
        out = np.concatenate(got)
        assert len(out) == total
        np.testing.assert_allclose(out, src.astype(np.float32) / 32768.0)
        # dropped counts push-time rejections; the retrying producer turns
        # backpressure into retries, so data integrity is the invariant here


class TestNativeWav:
    def test_reads_int16_chunked(self, tmp_path):
        fs = 6000
        x = (np.sin(np.linspace(0, 300, fs * 3)) * 20000).astype(np.int16)
        p = str(tmp_path / "n.wav")
        write_wav(p, fs, x)
        rd = NativeWavReader(p)
        assert rd.native
        assert rd.fs == fs
        assert rd.n_frames == len(x)
        chunks = []
        while True:
            c = rd.read(4096)
            if len(c) == 0:
                break
            chunks.append(c)
        rd.close()
        out = np.concatenate(chunks)
        np.testing.assert_allclose(out, x.astype(np.float32) / 32768.0, atol=1e-7)

    def test_reads_float32(self, tmp_path):
        fs = 4000
        x = np.sin(np.linspace(0, 80, fs)).astype(np.float32)
        p = str(tmp_path / "f.wav")
        write_wav(p, fs, x)
        rd = NativeWavReader(p)
        out = rd.read(fs + 10)
        rd.close()
        assert len(out) == fs
        np.testing.assert_allclose(out, x, atol=0)

    @staticmethod
    def _write_extensible_pcm16(path, fs, x):
        """Hand-rolled WAVE_FORMAT_EXTENSIBLE (0xFFFE) header around PCM16
        data — the layout SDR/DAW tools commonly emit."""
        import struct

        data = x.astype("<i2").tobytes()
        # fmt chunk: 16 basic + cbSize(2) + validbits(2) + chmask(4) + GUID(16)
        sub_guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
        )
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, fs, fs * 2, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 0x4) + sub_guid
        riff = b"WAVE"
        riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        riff += b"data" + struct.pack("<I", len(data)) + data
        with open(path, "wb") as fh:
            fh.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)

    def test_extensible_header_pcm16(self, tmp_path):
        """A PCM16 WAV with a WAVE_FORMAT_EXTENSIBLE header must decode the
        real samples — the pre-fix reader opened it but emitted silence
        (matching no fmt branch), so the monitor recorded zero detections
        with no error (round-5 review finding)."""
        fs = 4000
        x = (np.sin(np.linspace(0, 100, fs)) * 15000).astype(np.int16)
        p = str(tmp_path / "ext.wav")
        self._write_extensible_pcm16(p, fs, x)
        rd = NativeWavReader(p)
        assert rd.native
        out = rd.read(fs + 10)
        rd.close()
        assert len(out) == fs
        np.testing.assert_allclose(out, x.astype(np.float32) / 32768.0, atol=0)

    def test_unsupported_format_fails_open(self, tmp_path):
        """24-bit PCM (undecodable by ms_wav_read_f32) must fail at open,
        not stream silent zeros."""
        import struct

        fs = 4000
        data = bytes(300)  # 100 frames of 24-bit silence
        fmt = struct.pack("<HHIIHH", 1, 1, fs, fs * 3, 3, 24)
        riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        riff += b"data" + struct.pack("<I", len(data)) + data
        p = str(tmp_path / "p24.wav")
        with open(p, "wb") as fh:
            fh.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)
        with pytest.raises(IOError):
            NativeWavReader(p)

    def test_stereo_collapses_first_channel(self, tmp_path):
        fs = 4000
        st = np.stack(
            [np.arange(200, dtype=np.int16), np.full(200, 7, np.int16)], axis=1
        )
        p = str(tmp_path / "st.wav")
        write_wav(p, fs, st)
        rd = NativeWavReader(p)
        out = rd.read(200)
        rd.close()
        np.testing.assert_allclose(out, st[:, 0].astype(np.float32) / 32768.0)


class TestWavPump:
    """Background producer thread (C++ pump / Python fallback) — WAV
    streamed into the ring with backpressure, never drops."""

    @staticmethod
    def _wav(tmp_path, n=40_000, fs=4000, seed=0):
        x = (np.random.default_rng(seed).standard_normal(n) * 8000).astype(np.int16)
        p = str(tmp_path / "pump.wav")
        write_wav(p, fs, x)
        return p, x

    @staticmethod
    def _drain(pump, ring, seg):
        import time

        out = []
        deadline = time.time() + 60
        while time.time() < deadline:
            got = ring.pop_segment(seg)
            if got is not None:
                out.append(got)
            elif not pump.running() and ring.available() < seg:
                break
            else:
                time.sleep(0.001)
        tail = ring.pop(ring.available())
        out.append(tail)
        return np.concatenate(out)

    def test_bit_exact_with_backpressure(self, tmp_path):
        p, x = self._wav(tmp_path)
        ring = PcmRing(8192)  # far smaller than the file: forces waiting
        pump = WavPump(p, ring, chunk_frames=4096)
        assert pump.native
        got = self._drain(pump, ring, 2000)
        assert pump.frames_pushed() == len(x)
        assert ring.dropped() == 0, "pump overflow must be backpressure, not drops"
        np.testing.assert_array_equal(got, x.astype(np.float32) / 32768.0)
        pump.stop()
        pump.stop()  # idempotent

    def test_early_stop_no_hang(self, tmp_path):
        p, _ = self._wav(tmp_path, n=200_000)
        ring = PcmRing(4096)
        pump = WavPump(p, ring, chunk_frames=4096)
        ring.pop(2000)
        pump.stop()  # mid-stream, ring mostly full: must join promptly
        assert not pump.running()

    def test_paced_pump(self, tmp_path):
        import time

        # 2 s of audio at 64x realtime -> >= ~31 ms wall
        p, x = self._wav(tmp_path, n=8000)
        ring = PcmRing(1 << 14)
        t0 = time.monotonic()
        pump = WavPump(p, ring, chunk_frames=1024, pace_factor=64.0)
        got = self._drain(pump, ring, 1024)
        el = time.monotonic() - t0
        assert len(got) == len(x)
        assert el >= 0.02, f"pacing had no effect ({el:.3f}s)"
        pump.stop()

    def test_python_fallback_parity(self, tmp_path, monkeypatch):
        import meteor_scatter_tpu.io.native as native_mod

        monkeypatch.setattr(native_mod, "load_native", lambda *a, **k: None)
        p, x = self._wav(tmp_path, seed=3)
        ring = native_mod.PcmRing(8192)
        assert not ring.native
        pump = native_mod.WavPump(p, ring, chunk_frames=4096)
        assert not pump.native
        got = self._drain(pump, ring, 2000)
        assert pump.frames_pushed() == len(x)
        assert ring.dropped() == 0
        np.testing.assert_array_equal(got, x.astype(np.float32) / 32768.0)
        pump.stop()
