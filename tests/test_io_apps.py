"""I/O layer + app loop tests: WAV round trip, ledger format/rotation/
resume, event exports, PNG writer, monitor loop, analyze pipeline."""

import datetime
import os

import numpy as np
import pytest

import jax.numpy as jnp

from meteor_scatter_tpu.io.wavio import read_wav, stream_wav_blocks, write_wav
from meteor_scatter_tpu.io.ledger import HourlyLedger
from meteor_scatter_tpu.io.events_csv import (
    OutputDetection,
    events_to_detections,
    write_audacity_labels,
    write_event_csv,
)
from meteor_scatter_tpu.io.png import colorize, read_png_size, upscale_to, write_png
from meteor_scatter_tpu.models.events import events_from_mask


class TestWavIO:
    def test_int16_roundtrip(self, tmp_path):
        fs = 6000
        x = (np.sin(np.linspace(0, 100, fs * 2)) * 20000).astype(np.int16)
        p = str(tmp_path / "a.wav")
        write_wav(p, fs, x)
        fs2, y = read_wav(p)
        assert fs2 == fs
        np.testing.assert_array_equal(x, y)
        assert y.dtype == np.int16

    def test_float32_roundtrip(self, tmp_path):
        fs = 4000
        x = np.sin(np.linspace(0, 50, fs)).astype(np.float32)
        p = str(tmp_path / "f.wav")
        write_wav(p, fs, x)
        fs2, y = read_wav(p)
        assert fs2 == fs
        np.testing.assert_allclose(x, y, atol=0)
        assert y.dtype == np.float32

    def test_scipy_compat(self, tmp_path):
        import scipy.io.wavfile as wav

        fs = 6000
        x = (np.random.default_rng(0).standard_normal(fs) * 1000).astype(np.int16)
        p = str(tmp_path / "s.wav")
        wav.write(p, fs, x)
        fs2, y = read_wav(p)
        assert fs2 == fs
        np.testing.assert_array_equal(x, y)

    def test_stereo_mono_collapse(self, tmp_path):
        fs = 4000
        x = np.stack([np.arange(100, dtype=np.int16), np.zeros(100, np.int16)], axis=1)
        p = str(tmp_path / "st.wav")
        write_wav(p, fs, x)
        _, y = read_wav(p, mono=True)
        np.testing.assert_array_equal(y, x[:, 0])

    def test_stream_blocks(self, tmp_path):
        fs = 4000
        x = np.arange(fs * 2, dtype=np.int16)
        p = str(tmp_path / "b.wav")
        write_wav(p, fs, x)
        blocks = list(stream_wav_blocks(p, 800))
        assert len(blocks) == 10
        np.testing.assert_array_equal(np.concatenate(blocks), x[:8000])


class TestLedger:
    def test_schema_and_hourly_flush(self, tmp_path):
        t0 = datetime.datetime(2026, 8, 17, 10, 0, 0)
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(2, 3, now=t0 + datetime.timedelta(minutes=10))
        led.add(1, 0, now=t0 + datetime.timedelta(minutes=61))  # crosses interval
        path = os.path.join(str(tmp_path), "20260817.csv")
        lines = open(path).read().splitlines()
        assert lines[0] == "Timestamp;Anzahl;Kritisch"
        assert lines[1] == "2026-08-17 10:00:00;6;3"  # 2+3+1 counted into the flushed hour

    def test_daily_rotation(self, tmp_path):
        t0 = datetime.datetime(2026, 8, 17, 23, 30, 0)
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(1, 1, now=t0)
        led.add(1, 0, now=t0 + datetime.timedelta(hours=1))  # next day 00:30
        assert os.path.exists(os.path.join(str(tmp_path), "20260817.csv"))
        assert os.path.exists(os.path.join(str(tmp_path), "20260818.csv"))

    def test_crash_resume_journal(self, tmp_path):
        t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(4, 2, now=t0 + datetime.timedelta(minutes=5))
        # "crash": new ledger instance resumes the open hour
        led2 = HourlyLedger(str(tmp_path), now=t0 + datetime.timedelta(minutes=6))
        assert led2.n_critical == 4
        assert led2.n_non_critical == 2

    def test_stale_journal_flushes_lost_hour(self, tmp_path):
        """A crash that outlives its hour (or lands between 'flush due' and
        the row append) must still produce the hourly row on restart —
        the pre-round-5 recovery silently dropped the whole hour
        (VERDICT r4 item 6 soak finding)."""
        t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(4, 2, now=t0 + datetime.timedelta(minutes=5))
        # crash; restart 2 h later — the journaled hour is long since due
        led2 = HourlyLedger(str(tmp_path), now=t0 + datetime.timedelta(hours=2))
        lines = open(os.path.join(str(tmp_path), "20260817.csv")).read().splitlines()
        assert lines[1] == "2026-08-17 12:00:00;6;4"
        assert led2.n_critical == 0 and led2.n_non_critical == 0

    def test_stale_journal_flush_is_idempotent(self, tmp_path):
        """Crash between the row append and the journal reset: the row
        exists but the journal still holds the flushed counts — recovery
        must NOT write it twice."""
        t0 = datetime.datetime(2026, 8, 17, 12, 0, 0)
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(4, 2, now=t0 + datetime.timedelta(minutes=5))
        # simulate the torn flush: append the row by hand, leave the journal
        path = os.path.join(str(tmp_path), "20260817.csv")
        with open(path, "a") as fh:
            fh.write("2026-08-17 12:00:00;6;4\n")
        HourlyLedger(str(tmp_path), now=t0 + datetime.timedelta(hours=2))
        lines = open(path).read().splitlines()
        assert lines.count("2026-08-17 12:00:00;6;4") == 1  # no double row

    def test_stale_journal_from_previous_day(self, tmp_path):
        """A stale journal whose hour belongs to yesterday — and whose
        flush-due moment was still *within* yesterday — flushes into
        yesterday's file, not today's."""
        t0 = datetime.datetime(2026, 8, 17, 22, 30, 0)  # due 23:29.8, pre-midnight
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(1, 1, now=t0 + datetime.timedelta(minutes=5))
        HourlyLedger(str(tmp_path), now=t0 + datetime.timedelta(hours=4))  # 02:30 next day
        y_lines = open(os.path.join(str(tmp_path), "20260817.csv")).read().splitlines()
        assert y_lines[1] == "2026-08-17 22:30:00;2;1"
        t_lines = open(os.path.join(str(tmp_path), "20260818.csv")).read().splitlines()
        assert len(t_lines) == 1  # header only

    def test_stale_journal_straddling_rotation_is_dropped(self, tmp_path):
        """A journaled hour whose flush-due moment lands past midnight must
        be DROPPED by recovery: an uninterrupted run hits the daily rotation
        first (maybe_flush date-change branch) and resets the counts without
        flushing, so flushing here would fabricate a pre-midnight row no
        uninterrupted run produces (round-5 advisor-class finding)."""
        t0 = datetime.datetime(2026, 8, 17, 23, 40, 0)  # due 00:39.8 next day
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(3, 2, now=t0 + datetime.timedelta(minutes=15))  # crash at 23:55
        led2 = HourlyLedger(str(tmp_path), now=t0 + datetime.timedelta(hours=1, minutes=20))
        y_lines = open(os.path.join(str(tmp_path), "20260817.csv")).read().splitlines()
        assert len(y_lines) == 1  # header only — no fabricated 23:40 row
        assert led2.n_critical == 0 and led2.n_non_critical == 0
        # the stale journal was overwritten, so a second restart stays clean
        HourlyLedger(str(tmp_path), now=t0 + datetime.timedelta(hours=2))
        y_lines = open(os.path.join(str(tmp_path), "20260817.csv")).read().splitlines()
        assert len(y_lines) == 1

    def test_open_journal_resumed_across_midnight_still_rotates(self, tmp_path):
        """A crash at 23:55 with restart at 00:05 resumes the open journal —
        but the restarted ledger must still fire the daily rotation on its
        first add (the journal records the last add's date for exactly
        this), resetting the pre-midnight counts like an uninterrupted run.
        Resuming with today's date instead would smuggle them past the
        rotation into the eventual 23:40 row (round-5 review finding)."""
        t0 = datetime.datetime(2026, 8, 17, 23, 40, 0)
        led = HourlyLedger(str(tmp_path), now=t0)
        led.add(3, 2, now=t0 + datetime.timedelta(minutes=15))  # crash 23:55
        led2 = HourlyLedger(str(tmp_path), now=t0 + datetime.timedelta(minutes=25))
        assert led2.n_critical == 3  # resumed in place …
        # … but the first post-midnight add rotates: counts reset, then the
        # new segment's counts land in the fresh day
        led2.add(1, 1, now=t0 + datetime.timedelta(minutes=26))  # 00:06
        assert (led2.n_critical, led2.n_non_critical) == (0, 0)
        # the due flush writes the 23:40 row with post-rotation counts only
        led2.add(1, 0, now=t0 + datetime.timedelta(minutes=61))  # 00:41, due
        y_lines = open(os.path.join(str(tmp_path), "20260817.csv")).read().splitlines()
        assert y_lines[1] == "2026-08-17 23:40:00;1;1"  # only the 00:41 add


class TestEventExports:
    def make_dets(self):
        above = jnp.asarray([False, True, True, False, True, False])
        series = jnp.asarray([0.0, 10.0, 12.0, 0.0, 8.0, 0.0])
        ev = events_from_mask(above, series, cap=4)
        return events_to_detections(
            ev, 0.2, wav_start_date_time=datetime.datetime(2026, 1, 1, 0, 0, 0)
        )

    def test_events_to_detections(self):
        dets = self.make_dets()
        assert len(dets) == 2
        assert dets[0].t_start == pytest.approx(0.2)
        assert dets[0].t_stop == pytest.approx(0.6)
        assert dets[0].dB == pytest.approx(11.0)
        assert dets[0].utc_start.isoformat() == "2026-01-01T00:00:00.200000"

    def test_csv_format(self, tmp_path):
        p = str(tmp_path / "ev.csv")
        write_event_csv(p, self.make_dets())
        lines = open(p).read().splitlines()
        assert lines[0] == "t_start,t_stop,dur_s,dB,utc_start,utc_stop"
        assert len(lines) == 3

    def test_audacity_format(self, tmp_path):
        p = str(tmp_path / "lbl.txt")
        write_audacity_labels(p, self.make_dets())
        lines = open(p).read().splitlines()
        assert lines[0] == "0.20\t0.60\tM"


class TestPng:
    def test_write_and_size(self, tmp_path):
        img = colorize(np.random.default_rng(0).standard_normal((20, 30)))
        p = str(tmp_path / "x.png")
        write_png(p, img)
        assert read_png_size(p) == (30, 20)
        # verify it decodes with PIL
        from PIL import Image

        arr = np.asarray(Image.open(p))
        np.testing.assert_array_equal(arr, img)

    def test_upscale(self):
        img = colorize(np.zeros((10, 20)))
        up = upscale_to(img, min_w=100, min_h=100)
        assert up.shape[0] >= 100 and up.shape[1] >= 100

    def test_read_png_roundtrip(self, tmp_path):
        from meteor_scatter_tpu.io.png import read_png

        img = colorize(np.random.default_rng(1).standard_normal((15, 25)))
        p = str(tmp_path / "rt.png")
        write_png(p, img)
        np.testing.assert_array_equal(read_png(p), img)

    def test_text_rendering(self):
        from meteor_scatter_tpu.io.png import render_text, stamp_text

        m = render_text("avg 12.5 db", scale=2)
        assert m.ndim == 2 and m.max() == 255
        img = np.zeros((60, 300, 3), np.uint8)
        stamp_text(img, "avg 12.5 db", 4, 4, scale=2, color=(0, 255, 0))
        assert (img[:, :, 1] == 255).any() and not (img[:, :, 0] == 255).any()
        # clipping at the borders must not raise
        stamp_text(img, "xyz", -10, 55, scale=3)


class TestSpecAndPsdExport:
    """The per-detection export must contain BOTH reference panels
    (main.py:40-124): the spectrogram waterfall and the Welch PSD strip."""

    def test_both_panels_present(self, tmp_path):
        from meteor_scatter_tpu.io.events_csv import OutputDetection
        from meteor_scatter_tpu.io.png import read_png
        from meteor_scatter_tpu.io.spec_export import export_detection_spec

        fs = 6000
        rng = np.random.default_rng(5)
        n = fs * 12
        x = rng.standard_normal(n).astype(np.float32) * 0.3
        t = np.arange(n) / fs
        m = (t >= 5.0) & (t < 6.0)
        x[m] += 2.0 * np.sin(2 * np.pi * 1003.0 * t[m]).astype(np.float32)

        det = OutputDetection(t_start=5.0, t_stop=6.0, dur_s=1.0, dB=10.0)
        p = export_detection_spec(
            str(tmp_path), det, x, fs, n_fft=1024, freq_band=(993.0, 1013.0)
        )
        assert os.path.basename(p) == "spec_and_psd_5.00_6.00.png"
        img = read_png(p)
        h, w, _ = img.shape
        # right ~30% is the PSD panel: dark background + yellow polyline
        panel = img[:, int(w * 0.72) :]
        assert (np.all(panel == (240, 230, 120), axis=-1)).any(), "no PSD polyline"
        # dashed band-edge markers present in both panels
        assert (np.all(panel == (255, 80, 80), axis=-1)).any(), "no PSD band marker"
        spec = img[:, : int(w * 0.6)]
        assert (np.all(spec == (255, 80, 80), axis=-1)).any(), "no spec band marker"
        # the burst must be visible: tone rows brighter than background
        assert spec.mean() > 0

    def test_no_band_no_markers(self, tmp_path):
        from meteor_scatter_tpu.io.events_csv import OutputDetection
        from meteor_scatter_tpu.io.png import read_png
        from meteor_scatter_tpu.io.spec_export import export_detection_spec

        fs = 6000
        x = np.random.default_rng(6).standard_normal(fs * 8).astype(np.float32)
        det = OutputDetection(t_start=3.0, t_stop=4.0, dur_s=1.0, dB=5.0)
        p = export_detection_spec(str(tmp_path), det, x, fs, n_fft=512)
        img = read_png(p)
        # PSD panel still rendered (full band), no marker columns anywhere
        assert not (np.all(img == (255, 80, 80), axis=-1)).any()
        assert (np.all(img == (240, 230, 120), axis=-1)).any()


class TestMonitorLoop:
    def test_end_to_end_counts_and_ledger(self, tmp_path):
        from meteor_scatter_tpu.apps.monitor import WavSegmentSource, run_monitor
        from meteor_scatter_tpu.config import MonitorConfig
        from meteor_scatter_tpu.io.wavio import write_wav

        fs, seg = 5000, 30
        rng = np.random.default_rng(2)
        t = np.arange(fs * seg * 2) / fs
        x = rng.standard_normal(len(t)) * 0.3
        m = (t >= 10.0) & (t < 12.0)  # one critical burst in segment 1
        x[m] += 3.0 * np.sin(2 * np.pi * 1000.0 * t[m])
        p = str(tmp_path / "mon.wav")
        write_wav(p, fs, (x * 3000).astype(np.int16))

        cfg = MonitorConfig(
            csv_out_dir=str(tmp_path / "csv"), spec_out_dir=str(tmp_path / "spec")
        )
        src = WavSegmentSource(p, cfg)
        fake_now = datetime.datetime(2026, 8, 17, 9, 0, 0)
        ledger = run_monitor(src, cfg, now_fn=lambda: fake_now)
        assert ledger.n_critical >= 1
        # spec image saved for the detecting segment
        assert len(os.listdir(str(tmp_path / "spec"))) >= 1
        # ledger file created with header
        f = os.path.join(str(tmp_path / "csv"), "20260817.csv")
        assert open(f).readline().strip() == "Timestamp;Anzahl;Kritisch"

    def test_float_wav_matches_int16_scale(self, tmp_path):
        """A float32 WAV of the same recording must feed the detector at
        the same (int16 PCM) amplitude scale as the PCM16 WAV — the cut
        calibration is not scale-invariant, so a [-1, 1] float capture
        would otherwise count differently per ingest path (round-5 review
        finding)."""
        from meteor_scatter_tpu.apps.monitor import WavSegmentSource
        from meteor_scatter_tpu.config import MonitorConfig
        from meteor_scatter_tpu.io.wavio import write_wav

        fs = 5000
        rng = np.random.default_rng(5)
        xi = (rng.standard_normal(fs * 30) * 3000).astype(np.int16)
        p_i = str(tmp_path / "i.wav")
        p_f = str(tmp_path / "f.wav")
        write_wav(p_i, fs, xi)
        write_wav(p_f, fs, xi.astype(np.float32) / 32768.0)
        cfg = MonitorConfig(
            csv_out_dir=str(tmp_path / "csv"), spec_out_dir=str(tmp_path / "spec")
        )
        gi = WavSegmentSource(p_i, cfg).grab()
        gf = WavSegmentSource(p_f, cfg).grab()
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gi, np.float32), atol=1e-3
        )

    def test_pump_source_matches_direct_replay(self, tmp_path):
        # the native background-pump ingest (producer thread + SPSC ring)
        # must yield the same segments, hence the same ledger counts, as
        # the direct WAV replay
        from meteor_scatter_tpu.apps.monitor import (
            PumpSegmentSource,
            WavSegmentSource,
            run_monitor,
        )
        from meteor_scatter_tpu.config import MonitorConfig
        from meteor_scatter_tpu.io.wavio import write_wav

        fs, seg = 5000, 30
        rng = np.random.default_rng(8)
        t = np.arange(fs * seg * 2) / fs
        x = rng.standard_normal(len(t)) * 0.3
        m = (t >= 10.0) & (t < 12.0)
        x[m] += 3.0 * np.sin(2 * np.pi * 1000.0 * t[m])
        p = str(tmp_path / "pump_mon.wav")
        write_wav(p, fs, (x * 3000).astype(np.int16))

        fake_now = datetime.datetime(2026, 8, 17, 10, 0, 0)
        counts = {}
        for name, mk in (
            ("direct", lambda cfg: WavSegmentSource(p, cfg)),
            ("pump", lambda cfg: PumpSegmentSource(p, cfg)),
        ):
            cfg = MonitorConfig(
                csv_out_dir=str(tmp_path / f"csv_{name}"),
                spec_out_dir=str(tmp_path / f"spec_{name}"),
            )
            src = mk(cfg)
            ledger = run_monitor(src, cfg, now_fn=lambda: fake_now)
            counts[name] = (ledger.n_critical, ledger.n_non_critical)
            if hasattr(src, "close"):
                src.close()
        assert counts["pump"] == counts["direct"]
        assert counts["direct"][0] >= 1  # the burst is critical

    def test_wav_replay_offset_resume(self, tmp_path):
        from meteor_scatter_tpu.apps.monitor import (
            OffsetJournal,
            WavSegmentSource,
            run_monitor,
        )
        from meteor_scatter_tpu.config import MonitorConfig
        from meteor_scatter_tpu.io.wavio import write_wav

        fs, seg = 5000, 30
        rng = np.random.default_rng(5)
        x = (rng.standard_normal(fs * seg * 3) * 0.3 * 3000).astype(np.int16)
        p = str(tmp_path / "replay.wav")
        write_wav(p, fs, x)
        cfg = MonitorConfig(
            csv_out_dir=str(tmp_path / "csv"), spec_out_dir=str(tmp_path / "spec")
        )
        fake_now = datetime.datetime(2026, 8, 17, 9, 0, 0)

        # process one segment, "crash"
        src = WavSegmentSource(p, cfg)
        run_monitor(src, cfg, max_segments=1, now_fn=lambda: fake_now)
        j = OffsetJournal(cfg.csv_out_dir, os.path.abspath(p))
        assert j.load() == fs * seg

        # resume consumes exactly the remaining two segments
        src2 = WavSegmentSource(p, cfg, start_pos=j.load())
        assert src2.pos == fs * seg
        run_monitor(src2, cfg, now_fn=lambda: fake_now)
        assert j.load() == fs * seg * 3

        # a different source file must not inherit the offset
        assert OffsetJournal(cfg.csv_out_dir, "/elsewhere.wav").load() == 0


class TestAnalyzeApp:
    def test_proc_wav_file(self, tmp_path):
        from meteor_scatter_tpu.apps.analyze import proc_wav_file
        from meteor_scatter_tpu.io.wavio import write_wav

        fs = 6000
        rng = np.random.default_rng(3)
        t = np.arange(fs * 60) / fs
        x = rng.standard_normal(len(t)) * 0.4
        m = (t >= 20.0) & (t < 21.5)
        x[m] += 2.0 * np.sin(2 * np.pi * 1003.0 * t[m])
        p = str(tmp_path / "a.wav")
        write_wav(p, fs, x.astype(np.float32))

        res = proc_wav_file(
            p,
            out_csv_file=str(tmp_path / "ev.csv"),
            out_audacity_lbl_file=str(tmp_path / "lbl.txt"),
            wav_start_date_time=datetime.datetime(2026, 8, 17),
            verbose=False,
        )
        assert len(res.detections) == 1
        d = res.detections[0]
        assert d.t_start == pytest.approx(20.0, abs=0.4)
        assert d.t_stop == pytest.approx(21.5, abs=0.4)
        assert os.path.exists(str(tmp_path / "ev.csv"))

    def test_config_ini_roundtrip(self):
        from meteor_scatter_tpu.config import FrameworkConfig, from_ini, to_ini

        cfg = FrameworkConfig()
        text = to_ini(cfg)
        cfg2 = from_ini(text)
        assert cfg2.detection == cfg.detection
        assert cfg2.bandpower == cfg.bandpower
        assert cfg2.dashboard == cfg.dashboard


class TestLiveApp:
    def test_chunk_smaller_than_block_feeds_whole_blocks(self, tmp_path):
        """chunk_sec below one processing block (e.g. --ui clamps chunk to
        1 s while --block-sec is larger) rounded the chunk to zero samples
        and crashed range() before any audio was processed (round-5 review
        finding); it must instead feed at least one block per chunk and
        produce the same events as a large-chunk run."""
        from meteor_scatter_tpu.apps.live import wav_file_process
        from meteor_scatter_tpu.config import DetectionConfig
        from meteor_scatter_tpu.io.wavio import write_wav

        fs = 4000
        rng = np.random.default_rng(11)
        t = np.arange(fs * 40) / fs
        x = rng.standard_normal(len(t)) * 0.05
        m = (t >= 25.0) & (t < 27.0)
        x[m] += 1.5 * np.sin(2 * np.pi * 1000.0 * t[m])
        p = str(tmp_path / "live.wav")
        write_wav(p, fs, (x * 8000).astype(np.int16))

        cfg = DetectionConfig()  # proc_block_sec = 0.2
        ev_big = wav_file_process(p, cfg, chunk_sec=60.0, headless=True)
        ev_tiny = wav_file_process(p, cfg, chunk_sec=0.1, headless=True)
        assert [e["time_start"] for e in ev_tiny] == [e["time_start"] for e in ev_big]
        assert [e["time_stop"] for e in ev_tiny] == [e["time_stop"] for e in ev_big]
        assert len(ev_big) >= 1  # the injected burst was actually found


class TestMonitorSupervision:
    def test_short_segment_triggers_rebuild(self, tmp_path):
        """Stream recovery: a short grab must invoke source.rebuild() and
        continue (prime_detection.py:150-173 behavior)."""
        from meteor_scatter_tpu.apps.monitor import run_monitor
        from meteor_scatter_tpu.config import MonitorConfig

        cfg = MonitorConfig(
            csv_out_dir=str(tmp_path / "csv"), spec_out_dir=str(tmp_path / "spec")
        )
        expected = cfg.sample_rate * cfg.segment_len_sec
        rng = np.random.default_rng(0)

        class FlakySource:
            def __init__(self):
                self.calls = 0
                self.rebuilds = 0

            def grab(self):
                self.calls += 1
                if self.calls == 1:
                    return np.zeros(100, np.int16)  # short -> must rebuild
                if self.calls <= 3:
                    return (rng.standard_normal(expected) * 100).astype(np.int16)
                return None

            def rebuild(self):
                self.rebuilds += 1

        src = FlakySource()
        fake_now = datetime.datetime(2026, 8, 17, 9, 0, 0)
        run_monitor(src, cfg, now_fn=lambda: fake_now)
        assert src.rebuilds == 1
        assert src.calls == 4  # short, 2 good, exhausted

    def test_grab_exception_backoff(self, tmp_path, monkeypatch):
        """Grab errors sleep-and-continue instead of crashing
        (prime_detection.py:145-147)."""
        import meteor_scatter_tpu.apps.monitor as mon

        sleeps = []
        monkeypatch.setattr(mon.time, "sleep", lambda s: sleeps.append(s))
        cfg = mon.MonitorConfig(
            csv_out_dir=str(tmp_path / "csv"), spec_out_dir=str(tmp_path / "spec")
        )

        class ErrorThenDone:
            def __init__(self):
                self.calls = 0

            def grab(self):
                self.calls += 1
                if self.calls == 1:
                    raise RuntimeError("stream hiccup")
                return None

        src = ErrorThenDone()
        mon.run_monitor(src, cfg)
        assert src.calls == 2
        assert 5 in sleeps


class TestCrashRecoverySoak:
    """Fault-injection proof of the crash-recovery claim (VERDICT r4
    item 6; SURVEY.md §5 checkpoint: "a restart loses <= one segment, not
    one hour" — the reference resets counts only on flush,
    prime_detection.py:206-247, so its crash loses the whole in-progress
    hour).  SIGKILLs the monitor subprocess at points across an
    accelerated simulated day — mid-hour, just before and just after the
    daily rotation — restarts with --resume, and asserts the final CSVs
    equal an uninterrupted run's within one segment per kill, with no
    double counting."""

    START = "2026-08-20T16:00:00"
    SCALE = 60.0  # 30 s audio segment -> 30 simulated minutes
    FS, SEG_SEC, N_SEG = 5000, 30, 24  # 12 sim-hours, midnight at seg 16

    def _make_wav(self, path):
        # identical samples in every segment -> identical per-segment
        # detection counts, so the hourly arithmetic below is exact
        rng = np.random.default_rng(17)
        t = np.arange(self.FS * self.SEG_SEC) / self.FS
        x = rng.standard_normal(len(t)) * 0.3
        m = (t >= 5.0) & (t < 7.0)  # long burst: critical
        x[m] += 3.0 * np.sin(2 * np.pi * 1000.0 * t[m])
        m = (t >= 20.0) & (t < 20.4)  # short burst: non-critical
        x[m] += 6.0 * np.sin(2 * np.pi * 1100.0 * t[m])
        seg = (x * 3000).astype(np.int16)
        write_wav(path, self.FS, np.tile(seg, self.N_SEG))
        return seg

    def _argv(self, wav, out):
        return [
            "--wav", wav, "--csv-out", os.path.join(out, "csv"),
            "--spec-out", os.path.join(out, "spec"), "--resume",
            "--start-time", self.START, "--time-scale", str(self.SCALE),
        ]

    @staticmethod
    def _read_rows(csv_dir):
        rows = {}
        for name in sorted(os.listdir(csv_dir)):
            if not name.endswith(".csv"):
                continue
            with open(os.path.join(csv_dir, name)) as fh:
                header = fh.readline().strip()
                assert header == "Timestamp;Anzahl;Kritisch"
                for line in fh:
                    ts, anz, krit = line.strip().split(";")
                    assert ts not in rows, f"duplicate row {ts} (double counting)"
                    rows[ts] = (int(anz), int(krit))
        return rows

    def test_sigkill_resume_soak(self, tmp_path):
        import signal
        import subprocess
        import sys as _sys
        import time as _time

        import meteor_scatter_tpu.apps.monitor as mon

        wav = str(tmp_path / "soak.wav")
        self._make_wav(wav)

        # uninterrupted reference run (in-process: jax is already warm)
        ref_dir = str(tmp_path / "ref")
        os.makedirs(os.path.join(ref_dir, "csv"), exist_ok=True)
        mon.main(self._argv(wav, ref_dir))
        ref_rows = self._read_rows(os.path.join(ref_dir, "csv"))
        assert len(ref_rows) >= 10  # the simulated day produced hourly rows

        # per-segment counts (every segment is identical): back them out of
        # a full hour's row (2 segments/hour at SCALE=60)
        full_hour = max(ref_rows.values())
        assert full_hour[0] % 2 == 0 and full_hour[1] % 2 == 0
        seg_total, seg_crit = full_hour[0] // 2, full_hour[1] // 2
        assert seg_crit >= 1  # the 2 s burst is critical

        # killed run: SIGKILL after segments ~5 (mid-hour), ~15 (just
        # before the midnight rotation), ~19 (just after), then run to EOF
        kill_dir = str(tmp_path / "kill")
        os.makedirs(os.path.join(kill_dir, "csv"), exist_ok=True)
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys; from meteor_scatter_tpu.apps.monitor import main;"
            "sys.exit(main(sys.argv[1:]))"
        )
        env = dict(os.environ, PYTHONUNBUFFERED="1", JAX_PLATFORMS="cpu")
        rng = np.random.default_rng(23)
        n_kills = 0
        for target in (5, 15, 19, None):
            proc = subprocess.Popen(
                [_sys.executable, "-c", code] + self._argv(wav, kill_dir),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
            )
            if target is None:
                out, _ = proc.communicate(timeout=600)
                assert proc.returncode == 0, out[-2000:]
                assert "Source exhausted" in out
                break
            seen = 0
            deadline = _time.time() + 300
            for line in proc.stdout:
                if line.startswith("Non-critical bursts this segment:"):
                    seen += 1
                    if seen >= target:
                        break
                if _time.time() > deadline:
                    proc.kill()
                    raise AssertionError(f"soak run stalled before segment {target}")
            # land the kill at a random point inside the durable-state
            # window (PNG export -> offset journal -> ledger add/flush)
            _time.sleep(float(rng.uniform(0.0, 0.2)))
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait(timeout=60)
            proc.stdout.close()
            n_kills += 1

        kill_rows = self._read_rows(os.path.join(kill_dir, "csv"))

        # identical hourly timeline (incl. across the daily rotation) ...
        assert set(kill_rows) == set(ref_rows)
        deficit_total = deficit_crit = 0
        for ts, (anz, krit) in ref_rows.items():
            ka, kk = kill_rows[ts]
            # ... with no double counting anywhere ...
            assert ka <= anz and kk <= krit, f"{ts}: {kill_rows[ts]} > {ref_rows[ts]}"
            deficit_total += anz - ka
            deficit_crit += krit - kk
        # ... and at most one lost segment per SIGKILL
        assert deficit_total <= n_kills * seg_total
        assert deficit_crit <= n_kills * seg_crit


class TestMonitorSimClock:
    def test_start_time_maps_rows_to_audio_timeline(self, tmp_path):
        """--start-time pins ledger rows to the recording's own timeline
        (start + consumed samples / rate, scaled), not the wall clock —
        reprocessing a historical capture must produce correctly-dated
        CSVs regardless of when it runs."""
        import meteor_scatter_tpu.apps.monitor as mon
        from meteor_scatter_tpu.io.wavio import write_wav

        fs, seg = 5000, 30
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(fs * seg * 4) * 0.3 * 3000).astype(np.int16)
        wav = str(tmp_path / "hist.wav")
        write_wav(wav, fs, x)

        out = str(tmp_path / "csv")
        mon.main([
            "--wav", wav, "--csv-out", out,
            "--spec-out", str(tmp_path / "spec"),
            "--start-time", "2024-11-03T22:30:00", "--time-scale", "60",
        ])
        # 4 segments x 30 s x 60 = 2 sim-hours from 22:30 -> 00:30 next day;
        # the first hourly row flushes at +60 min with ts = the sim start,
        # in the file named for the recording's START date
        path = os.path.join(out, "20241103.csv")
        lines = open(path).read().splitlines()
        assert lines[1].startswith("2024-11-03 22:30:00;")
        # the daily rotation followed the simulated midnight
        assert os.path.exists(os.path.join(out, "20241104.csv"))
