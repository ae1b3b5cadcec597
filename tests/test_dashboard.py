"""Dashboard tests: store self-healing, shower calendar, charts, and the
full WSGI endpoint surface against synthetic fixtures (SURVEY.md §4 plan
item 4)."""

import datetime
import io
import json
import os

import pytest

from meteor_scatter_tpu.config import DashboardConfig
from meteor_scatter_tpu.dashboard.showers import shower_windows, showers_in_range
from meteor_scatter_tpu.dashboard.store import LedgerStore, calculate_last_month
from meteor_scatter_tpu.dashboard.testdata import generate_test_csvs


@pytest.fixture
def fixture_dir(tmp_path):
    """31 daily CSVs ending yesterday — a complete last-month window."""
    start, end = calculate_last_month()
    d = str(tmp_path / "csvs")
    generate_test_csvs(d, start, (end - start).days + 1, seed=1)
    return d


def call_wsgi(app, path, method="GET"):
    env = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "SERVER_NAME": "test",
        "SERVER_PORT": "80",
        "wsgi.input": io.BytesIO(b""),
        "wsgi.url_scheme": "http",
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    body = b"".join(app(env, start_response))
    return captured["status"], captured["headers"], body


class TestShowerCalendar:
    def test_windows_plus_minus_two_days(self):
        ws = shower_windows(2026)
        per = [w for w in ws if w.label == "Perseiden"][0]
        assert per.start == datetime.date(2026, 8, 10)
        assert per.end == datetime.date(2026, 8, 14)
        assert len(ws) == 37  # LocalData.py has 37 entries

    def test_range_intersection_cross_year(self):
        hits = showers_in_range(datetime.date(2025, 12, 20), datetime.date(2026, 1, 10))
        labels = {w.label for w in hits}
        assert "Ursiden" in labels  # Dec 22
        assert "Quadrantiden" in labels  # Jan 3


class TestStore:
    def test_scan_and_missing_days(self, fixture_dir, tmp_path):
        store = LedgerStore(fixture_dir, str(tmp_path / "final.csv"))
        files = store.scan_folder()
        assert len(files) == 31
        assert store.check_missing_days() == []
        # remove one day → reported missing
        os.remove(os.path.join(fixture_dir, files[5]))
        missing = store.check_missing_days()
        assert missing == [files[5][:8]]

    def test_load_or_create_and_self_heal(self, fixture_dir, tmp_path):
        storage = str(tmp_path / "final.csv")
        store = LedgerStore(fixture_dir, storage)
        df = store.load_or_create()
        assert df is not None and len(df) == 31 * 24
        assert os.path.exists(storage)
        # delete the cache → recreated from sources
        os.remove(storage)
        df2 = store.load_or_create()
        assert df2 is not None and len(df2) == 31 * 24

    def test_update_if_needed_fresh(self, fixture_dir, tmp_path):
        storage = str(tmp_path / "final.csv")
        store = LedgerStore(fixture_dir, storage)
        store.load_or_create()
        df = store.update_if_needed()
        # fixture ends yesterday → no reload needed, data unchanged
        assert len(df) == 31 * 24

    def test_average_last_24h(self, fixture_dir, tmp_path):
        import pandas as pd

        storage = str(tmp_path / "final.csv")
        store = LedgerStore(fixture_dir, storage)
        store.load_or_create()
        avg = store.average_last_24h()
        df = pd.read_csv(storage, sep=";")
        ts = pd.to_datetime(df["Timestamp"])
        yesterday = datetime.date.today() - datetime.timedelta(days=1)
        want = round(df[ts.dt.date == yesterday]["Anzahl"].mean())
        assert avg == want


class TestCharts:
    def test_all_chart_types_render(self, fixture_dir, tmp_path):
        import base64

        from meteor_scatter_tpu.dashboard import charts

        storage = str(tmp_path / "final.csv")
        LedgerStore(fixture_dir, storage).load_or_create()
        for name, fn in charts.CHART_FUNCTIONS.items():
            img64 = charts.generate_chart(fn, storage)
            assert img64, f"chart {name} failed"
            data = base64.b64decode(img64)
            assert data[:8] == b"\x89PNG\r\n\x1a\n", f"chart {name} not a PNG"


class TestEndpoints:
    @pytest.fixture
    def app(self, fixture_dir, tmp_path, monkeypatch):
        from meteor_scatter_tpu.dashboard.app import DashboardApp

        monkeypatch.chdir(tmp_path)
        cfg = DashboardConfig(
            csv_folder=fixture_dir, csv_storage_path=str(tmp_path / "final.csv")
        )
        return DashboardApp(cfg, static_dir=str(tmp_path / "static"))

    def test_index(self, app):
        status, headers, body = call_wsgi(app, "/")
        assert status == "200 OK"
        assert b"Meteor" in body
        assert b"RELOAD_INTERVAL" in body

    def test_slideshow_interval(self, app):
        status, _, body = call_wsgi(app, "/config/slideshow_interval")
        assert status == "200 OK"
        assert json.loads(body)["slideshow_interval"] == 10000

    def test_dynamic_content_no_cache(self, app):
        status, headers, body = call_wsgi(app, "/api/dynamischer_inhalt")
        assert status == "200 OK"
        assert headers["Cache-Control"].startswith("no-store")
        assert json.loads(body)["missing_days"] == []

    def test_update_csv_post(self, app):
        status, _, body = call_wsgi(app, "/update_csv", method="POST")
        assert status == "200 OK"
        assert "message" in json.loads(body)

    def test_load_chart_and_static(self, app):
        status, _, body = call_wsgi(app, "/load_chart/zeiger")
        assert status == "200 OK"
        url = json.loads(body)["img_url"]
        assert url == "/static/zeiger_chart.png"
        status, headers, img = call_wsgi(app, url)
        assert status == "200 OK"
        assert img[:8] == b"\x89PNG\r\n\x1a\n"

    def test_load_chart_invalid_type(self, app):
        status, _, body = call_wsgi(app, "/load_chart/bogus")
        assert status == "400 Bad Request"

    def test_script_name_middleware(self, app):
        env = {
            "REQUEST_METHOD": "GET",
            "PATH_INFO": "/load_chart/zeiger",
            "HTTP_X_SCRIPT_NAME": "/meteor",
            "wsgi.input": io.BytesIO(b""),
        }
        captured = {}

        def sr(status, headers):
            captured["status"] = status

        body = b"".join(app(env, sr))
        assert json.loads(body)["img_url"] == "/meteor/static/zeiger_chart.png"

    def test_static_traversal_blocked(self, app):
        status, _, _ = call_wsgi(app, "/static/../app.py")
        assert status in ("403 Forbidden", "404 Not Found")
