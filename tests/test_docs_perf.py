"""README perf table must match the recorded benchmark artifacts.

VERDICT r3 item 2: the README perf table drifted from the recorded
artifacts three rounds running, so the table is now generated
(`tools/readme_perf.py`) and this test makes drift a CI failure: whenever a
new `BENCH_r*.json` lands or `BENCHMARKS.md` gains a run, the README must
be regenerated (`python tools/readme_perf.py`) before the suite passes.

No jax needed — pure file comparison.
"""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "readme_perf", os.path.join(ROOT, "tools", "readme_perf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_perf_table_current():
    mod = _load()
    readme = open(os.path.join(ROOT, "README.md")).read()
    assert mod.current_block(readme) == mod.render(mod.collect()), (
        "README.md perf table is stale vs recorded artifacts — run "
        "`python tools/readme_perf.py`"
    )


def test_headline_row_present():
    # the driver always captures at least the headline metric, so the
    # generated table can never be empty
    mod = _load()
    merged = mod.collect()
    assert "value" in merged and merged["value"][0] > 0
    assert "Batch detect" in mod.render(merged)
