"""Capture the FULL bench surface as one dated artifact line (VERDICT r3
item 2).

Runs ``python bench.py --multi --stations --image --frontend
--frontend-iq`` (all secondary metrics on), parses the single JSON line it
prints, stamps it with the date and backend, appends it to
``BENCHMARKS.md``, and regenerates the README perf table from the recorded
artifacts (tools/readme_perf.py).

``--quick`` is deliberately NOT forwarded: BENCHMARKS.md records only
full-size workloads so every line is comparable; use bench.py directly for
iteration.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/record_benchmarks.py \
        [--flags "--multi --stations --image --frontend --frontend-iq"]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_FLAGS = "--multi --stations --image --frontend --frontend-iq"

HEADER = """# Recorded benchmark surface

Full-surface bench runs (`python bench.py {flags}`), one dated JSON object
per line, newest last — appended by `tools/record_benchmarks.py`, consumed
by `tools/readme_perf.py` (which keeps README.md's perf table mechanical)
and read next to the driver's `BENCH_r*.json` headline captures.
`BASELINE.md` explains the self-diagnosing fields (`t1_ms`, `tk_ms`,
`baseline_cpu_samples_per_sec`).
"""


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--flags", default=DEFAULT_FLAGS)
    args = p.parse_args(argv)
    if "--quick" in args.flags:
        p.error("BENCHMARKS.md records full-size workloads only (no --quick)")

    cmd = [sys.executable, os.path.join(ROOT, "bench.py")] + args.flags.split()
    print(f"# running: {' '.join(cmd)}", file=sys.stderr)
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        print(f"bench failed (rc={out.returncode})", file=sys.stderr)
        return out.returncode
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    doc = json.loads(line)
    doc = {
        "date": datetime.date.today().isoformat(),
        "flags": args.flags,
        **doc,
    }

    path = os.path.join(ROOT, "BENCHMARKS.md")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(HEADER.format(flags=DEFAULT_FLAGS) + "\n")
    with open(path, "a") as f:
        f.write(json.dumps(doc) + "\n")
    print(f"recorded -> BENCHMARKS.md: {json.dumps(doc)}")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "readme_perf", os.path.join(ROOT, "tools", "readme_perf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main([])


if __name__ == "__main__":
    raise SystemExit(main())
