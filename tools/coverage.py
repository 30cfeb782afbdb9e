"""Statement-coverage harness — the Tcov analog (reference:
Tcov/README.txt:10-22 recompiles the library with statement counters and
reruns the suite).  No pytest-cov in this image, so this uses the stdlib
``trace`` module: run the fast test tier under a line tracer and report
per-file statement coverage for the package.

Usage:
    python tools/coverage.py [--floor 80] [pytest args...]

Exit code 1 if total coverage is below the floor.  Slow (~10x test time);
meant for periodic certification, not per-commit runs.
"""

import argparse
import os
import sys
import trace

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(HERE, "graphblas_tpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--floor", type=float, default=0.0)
    ap.add_argument("pytest_args", nargs="*",
                    default=["tests/", "-m", "not slow", "-q", "-p",
                             "no:cacheprovider"])
    args = ap.parse_args()

    sys.path.insert(0, HERE)
    tracer = trace.Trace(count=1, trace=0,
                         ignoredirs=[sys.prefix, sys.exec_prefix])
    import pytest
    pa = args.pytest_args or ["tests/", "-m", "not slow", "-q"]
    tracer.runfunc(pytest.main, pa)
    results = tracer.results()

    # executable lines per file via the tracer's own table
    import linecache
    from trace import _find_executable_linenos

    covered = {}
    for (fname, lineno), cnt in results.counts.items():
        if fname.startswith(PKG):
            covered.setdefault(fname, set()).add(lineno)

    total_exec = total_hit = 0
    rows = []
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            try:
                execlines = set(_find_executable_linenos(path))
            except Exception:
                continue
            hit = covered.get(path, set()) & execlines
            total_exec += len(execlines)
            total_hit += len(hit)
            pct = 100.0 * len(hit) / len(execlines) if execlines else 100.0
            rows.append((pct, os.path.relpath(path, HERE),
                         len(hit), len(execlines)))
    rows.sort()
    for pct, rel, h, e in rows:
        print(f"{pct:6.1f}%  {h:5d}/{e:<5d}  {rel}")
    total = 100.0 * total_hit / max(total_exec, 1)
    print(f"\nTOTAL: {total:.1f}% ({total_hit}/{total_exec} statements)")
    if total < args.floor:
        print(f"FAIL: below floor {args.floor}%")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
