"""Statement-coverage harness — the Tcov analog.

The reference certifies 100% statement coverage with a custom
instrumentation harness (reference: Tcov/README.txt:10-22, which
compiles the library with per-statement counters).  This is the same
idea built on CPython 3.12's sys.monitoring (PEP 669): a LINE callback
records each executed (file, line) once and then returns DISABLE for
that location, so steady-state overhead is near zero — the suite runs
at full speed after the first hit of each line.

Executable statements are derived from the ast (every stmt node's
lineno, minus docstring-only and ``pass``-only structural lines), so
the denominator is honest: comments and blank lines don't inflate
coverage.

Usage:
    python tools/coverage_tcov.py [pytest args...]
        default pytest args: tests/ -q
    Writes COVERAGE.json {file: {covered, total, pct}, __total__: pct}
    and exits nonzero when total coverage is below FLOOR_PCT.
"""

import ast
import json
import os
import sys

FLOOR_PCT = 91.0   # round-5 final: measured 91.56% (COVERAGE.json)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(HERE, "graphblas_tpu")

_covered: dict = {}


def _line_cb(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        _covered.setdefault(fn, set()).add(line)
    return sys.monitoring.DISABLE


def _executable_lines(path):
    """Line numbers of executable statements in a source file."""
    with open(path) as f:
        src = f.read()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return set()
    lines = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.stmt):
            # skip docstring expressions
            if isinstance(node, ast.Expr) and isinstance(
                    node.value, ast.Constant) and isinstance(
                        node.value.value, str):
                continue
            lines.add(node.lineno)
    return lines


def main():
    mon = sys.monitoring
    TOOL = mon.COVERAGE_ID
    mon.use_tool_id(TOOL, "gbtpu-tcov")
    mon.register_callback(TOOL, mon.events.LINE, _line_cb)
    mon.set_events(TOOL, mon.events.LINE)

    import pytest
    args = sys.argv[1:] or ["tests/", "-q"]
    rc = pytest.main(args)

    mon.set_events(TOOL, 0)
    mon.free_tool_id(TOOL)
    if rc not in (0,):
        print(f"tcov: pytest failed (rc={rc}); coverage not evaluated")
        sys.exit(int(rc))

    report = {}
    tot_cov = tot_all = 0
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            exe = _executable_lines(path)
            cov = _covered.get(path, set()) & exe
            rel = os.path.relpath(path, HERE)
            pct = 100.0 * len(cov) / len(exe) if exe else 100.0
            report[rel] = {"covered": len(cov), "total": len(exe),
                           "pct": round(pct, 1)}
            if os.environ.get("GBTPU_COV_MISSING"):
                report[rel]["missing"] = sorted(exe - cov)
            tot_cov += len(cov)
            tot_all += len(exe)
    total_pct = 100.0 * tot_cov / max(tot_all, 1)
    report["__total__"] = {"covered": tot_cov, "total": tot_all,
                           "pct": round(total_pct, 2)}
    out = os.path.join(HERE, "COVERAGE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    worst = sorted((v["pct"], k) for k, v in report.items()
                   if k != "__total__")[:10]
    print(f"tcov: total statement coverage {total_pct:.2f}% "
          f"({tot_cov}/{tot_all}) -> COVERAGE.json")
    for pct, k in worst:
        print(f"  lowest: {k} {pct:.1f}%")
    if total_pct < FLOOR_PCT:
        print(f"tcov: BELOW FLOOR {FLOOR_PCT}%")
        sys.exit(3)


if __name__ == "__main__":
    main()
