"""Line-coverage gate without external tooling.

The reference enforces 80% coverage in CI (``/root/reference/Makefile:33``,
``COVFAIL = 80``) via pytest-cov. Neither pytest-cov nor coverage.py is
available in this image, so this harness measures line coverage with the
stdlib ``sys.monitoring`` API (PEP 669 — the same low-overhead mechanism
coverage.py >= 7.4 uses): a LINE callback records the first hit of every
line and then returns ``sys.monitoring.DISABLE`` for it, so steady-state
overhead is near zero and the full suite runs at essentially normal
speed.

Methodology notes (differences from coverage.py):
- executable-line denominators come from ``code.co_lines()`` over the
  compiled module (recursively through nested code objects); this
  counts a handful of artifact lines (e.g. docstring constants) that
  coverage.py's analysis excludes, so numbers here are slightly
  *conservative*;
- spawned child processes (sharded HDF5 writers, stitch worker pools,
  feature processes) are not traced — lines only they execute count as
  missed, again conservative.

Usage:
    python tests/run_coverage.py [pytest args...]
Writes ``coverage_lines.json`` and prints a per-file and total summary;
exits non-zero if total coverage < the 80% gate.
"""
import json
import os
import sys

# run as a script, sys.path[0] is tests/ — put the repo root back so
# the test modules can import medaka_tpu
_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), ".."))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

PACKAGE_DIR = os.path.join(_REPO_ROOT, "medaka_tpu")
GATE_PCT = 80.0

_hits = {}


def _on_line(code, lineno):
    # cheap substring prefilter; absolutize only on candidate hits
    # (module filenames can be relative when loaded from cached pycs).
    # Cost is bounded: DISABLE makes every (code, line) fire only once.
    fn = code.co_filename
    if "medaka_tpu" in fn:
        fn = os.path.abspath(fn)
        if fn.startswith(PACKAGE_DIR):
            _hits.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def executable_lines(path):
    """Line numbers the compiler attributes code to, recursively."""
    with open(path, "rb") as fh:
        source = fh.read()
    try:
        top = compile(source, path, "exec")
    except SyntaxError:
        return set()
    lines = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _start, _end, lineno in code.co_lines():
            if lineno is not None:
                lines.add(lineno)
        for const in code.co_consts:
            if isinstance(const, type(top)):
                stack.append(const)
    return lines


def main():
    tool = sys.monitoring.COVERAGE_ID
    sys.monitoring.use_tool_id(tool, "medaka_tpu_cov")
    sys.monitoring.register_callback(
        tool, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(tool, sys.monitoring.events.LINE)

    import pytest
    args = sys.argv[1:] or ["tests/", "-x", "-q"]
    rc = pytest.main(args)

    sys.monitoring.set_events(tool, 0)
    sys.monitoring.free_tool_id(tool)

    rows = []
    total_exec = total_hit = 0
    for root, _dirs, files in os.walk(PACKAGE_DIR):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            exe = executable_lines(path)
            if not exe:
                continue
            hit = _hits.get(path, set()) & exe
            total_exec += len(exe)
            total_hit += len(hit)
            rows.append((
                os.path.relpath(path, os.path.dirname(PACKAGE_DIR)),
                len(exe), len(hit),
                sorted(exe - hit)))

    rows.sort(key=lambda r: r[2] / max(1, r[1]))
    print("\n{:<44s} {:>6s} {:>6s} {:>7s}".format(
        "file", "lines", "hit", "cover"))
    for path, n_exe, n_hit, _missing in rows:
        print("{:<44s} {:>6d} {:>6d} {:>6.1f}%".format(
            path, n_exe, n_hit, 100.0 * n_hit / max(1, n_exe)))
    pct = 100.0 * total_hit / max(1, total_exec)
    print("{:<44s} {:>6d} {:>6d} {:>6.1f}%".format(
        "TOTAL", total_exec, total_hit, pct))

    with open("coverage_lines.json", "w") as fh:
        json.dump({
            "total_pct": round(pct, 2),
            "gate_pct": GATE_PCT,
            "files": {
                path: {"executable": n_exe, "hit": n_hit,
                       "missing": missing}
                for path, n_exe, n_hit, missing in rows},
        }, fh, indent=1)
    print("\nwrote coverage_lines.json (gate: {:.0f}%)".format(GATE_PCT))

    if rc != 0:
        return int(rc)
    return 0 if pct >= GATE_PCT else 3


if __name__ == "__main__":
    sys.exit(main())
