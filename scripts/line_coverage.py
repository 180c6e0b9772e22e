"""Zero-dependency line coverage via sys.monitoring (PEP 669, py3.12+).

The image has no coverage/pytest-cov; this gives a cheap substitute for
finding untested code. Two pieces:

- start(out_path): register a LINE-event callback that records each
  (file, line) under nerfmeshes_tpu/ once and then DISABLEs that
  location — near-zero steady-state overhead. Activated from
  tests/conftest.py when NERFMESHES_LINECOV=<out.json> is set.
- report (run as a script): compare hit lines against every executable
  line (recursively walking compiled code objects' co_lines()) and
  print per-file coverage with uncovered ranges.

Usage:
    NERFMESHES_LINECOV=/tmp/linecov.json python -m pytest tests/ -q
    python scripts/line_coverage.py /tmp/linecov.json [more.json ...]
"""

from __future__ import annotations

import atexit
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PREFIX = os.path.join(_REPO, "nerfmeshes_tpu")


def start(out_path: str) -> None:
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    hits: dict[str, set[int]] = {}

    def on_line(code, lineno):
        fn = code.co_filename
        if fn.startswith(_PREFIX):
            hits.setdefault(fn, set()).add(lineno)
        return mon.DISABLE

    mon.use_tool_id(tool, "nerfmeshes-linecov")
    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)

    def dump():
        # Merge with an existing file so multiple processes can append.
        data = {}
        if os.path.exists(out_path):
            try:
                with open(out_path) as f:
                    data = {k: set(v) for k, v in json.load(f).items()}
            except Exception:
                data = {}
        for fn, lines in hits.items():
            data.setdefault(fn, set()).update(lines)
        with open(out_path, "w") as f:
            json.dump({k: sorted(v) for k, v in data.items()}, f)

    atexit.register(dump)


def _executable_lines(path: str) -> set[int]:
    with open(path) as f:
        src = f.read()
    lines: set[int] = set()
    stack = [compile(src, path, "exec")]
    while stack:
        code = stack.pop()
        for _, _, lineno in code.co_lines():
            if lineno is not None:
                lines.add(lineno)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # Drop non-statements that co_lines still reports: blanks, comments,
    # and docstring-only lines are cheapest filtered textually.
    src_lines = src.splitlines()
    out = set()
    for ln in lines:
        if 1 <= ln <= len(src_lines):
            stripped = src_lines[ln - 1].strip()
            if stripped and not stripped.startswith("#"):
                out.add(ln)
    return out


def _ranges(sorted_lines: list[int]) -> str:
    spans = []
    start = prev = None
    for ln in sorted_lines:
        if prev is None:
            start = prev = ln
        elif ln == prev + 1:
            prev = ln
        else:
            spans.append(f"{start}" if start == prev else f"{start}-{prev}")
            start = prev = ln
    if prev is not None:
        spans.append(f"{start}" if start == prev else f"{start}-{prev}")
    return ",".join(spans)


def main(argv: list[str]) -> None:
    hits: dict[str, set[int]] = {}
    for path in argv:
        with open(path) as f:
            for fn, lines in json.load(f).items():
                hits.setdefault(fn, set()).update(lines)

    rows = []
    for root, _, files in os.walk(_PREFIX):
        if "__pycache__" in root:
            continue
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            fn = os.path.join(root, name)
            exe = _executable_lines(fn)
            hit = hits.get(fn, set()) & exe
            missed = sorted(exe - hit)
            pct = 100.0 * len(hit) / len(exe) if exe else 100.0
            rows.append((pct, fn, len(exe), missed))

    rows.sort()
    for pct, fn, n_exe, missed in rows:
        rel = os.path.relpath(fn, _REPO)
        print(f"{pct:5.1f}%  {rel}  ({n_exe} lines)")
        if missed and pct < 100.0:
            print(f"        missed: {_ranges(missed)}")
    total_exe = sum(r[2] for r in rows)
    total_hit = sum(r[2] - len(r[3]) for r in rows)
    print(f"TOTAL {100.0 * total_hit / max(total_exe, 1):.1f}% of {total_exe} lines")


if __name__ == "__main__":
    main(sys.argv[1:])
