#!/usr/bin/env python
"""Compare a bench.py JSON line against BASELINE.md's recorded sf0.1
timings: per-query ratio, flagging anything over the --flag threshold
(the driver's gate is 2x; default flags at 1.5x to catch drift early).

Usage: python bench.py | tail -1 | python tools/compare_baseline.py
       python tools/compare_baseline.py bench_output.json
"""

from __future__ import annotations

import json
import re
import sys


def load_baseline(path: str = "BASELINE.md") -> dict[str, float]:
    base: dict[str, float] = {}
    row = re.compile(r"^\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|")
    with open(path) as f:
        for line in f:
            m = row.match(line)
            if m:
                base[m.group(1)] = float(m.group(2))
    return base


def main() -> int:
    flag = 1.5
    src = sys.argv[1] if len(sys.argv) > 1 else None
    raw = open(src).read() if src else sys.stdin.read()
    try:
        bench = json.loads(raw)  # a bench JSON file (pretty-printed)
    except json.JSONDecodeError:
        # piped bench stdout: the compact line is the last line
        bench = json.loads(raw.strip().splitlines()[-1])
    base = load_baseline()
    ratios = []
    missing = []
    for name, sec in bench["queries"].items():
        if name in base:
            ratios.append((sec / base[name], name, sec, base[name]))
        else:
            missing.append(name)
    ratios.sort(reverse=True)
    for r, name, sec, b in ratios:
        mark = "  <-- OVER" if r > flag else ""
        print(f"{r:6.2f}x  {name:40s} {sec:7.3f}s vs {b:.3f}s{mark}")
    med = sorted(r for r, *_ in ratios)[len(ratios) // 2]
    over = sum(1 for r, *_ in ratios if r > flag)
    print(
        f"\n{len(ratios)} compared (median {med:.2f}x, {over} over {flag}x), "
        f"{len(missing)} not in baseline: {missing}"
    )
    return 1 if over else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # |head closing stdout is fine
        raise SystemExit(0)
