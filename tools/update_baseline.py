"""Re-anchor BASELINE.md's per-query table from a bench JSON.

Replaces the value of every existing table row whose query appears in
the bench output and appends rows for newly-benched queries, keeping
the row ORDER (existing first, new queries appended in bench order) so
diffs stay reviewable. The config/date cells record the new run.

Usage: python tools/update_baseline.py BENCH_sf01_same_container.json [date]
"""

from __future__ import annotations

import json
import re
import sys

PATH = "/root/repo/BASELINE.md"


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_sf01_same_container.json"
    date = sys.argv[2] if len(sys.argv) > 2 else "2026-08-14"
    bench = json.load(open(src))
    if bench.get("sf") != 0.1:
        print(f"refusing: bench sf={bench.get('sf')} is not 0.1")
        return 1
    # anchor governance (r10, VERDICT r9 item 3): anchors may only come
    # from a run stamped anchor-eligible (quiet pre-run box, in-band
    # calibration). Artifacts predating the stamp are refused too —
    # re-run bench rather than re-anchoring from unknown provenance.
    if not bench.get("anchor_eligible"):
        print(
            "refusing: artifact is not anchor_eligible "
            f"(loaded_run={bench.get('loaded_run')}, "
            f"load_avg_start={bench.get('load_avg_start')})"
        )
        return 1
    q = dict(bench["queries"])
    lines = open(PATH).read().splitlines(keepends=True)
    row = re.compile(r"^\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|")
    out, seen, replaced = [], set(), 0
    last_row_idx = None
    for i, line in enumerate(lines):
        m = row.match(line)
        if m and m.group(1) in q:
            name = m.group(1)
            out.append(
                f"| {name} | {q[name]:.2f} | 0.1 | "
                f"local[32], shuffle=32, AQE on, clearCache-between | {date} |\n"
            )
            seen.add(name)
            replaced += 1
            last_row_idx = len(out) - 1
        else:
            out.append(line)
            if m:
                last_row_idx = len(out) - 1
    new_rows = [
        f"| {name} | {sec:.2f} | 0.1 | "
        f"local[32], shuffle=32, AQE on, clearCache-between | {date} |\n"
        for name, sec in q.items()
        if name not in seen
    ]
    if new_rows and last_row_idx is not None:
        out[last_row_idx + 1 : last_row_idx + 1] = new_rows
    open(PATH, "w").write("".join(out))
    print(f"re-anchored {replaced} rows, appended {len(new_rows)} new")
    return 0


if __name__ == "__main__":
    sys.exit(main())
