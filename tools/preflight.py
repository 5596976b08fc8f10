"""Pre-snapshot gate: the minimum set of checks that MUST be green
before any end-of-round (or milestone) commit.

Runs, in order:
  1. pytest tests/test_plan_shapes.py  — plan pins + Python-stage allowlist
  2. tools/plan_audit.py               — physical-plan anti-pattern audit
  3. tools/scan_audit.py               — scan/pushdown audit

Exits non-zero on the first failure. This exists because two rounds in
a row shipped a final commit whose last change invalidated a plan pin
without re-running the suite (r3 verdict "What's wrong" #1, recurring
at r4). Usage:

    python tools/preflight.py [sf_dir]
"""

from __future__ import annotations

import subprocess
import sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

STEPS = [
    [sys.executable, "-m", "pytest", "tests/test_plan_shapes.py", "-q",
     "--no-header", "-p", "no:cacheprovider"],
    [sys.executable, "tools/plan_audit.py", SF_DIR],
    [sys.executable, "tools/scan_audit.py", SF_DIR],
]


def main() -> int:
    for cmd in STEPS:
        print(f"[preflight] {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd, cwd="/root/repo")
        if rc != 0:
            print(f"[preflight] FAILED (rc={rc}): {' '.join(cmd)}")
            return rc
    print("[preflight] ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
