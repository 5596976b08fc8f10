"""Per-process scratch directories for queries with a write side.

The sink/ingest round-trip queries (plans/warehouse_queries.py) and
the stateful-stream maintenance queries (plans/streaming_queries.py)
each land real files — parquet samples, streaming checkpoints,
versioned sketch tables — before returning their audit-readback plan.
Before r9 every run mkdtemp'd a fresh tree under a hardcoded
repo-absolute ``.tmp/`` with no cleanup, so each bench repetition /
correctness pass / lint run permanently accumulated copies of the
sample tables (~1 GB over a few hundred runs).

Policy here (the r8 ADVICE fix):

* ONE per-process root, lazily created under the system temp dir and
  removed at interpreter exit (``atexit``). Within a process, each
  call still gets a fresh subdir — a prior call's returned DataFrame
  may lazily re-read its files, so nothing is deleted mid-process.
* Stale roots from crashed prior processes are reaped on first use,
  keyed on root mtime as a HEARTBEAT: every ``scratch_dir()`` call
  refreshes its own root's mtime, so a live long-running process keeps
  its root young no matter how long the run (the r9 ADVICE defect:
  reaping on creation-age with a 6 h window raced the 6 h bench
  rounds — a root created at round start looked stale to a process
  launched near round end even though its owner was still running).
  The window is 24 h — four round lengths past any live heartbeat.
* No hardcoded paths: the base derives from ``tempfile.gettempdir()``.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

_STALE_AFTER_S = 24 * 3600
_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh, empty directory under this process's scratch root;
    removed (with everything the caller wrote into it) at process
    exit."""
    global _ROOT
    if _ROOT is None:
        base = os.path.join(tempfile.gettempdir(), "mrs_scratch")
        os.makedirs(base, exist_ok=True)
        cutoff = time.time() - _STALE_AFTER_S
        for name in os.listdir(base):
            stale = os.path.join(base, name)
            try:
                if os.path.getmtime(stale) < cutoff:
                    shutil.rmtree(stale, ignore_errors=True)
            except OSError:
                pass
        _ROOT = tempfile.mkdtemp(prefix="run_", dir=base)
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    else:
        try:  # heartbeat: a live process keeps its root young
            os.utime(_ROOT)
        except OSError:
            pass
    return tempfile.mkdtemp(prefix=prefix + "_", dir=_ROOT)
