"""Pre-snapshot gate: the minimum set of checks that MUST be green
before any end-of-round (or milestone) commit.

Runs, in order:
  1. pytest tests/test_plan_shapes.py  — plan pins + Python-stage allowlist
  2. tools/plan_audit.py               — physical-plan anti-pattern audit
  3. tools/scan_audit.py               — scan/pushdown audit

Exits non-zero on the first failure. This exists because two rounds in
a row shipped a final commit whose last change invalidated a plan pin
without re-running the suite (r3 verdict "What's wrong" #1, recurring
at r4).

Usage:

    python tools/preflight.py [sf_dir]                 # full gate
    python tools/preflight.py [sf_dir] --changed-only [REF]

``--changed-only`` (r6 verdict item: the full 480+-param suite takes
>10 min, which discourages running it mid-round) restricts all three
steps to the queries affected by files changed since REF (default
HEAD, i.e. uncommitted work). A query is affected when its plans
module changed, or a changed operators/functions module's public
symbols (or basename) appear in the query function's source. Changes
OUTSIDE plans/operators/functions (session.py, catalog.py, sources/,
streaming/, …) cut across queries, so they fall back to the full
gate. The full run remains the end-of-round requirement.
"""

from __future__ import annotations

import re
import subprocess
import sys

REPO = "/root/repo"

#: affected-query mapping only understands these trees; anything else
#: changed -> full gate (cross-cutting by construction)
_MAPPABLE = ("movie_rankings_spark/plans/", "movie_rankings_spark/operators/",
             "movie_rankings_spark/functions/")
_IGNORED = ("tests/", "tools/", "docs/", ".claude/")


def _changed_files(ref: str) -> list[str]:
    diff = subprocess.run(
        ["git", "diff", "--name-only", ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    untracked = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return sorted({f for f in diff + untracked if f.endswith(".py")})


def _public_symbols(path: str) -> set[str]:
    syms = set()
    try:
        with open(f"{REPO}/{path}", encoding="utf-8") as fh:
            for line in fh:
                m = re.match(r"(?:def|class)\s+([A-Za-z_]\w*)", line)
                if m and not m.group(1).startswith("_"):
                    syms.add(m.group(1))
    except OSError:
        pass
    return syms


def _changed_line_ranges(ref: str, path: str) -> list[tuple[int, int]] | None:
    """(start, end) new-file line ranges changed since ref, or None
    when the file is untracked/unreadable (treat the whole file as
    changed)."""
    try:
        diff = subprocess.run(
            ["git", "diff", "-U0", ref, "--", path],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except subprocess.CalledProcessError:
        return None
    if not diff:
        return None  # untracked (git diff prints nothing)
    ranges = []
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        ranges.append((start, start + max(count, 1) - 1))
    return ranges


def affected_queries(changed: list[str], ref: str) -> list[str] | None:
    """Query names touched by ``changed`` files, or None for
    "cannot scope — run the full gate". A changed plans module scopes
    to the query FUNCTIONS whose bodies intersect the diff hunks
    (module-level edits — imports, shared oracle SQL — scope to the
    whole module); a changed operator/function module scopes to
    queries whose source mentions its basename or public symbols."""
    import inspect

    sys.path.insert(0, REPO)
    from movie_rankings_spark.plans.all_queries import QUERIES

    relevant = [f for f in changed if not f.startswith(_IGNORED)
                and f != "bench.py" and f != "__spark_entry__.py"]
    if not relevant:
        return []
    if any(not f.startswith(_MAPPABLE) for f in relevant):
        return None
    # tokens to look for inside each query function's source: the
    # changed module's basename (module-qualified uses) and its public
    # defs (from-imports used bare)
    tokens: set[str] = set()
    plan_ranges: dict[str, list[tuple[int, int]] | None] = {}
    for f in relevant:
        base = f.rsplit("/", 1)[-1].removesuffix(".py")
        if f.startswith("movie_rankings_spark/plans/"):
            plan_ranges[f] = _changed_line_ranges(ref, f)
        else:
            tokens.add(base)
            tokens |= _public_symbols(f)
    pat = (
        re.compile(r"\b(" + "|".join(map(re.escape, sorted(tokens))) + r")\b")
        if tokens
        else None
    )
    # line spans of every query fn per plans module (for hunk overlap)
    spans: dict[str, list[tuple[int, int, str]]] = {}
    for name, fn in QUERIES.items():
        mod_file = inspect.getsourcefile(fn) or ""
        rel = mod_file.removeprefix(REPO + "/")
        lines, start = inspect.getsourcelines(fn)
        spans.setdefault(rel, []).append((start, start + len(lines) - 1, name))

    out: set[str] = set()
    for f, ranges in plan_ranges.items():
        fn_spans = spans.get(f, [])
        if ranges is None:
            out |= {n for _, _, n in fn_spans}  # untracked: whole file
            continue
        covered = set()
        try:
            file_lines = open(f"{REPO}/{f}", encoding="utf-8").readlines()
        except OSError:
            file_lines = []
        for lo, hi in ranges:
            hit = [
                n for s, e, n in fn_spans if s <= hi and lo <= e
            ]
            covered.update(hit)
            if hit:
                continue
            # module-level edit. If the hunk sits inside assignments to
            # named constants (shared oracle SQL etc.), scope to the
            # queries in this module that reference those names; only a
            # nameless module edit (imports, bare code) takes the whole
            # module.
            consts = {
                m.group(1)
                for ln in file_lines[max(lo - 1, 0) : hi]
                for m in [re.match(r"([A-Za-z_]\w*)\s*=", ln)]
                if m
            }
            # widen to the assignment the hunk is INSIDE of (a changed
            # line mid-string has no '=' on it): scan upward for the
            # nearest module-level assignment
            if not consts:
                for ln in reversed(file_lines[: max(lo - 1, 0)]):
                    m = re.match(r"([A-Za-z_]\w*)\s*=", ln)
                    if m:
                        consts = {m.group(1)}
                        break
                    if re.match(r"(def|class|@)", ln):
                        break
            users = set()
            if consts:
                cpat = re.compile(
                    r"\b(" + "|".join(map(re.escape, sorted(consts))) + r")\b"
                )
                users = {
                    n
                    for s, e, n in fn_spans
                    if cpat.search("".join(file_lines[s - 1 : e]))
                }
            covered |= users or {n for _, _, n in fn_spans}
        out |= covered
    if pat is not None:
        for name, fn in QUERIES.items():
            if name not in out and pat.search(inspect.getsource(fn)):
                out.add(name)
    return [n for n in QUERIES if n in out]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    changed_only = False
    ref = "HEAD"
    if "--changed-only" in args:
        i = args.index("--changed-only")
        args.pop(i)
        if i < len(args) and not args[i].startswith("-") and "/" not in args[i]:
            # bare word after the flag that isn't a path -> git ref
            if not args[i].startswith("sf") and "testdata" not in args[i]:
                ref = args.pop(i)
        changed_only = True
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    names: list[str] = []
    if changed_only:
        changed = _changed_files(ref)
        scoped = affected_queries(changed, ref)
        if scoped is None:
            print(
                "[preflight] changed files cut across queries "
                f"({len(changed)} changed since {ref}) — running FULL gate"
            )
        elif not scoped:
            print(f"[preflight] no affected queries since {ref} — ALL GREEN")
            return 0
        elif len(scoped) > 80:
            print(
                f"[preflight] {len(scoped)} affected queries since {ref} "
                "— cheaper to run the FULL gate"
            )
        else:
            names = scoped
            print(
                f"[preflight] scoped to {len(names)} queries since {ref}: "
                + " ".join(names[:12])
                + (" …" if len(names) > 12 else "")
            )

    kexpr = " or ".join(names)
    steps = [
        [sys.executable, "-m", "pytest", "tests/test_plan_shapes.py", "-q",
         "--no-header", "-p", "no:cacheprovider"]
        + (["-k", kexpr] if names else []),
        [sys.executable, "tools/plan_audit.py", sf_dir] + names,
        [sys.executable, "tools/scan_audit.py", sf_dir] + names,
    ]
    for cmd in steps:
        print(f"[preflight] {' '.join(cmd[:8])}{' …' if len(cmd) > 8 else ''}",
              flush=True)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            print(f"[preflight] FAILED (rc={rc}): {' '.join(cmd[:8])}")
            return rc
    print("[preflight] ALL GREEN" + (" (changed-only)" if names else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
