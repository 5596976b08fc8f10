"""CI guard for the plan-audit tripwires (r4, VERDICT item 1).

Round 3 found the tripwires red at HEAD because the last commits
registered queries without re-running `tools/plan_audit.py` /
`tools/scan_audit.py` (both sweep all ~200 plans — minutes, so they
run manually at zeroing time, not per-test-run). This guard keeps the
zero-findings contract incrementally cheap:

- `tools/audit_baseline.txt` records every query name that was
  registered when the audits last printed 0 findings.
- Any query registered SINCE then (not in the baseline) gets its
  batch plan built here and swept through the same `audit_plan`
  heuristics + the scan-duplication counter, so a new query with a
  CartesianProduct / row-UDF / SinglePartition-Window / silent
  double-scan fails CI immediately instead of rotting until the next
  manual sweep.
- Allowlists are cross-checked against the registry so deleted
  queries can't leave stale allowlist entries (the r3 finding in
  reverse).

After a full manual re-zeroing (`python tools/plan_audit.py &&
python tools/scan_audit.py`), regenerate the baseline:

    python -c "from movie_rankings_spark.plans import all_queries;
    open('tools/audit_baseline.txt','w').write(
    '\\n'.join(sorted(all_queries.QUERIES)) + '\\n')"
"""

from __future__ import annotations

import importlib.util
import pytest

from movie_rankings_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _load_tool(name: str):
    spec = importlib.util.spec_from_file_location(
        name, f"/root/repo/tools/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tools():
    return _load_tool("plan_audit"), _load_tool("scan_audit")


def _baseline() -> set[str]:
    with open("/root/repo/tools/audit_baseline.txt") as fh:
        return {ln.strip() for ln in fh if ln.strip()}


def test_no_stale_allowlist_entries(tools):
    plan_audit, scan_audit = tools
    registered = set(all_queries.QUERIES)
    for listname, lst in [
        ("plan_audit.NESTED_LOOP_LEGIT", plan_audit.NESTED_LOOP_LEGIT),
        ("plan_audit.ROW_PYTHON_LEGIT", plan_audit.ROW_PYTHON_LEGIT),
        ("plan_audit.GLOBAL_WINDOW_LEGIT", plan_audit.GLOBAL_WINDOW_LEGIT),
        ("scan_audit.KNOWN_LEGIT", scan_audit.KNOWN_LEGIT),
    ]:
        stale = set(lst) - registered
        assert not stale, f"{listname} names unregistered queries: {stale}"


def test_baseline_names_registered():
    gone = _baseline() - set(all_queries.QUERIES)
    assert not gone, (
        f"audit_baseline.txt lists deleted queries {gone} — regenerate it"
    )


def test_new_queries_pass_plan_and_scan_audit(spark, tools):
    plan_audit, scan_audit = tools
    new = [
        n
        for n in sorted(set(all_queries.QUERIES) - _baseline())
        if not n.startswith("stream_")
        and n not in plan_audit.EXECUTING
        and n not in scan_audit.EXECUTING
    ]
    problems = []
    for name in new:
        df = all_queries.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for flag in plan_audit.audit_plan(name, plan):
            problems.append(f"{name}: {flag}")
        counts = scan_audit.count_base_scans(plan)
        dups = {t: c for t, c in counts.items() if c > 1}
        if dups and name not in scan_audit.KNOWN_LEGIT:
            problems.append(f"{name}: duplicate base scans {dups}")
    assert not problems, (
        "queries added since the last audit zeroing trip the plan "
        f"audits (fix the plan or allowlist WITH a reason, then "
        f"regenerate tools/audit_baseline.txt): {problems}"
    )


def test_strip_initial_plans_dedupes_finalized_aqe_sections(tools):
    """A finalized AdaptiveSparkPlan (cached intermediate) prints its
    FileScan in BOTH the Final and Initial sections; the audit counter
    must see one scan (r10: embedding_pca_exact_project false red)."""
    _, scan_audit = tools
    plan = "\n".join(
        [
            "AdaptiveSparkPlan isFinalPlan=false",
            "+- InMemoryTableScan",
            "      +- AdaptiveSparkPlan isFinalPlan=true",
            "         +- == Final Plan ==",
            "            Result",
            "            +- FileScan parquet /x/embeddings.parquet",
            "         +- == Initial Plan ==",
            "            Project",
            "            +- FileScan parquet /x/embeddings.parquet",
            "+- BroadcastExchange",
            "   +- FileScan parquet /x/orders.parquet",
        ]
    )
    assert scan_audit.count_base_scans(plan) == {"embeddings": 1, "orders": 1}
