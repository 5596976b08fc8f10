"""Driver-contract guards for bench.py and the registry ordering.

The harness that records bench output keeps only the final ~2000
characters of the run (BENCH_r01/r02 both show `parsed: null` because
the full 92-query JSON line overflowed that window). These tests pin
the printed line under that budget regardless of how many queries the
suite grows to, and pin the correctness-harness ordering contract
(first ~50 dict entries get driver rows).
"""

from __future__ import annotations

import json

import bench
from movie_rankings_spark.plans import all_queries


def _fake_timings() -> dict[str, float]:
    # worst-case widths: three-digit seconds for every query
    return {name: 123.456 for name in bench.HEADLINE_QUERIES}


def test_compact_line_fits_recorder_window():
    line = bench.compact_payload(_fake_timings(), sf=0.1)
    assert len(line) <= bench.COMPACT_BUDGET
    payload = json.loads(line)
    assert payload["metric"] == "headline_suite_seconds"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.1
    assert payload["n_run"] == len(bench.HEADLINE_QUERIES)
    # total covers ALL measured queries even though the printed map is a slice
    assert payload["value"] == round(123.456 * len(bench.HEADLINE_QUERIES), 2)
    assert payload["queries"]  # non-empty slice


def test_compact_line_keeps_tier_representatives():
    line = bench.compact_payload(_fake_timings(), sf=0.1)
    queries = json.loads(line)["queries"]
    # every tier representative that was measured must survive the cut
    for name in bench.COMPACT_PRIORITY:
        assert name in queries, name


def test_compact_payload_handles_tiny_budget(monkeypatch):
    monkeypatch.setattr(bench, "COMPACT_BUDGET", 200)
    line = bench.compact_payload(_fake_timings(), sf=0.1)
    assert len(line) <= 200
    assert json.loads(line)["n_run"] == len(bench.HEADLINE_QUERIES)


def test_headline_queries_all_registered():
    for name in bench.HEADLINE_QUERIES:
        assert name in all_queries.QUERIES, name


def test_registry_head_prioritizes_unseen_queries():
    """The head of the dict (the slice a capped correctness harness
    checks first) must be exactly the queries that lack a driver row
    in CORRECTNESS_r01/r02 — nothing already-verified may displace
    them."""
    head = list(all_queries.QUERIES)[: len(all_queries._UNSEEN_FIRST)]
    for name in all_queries._UNSEEN_FIRST:
        assert name in all_queries.QUERIES, name
        assert name in head, name


def test_registry_queries_and_oracles_align():
    # oracles must be a subset of queries, in a consistent order
    assert set(all_queries.ORACLES) <= set(all_queries.QUERIES)


def test_compact_line_carries_calibration():
    line = bench.compact_payload(_fake_timings(), sf=0.1, calibration=0.4321)
    assert len(line) <= bench.COMPACT_BUDGET
    payload = json.loads(line)
    assert payload["calib"] == 0.4321
    for name in bench.COMPACT_PRIORITY:  # calib must not evict a rep
        assert name in payload["queries"], name


def test_default_bench_out_is_round_stamped(tmp_path):
    # next round after the highest driver artifact, never a fixed name
    for n in (1, 2, 6):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
    out = bench._default_bench_out(str(tmp_path), "sf0.1")
    assert out.endswith("BENCH_FULL_r07_sf0.1.json")
    assert bench._default_bench_out(str(tmp_path / "empty"), "sf1").endswith(
        "BENCH_FULL_r00_sf1.json"
    )


def test_loaded_run_quarantined_by_name(tmp_path):
    """r9 (verdict item 6): a run whose calibration exceeds 1.2x the
    BASELINE.md anchor must not claim the round-stamped artifact name."""
    import bench

    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BASELINE.md").write_text(
        "Calibration anchor (bench.py::calibration_seconds, the fixed\n"
        "lineitem scan+agg): **0.1588s** — divide.\n"
    )
    assert bench._calibration_anchor(str(tmp_path)) == 0.1588
    quiet = bench._default_bench_out(str(tmp_path), "sf0.1", loaded=False)
    loaded = bench._default_bench_out(str(tmp_path), "sf0.1", loaded=True)
    assert quiet.endswith("BENCH_FULL_r04_sf0.1.json")
    assert loaded.endswith("BENCH_FULL_r04_sf0.1_LOADED.json")
    assert bench.CALIBRATION_LOAD_BAND == 1.2
