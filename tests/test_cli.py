"""CLI entry point (python -m movie_rankings_spark) smoke."""

from __future__ import annotations

from movie_rankings_spark.__main__ import main


def test_cli_offline_runs(spark, capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "Scrape portion completed" in out
    assert "Top by SUM of ranks" in out
    assert "the godfather" in out
