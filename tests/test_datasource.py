"""Python DataSource V2 front-end (sources/datasource.py, round 3)."""

from __future__ import annotations

import json

from movie_rankings_spark.sources import datasource
from movie_rankings_spark.sources.html import scraped_from_sources
from movie_rankings_spark.sources.scrape_fixtures import (
    FIXTURE_SOURCES,
    FixtureFetcher,
)


def _read(spark, sources):
    datasource.register(spark)
    return (
        spark.read.format("movie_rankings")
        .option("fetcher", "fixture")
        .option(
            "sources",
            json.dumps([{"url": s.url, "dialect": s.dialect} for s in sources]),
        )
        .load()
    )


def test_matches_mapinpandas_ingestion(spark):
    via_ds = {tuple(r) for r in _read(spark, FIXTURE_SOURCES).collect()}
    via_map = {
        tuple(r)
        for r in scraped_from_sources(
            spark, FIXTURE_SOURCES, FixtureFetcher()
        ).collect()
    }
    assert via_ds == via_map and via_ds


def test_one_partition_per_source(spark):
    assert _read(spark, FIXTURE_SOURCES).rdd.getNumPartitions() == 3
    assert _read(spark, FIXTURE_SOURCES[:1]).rdd.getNumPartitions() == 1


def test_dead_source_yields_zero_rows_not_failure(spark):
    from movie_rankings_spark.sources.html import SourceSpec

    dead = FIXTURE_SOURCES + (SourceSpec("fixture://no-such-page", "imdb"),)
    good = _read(spark, FIXTURE_SOURCES).count()
    assert _read(spark, dead).count() == good


def test_streaming_polling_source_drains_bounded_feed(spark, tmp_path):
    """readStream over the same format: 3 polls of the fixture
    sources, offset stops advancing at max_polls, every poll emits
    the full scrape."""
    import json as _json
    import time

    datasource.register(spark)
    per_poll = _read(spark, FIXTURE_SOURCES).count()
    df = (
        spark.readStream.format("movie_rankings")
        .option("fetcher", "fixture")
        .option("max_polls", "3")
        .option(
            "sources",
            _json.dumps(
                [{"url": s.url, "dialect": s.dialect} for s in FIXTURE_SOURCES]
            ),
        )
        .load()
    )
    name = "rankings_poll_sink"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        expected = 3 * per_poll
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table(name).count() >= expected:
                break
            time.sleep(0.5)
        got = spark.table(name)
        assert got.count() == expected, (got.count(), expected)
        # each poll re-emits the identical scrape
        assert got.distinct().count() == per_poll
    finally:
        q.stop()


def test_udtf_front_end_matches_other_paths(spark):
    """Three ingestion front-ends, one row set."""
    from movie_rankings_spark.sources import udtf as u

    u.register(spark)
    spark.createDataFrame(
        [(s.url, s.dialect) for s in FIXTURE_SOURCES], "url string, dialect string"
    ).createOrReplaceTempView("udtf_srcs")
    via_udtf = {
        tuple(r)
        for r in spark.sql(
            """SELECT s.url, p.rank, p.title
               FROM udtf_srcs s,
                    LATERAL parse_ranked_list(s.url, s.dialect, 'fixture') p"""
        ).collect()
    }
    via_map = {
        tuple(r)
        for r in scraped_from_sources(
            spark, FIXTURE_SOURCES, FixtureFetcher()
        ).collect()
    }
    assert via_udtf == via_map and via_udtf


def test_python_datasource_writer_roundtrip(spark, tmp_path):
    """The custom format's WRITE path: two-phase commit (temp files ->
    driver rename + _SUCCESS), overwrite and append modes, and content
    parity through a plain JSON read-back."""
    import json
    import os

    from movie_rankings_spark.sources.datasource import register
    from movie_rankings_spark.sources.fixtures import scraped_fixture_df

    register(spark)
    df = scraped_fixture_df(spark)
    out = str(tmp_path / "rankings_out")

    df.write.format("movie_rankings").mode("overwrite").save(out)
    files = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert files and all(f.endswith(".jsonl") for f in files)
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")]
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["n_rows_last_commit"] == df.count()

    back = spark.read.json(f"{out}/part-*.jsonl")
    want = {(r["url"], r["rank"], r["title"]) for r in df.collect()}
    got = {(r["url"], r["rank"], r["title"]) for r in back.collect()}
    assert got == want

    # append mode adds files and rows; overwrite resets
    df.write.format("movie_rankings").mode("append").save(out)
    assert spark.read.json(f"{out}/part-*.jsonl").count() == 2 * df.count()
    df.write.format("movie_rankings").mode("overwrite").save(out)
    assert spark.read.json(f"{out}/part-*.jsonl").count() == df.count()


def test_python_datasource_writer_gap_safe_append(spark, tmp_path):
    """r4 fix: append after external cleanup left GAPS in part
    numbering must not overwrite a surviving part (the old count-based
    start index aliased part-00000 when part-00001+ were deleted), and
    stray _tmp_ files from dead tasks are swept at commit."""
    import os

    from movie_rankings_spark.sources.datasource import register
    from movie_rankings_spark.sources.fixtures import scraped_fixture_df

    register(spark)
    df = scraped_fixture_df(spark)
    n = df.count()
    out = str(tmp_path / "rankings_gap")

    df.write.format("movie_rankings").mode("overwrite").save(out)
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert len(parts) >= 2, "need multiple parts for the gap scenario"
    # external cleanup removes every part EXCEPT the first -> gap
    for f in parts[1:]:
        os.remove(os.path.join(out, f))
    survivor_rows = spark.read.json(f"{out}/{parts[0]}").count()
    # a stray temp from a DIFFERENT writer (foreign wid): append-mode
    # sweeps are scoped to the committing writer's own wid (r5 advice
    # fix — sweeping every _tmp_* would delete a concurrent appender's
    # in-flight files and fail its commit), so this must SURVIVE the
    # append below...
    stray = os.path.join(out, "_tmp_deadbeef_0000.jsonl")
    open(stray, "w").close()

    df.write.format("movie_rankings").mode("append").save(out)
    # survivor intact + full new append, nothing silently replaced
    assert (
        spark.read.json(f"{out}/part-*.jsonl").count() == survivor_rows + n
    )
    assert parts[0] in os.listdir(out)
    assert os.path.exists(stray)
    # ...and the committing writer's own temps are always gone
    assert (
        len([f for f in os.listdir(out) if f.startswith("_tmp_")]) == 1
    )
    # overwrite claims the whole directory: foreign orphans swept too
    df.write.format("movie_rankings").mode("overwrite").save(out)
    assert not os.path.exists(stray)
    assert spark.read.json(f"{out}/part-*.jsonl").count() == n
