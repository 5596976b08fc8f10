"""Python DataSource V2 for the ranked-lists HTML source.

SURVEY.md §2a S1 names the end state for the reference's scraper at
scale: "a DataSource V2 / spark.read.format(...) custom source". This
is that source, on Spark 4's Python DataSource API:

    spark.dataSource.register(RankingsDataSource)
    df = (spark.read.format("movie_rankings")
          .option("fetcher", "fixture")        # or "http" (default)
          .option("sources", json.dumps([{"url": ..., "dialect": ...}]))
          .load())

Compared to the mapInPandas ingestion path (sources/html.py,
`scraped_from_sources` — same extractors, same fault model), the
DataSource form gives the engine the source topology: one
InputPartition per URL, so Spark schedules, retries, and speculates
per source like any other scan, and the reader composes with every
`spark.read` feature (schema, unionByName, caching) without helper
functions. Both paths share DIALECTS and the zero-rows-on-failure
contract (reference `top_movies.py:50-67`: source dropout ≠ job
failure).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from movie_rankings_spark.sources.html import (
    DEFAULT_SOURCES,
    SCRAPED_SCHEMA,
    SourceSpec,
)


class SourcePartition(InputPartition):
    def __init__(self, url: str, dialect: str):
        self.url = url
        self.dialect = dialect


class RankingsDataSource(DataSource):
    """`format("movie_rankings")` — one partition per ranked-list URL."""

    @classmethod
    def name(cls) -> str:
        return "movie_rankings"

    def schema(self) -> str:
        return SCRAPED_SCHEMA

    def reader(self, schema) -> "RankingsReader":
        return RankingsReader(self.options)

    def simpleStreamReader(self, schema) -> "RankingsStreamReader":
        return RankingsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "RankingsJsonlWriter":
        return RankingsJsonlWriter(self.options, schema, overwrite)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, n_rows: int):
        self.tmp_file = tmp_file
        self.n_rows = n_rows


class RankingsJsonlWriter(DataSourceWriter):
    """Write side of the custom format: JSON-lines part files with the
    full TWO-PHASE commit contract — tasks write to temp names and
    report them in commit messages; only the driver-side commit()
    renames them into place and stamps _SUCCESS (+ a row-count
    manifest), so a failed/speculated task leaves no visible output
    and abort() removes every temp. This is the same visibility
    protocol as Spark's file committers, expressed through the Python
    DataSource writer API:

        df.write.format("movie_rankings").mode(...).save(path)
    """

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("movie_rankings writer requires a path")
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # Writer id minted once on the driver; every task writes temps
        # under it, and the sweep only ever touches THIS writer's
        # temps — a concurrent appender's in-flight _tmp_<other-wid>_*
        # files are invisible to us (the advice fix: sweeping every
        # _tmp_* would delete the other writer's files and fail its
        # commit at os.replace).
        import uuid as _uuid

        self.wid = _uuid.uuid4().hex[:12]

    def write(self, iterator) -> "_JsonlCommit":
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_tmp_{self.wid}_{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    _json.dumps(dict(zip(self.columns, row)), sort_keys=True)
                )
                fh.write("\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import json as _json
        import os
        import re
        import uuid

        if self.overwrite:
            # Overwrite claims the whole directory (it deletes every
            # part), so it also sweeps ALL stray temps — including a
            # long-dead writer's orphans append mode must leave alone.
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") and (
                    f.startswith("part-")
                    or (f.startswith("_tmp_") and f not in
                        {os.path.basename(m.tmp_file) for m in messages})
                ):
                    os.remove(os.path.join(self.path, f))
        # Next index = max(existing part numbers) + 1, NOT the file
        # COUNT: gapped numbering (external cleanup, partial prior
        # failure) would otherwise alias an existing part and
        # os.replace would silently drop its rows in append mode. A
        # per-commit uuid in the name additionally keeps two
        # concurrent appenders from colliding on the same index.
        existing = [
            int(m.group(1))
            for f in os.listdir(self.path)
            if (m := re.match(r"part-(\d+)-[0-9a-f]{8}\.jsonl$", f))
            or (m := re.match(r"part-(\d+)\.jsonl$", f))
        ]
        start = max(existing, default=-1) + 1
        cid = uuid.uuid4().hex[:8]
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{start + i:05d}-{cid}.jsonl"
            )
            os.replace(m.tmp_file, final)
            total += m.n_rows
        self._sweep_stray_temps(messages)
        with open(
            os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"
        ) as fh:
            fh.write(_json.dumps({"n_rows_last_commit": total}))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.tmp_file)
            except OSError:
                pass
        self._sweep_stray_temps(messages)

    def _sweep_stray_temps(self, messages) -> None:
        """Remove temp files from THIS writer's tasks that died before
        reporting a commit message (speculation losers, executor
        crashes) — abort only sees REPORTED temps, so both terminal
        paths sweep. Scoped to the writer id: a concurrent appender's
        temps carry a different wid and are never touched."""
        import os

        reported = {os.path.basename(m.tmp_file) for m in messages}
        try:
            names = os.listdir(self.path)
        except OSError:
            return
        for f in names:
            if (
                f.startswith(f"_tmp_{self.wid}_")
                and f.endswith(".jsonl")
                and f not in reported
            ):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass


class RankingsReader(DataSourceReader):
    def __init__(self, options):
        raw = options.get("sources")
        if raw:
            self.sources = tuple(
                SourceSpec(s["url"], s["dialect"]) for s in json.loads(raw)
            )
        else:
            self.sources = DEFAULT_SOURCES
        self.fetcher = options.get("fetcher", "http")

    def partitions(self):
        # one partition per URL: the engine owns scheduling/retry/
        # speculation per source, the exact topology the mapInPandas
        # path had to fake with a repartition
        return [SourcePartition(s.url, s.dialect) for s in self.sources]

    def read(self, partition: SourcePartition):
        from movie_rankings_spark.sources.html import DIALECTS, http_fetch

        if self.fetcher == "fixture":
            from movie_rankings_spark.sources.scrape_fixtures import FixtureFetcher

            fetch = FixtureFetcher()
        else:
            fetch = http_fetch
        try:
            html = fetch(partition.url)
            for rank, title in DIALECTS[partition.dialect](html):
                yield (partition.url, rank, title)
        except Exception:  # noqa: BLE001 — S2: source dropout ≠ job failure
            return


class RankingsStreamReader(SimpleDataSourceStreamReader):
    """`spark.readStream.format("movie_rankings")` — a polling stream:
    each micro-batch re-fetches every source (the streaming version of
    the reference's one-shot scrape). The offset is the poll counter,
    so replay (`readBetweenOffsets`) re-fetches the same sources —
    exactly-once delivery downstream relies on the fetch being
    deterministic per poll (true for fixtures; a production HTTP feed
    would log payloads to make replays faithful, the standard
    Kafka-less source pattern). ``max_polls`` bounds the feed (the
    offset stops advancing), letting tests drain it deterministically.
    """

    def __init__(self, options):
        inner = RankingsReader(options)
        self.sources = inner.sources
        self.fetcher = inner.fetcher
        self.max_polls = int(options.get("max_polls", "0") or 0)  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _scrape_once(self):
        from movie_rankings_spark.sources.html import DIALECTS, http_fetch

        if self.fetcher == "fixture":
            from movie_rankings_spark.sources.scrape_fixtures import FixtureFetcher

            fetch = FixtureFetcher()
        else:
            fetch = http_fetch
        for s in self.sources:
            try:
                html = fetch(s.url)
                for rank, title in DIALECTS[s.dialect](html):
                    yield (s.url, rank, title)
            except Exception:  # noqa: BLE001 — dropout ≠ stream failure
                continue

    def read(self, start: dict):
        p = start["poll"]
        if self.max_polls and p >= self.max_polls:
            return iter([]), {"poll": p}
        # materialized: the engine's prefetch cache copies this
        # iterator (copy.copy), which a generator can't survive
        return iter(list(self._scrape_once())), {"poll": p + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for _ in range(start["poll"], end["poll"]):
            yield from self._scrape_once()


def register(spark) -> None:
    """Idempotent registration of the format with a session."""
    try:
        spark.dataSource.register(RankingsDataSource)
    except Exception:  # already registered
        pass
