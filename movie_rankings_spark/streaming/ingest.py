"""Incremental file ingestion with exactly-once semantics — the
landing-zone → lake loader every pipeline runs upstream of the query
tiers.

``readStream`` over a directory + ``availableNow`` + a durable
checkpoint gives incremental loads with no bookkeeping of our own:
the checkpoint's file log records which source files each committed
micro-batch read, so re-running the same job skips everything already
ingested (crash replay included — a batch that wrote data but failed
to commit is re-run idempotently because the parquet sink writes to
the batch's own output files before the commit log records them).
New files landing in the directory are picked up by the next run.

At 100 TB this is the same job with a cron/Trigger schedule; the only
sizing knob is ``maxFilesPerTrigger`` (bound the per-batch working
set) — the checkpoint log scales with file count, not data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ingest_to_parquet(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Drain everything currently available into ``out_path`` exactly
    once, tracked by ``checkpoint_path``. Safe to call repeatedly —
    already-ingested source files are skipped via the checkpoint's
    file log."""
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_file_stream(
    spark: SparkSession, src_dir: str, schema: str, fmt: str = "parquet"
) -> DataFrame:
    """Unbounded view of a landing directory. Schema is mandatory —
    streaming sources cannot infer, and at scale you would not want
    them to."""
    reader = spark.readStream.schema(schema)
    if fmt == "parquet":
        return reader.parquet(src_dir)
    if fmt == "json":
        return reader.json(src_dir)
    if fmt == "csv":
        return reader.option("header", True).csv(src_dir)
    raise ValueError(f"unsupported stream format {fmt!r}")
