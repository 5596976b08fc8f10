"""Interchange file sources (SURVEY.md §2a S8 [EXT] breadth) — CSV,
JSON-lines, and ORC readers alongside the parquet catalog.

The reference ingests only live HTML (top_movies.py:30-44); an engine
that replaces it must also read whatever files land in the lake. Rules
encoded here, chosen for the 100 TB posture:

  * **Schemas are mandatory** for CSV/JSON. Schema inference is a full
    extra scan of the data before the real query (at 100 TB: reading
    everything twice) and silently types edge cases by whatever the
    sample contained. Callers pass the DDL string once.
  * **No multiline JSON.** JSON-lines splits by newline, so a 1 TB
    file still parallelizes per HDFS block; ``multiLine=true`` forces
    one task per file and is refused here.
  * **Corrupt-record capture, not crash**: both text formats keep a
    ``_corrupt_record`` column (PERMISSIVE) so one bad row in a
    billion quarantines instead of failing the job. Spark disallows
    scans that reference ONLY the corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the dead-letter split runs
    on the parsed output — parse once, persist or write, then filter
    ``is_corrupt()`` both ways.
  * ORC is columnar like parquet — predicate pushdown and column
    pruning work natively, schema optional.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} string"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with an explicit schema (no inference scan) and PERMISSIVE
    corrupt-row capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("nullValue", "\\N")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines with an explicit schema. multiLine stays false by
    design — a multiline JSON file cannot be split across tasks."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("multiLine", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: columnar, self-describing, native pushdown — the parquet
    peer for lakes standardized on ORC."""
    return spark.read.orc(path)


def is_corrupt() -> Column:
    """Filter predicate for the dead-letter split."""
    return F.col(CORRUPT_COL).isNotNull()


def good_rows(df: DataFrame) -> DataFrame:
    """The clean side: corrupt rows dropped, marker column removed."""
    return df.filter(~is_corrupt()).drop(CORRUPT_COL)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
