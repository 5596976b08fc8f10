"""Cogrouped-pandas as-of join — the `groupBy().cogroup()`
`applyInPandas` API surface (SURVEY.md §2j F3 family; SURVEY.md §2c
J4 gives the same semantics in pure-DataFrame form,
operators/asof.py).

Two implementations of one operator is deliberate: the union+window
form (asof.py) is the default scale path (one shuffle, JVM-side);
this cogrouped form demonstrates the escape hatch for per-key logic
the window vocabulary can't express — both sides of a key arrive in
one Python function as two pandas frames. The as-of merge is exactly
expressible both ways, which makes the cogroup path ORACLE-CHECKABLE
against the same DuckDB ASOF JOIN — a stronger check than the
rows-only gate most Python-resident operators get.

Scale posture: the cogroup key is a HASH BUCKET of the join key, not
the key itself — cogrouping per raw key pays the Arrow/pandas
per-group overhead once per key (measured 5× slower on many small
keys); per bucket, `merge_asof(..., by=key)` does the per-key as-of
in one vectorized call. Both sides shuffle once on the bucket (same
cost as the window form's single shuffle); bucket count bounds group
memory and parallelism independently of key cardinality — the same
two-level trick as salted top-k. Timestamps cross the boundary as
int64 microseconds — no tz/ns-resolution drift between the JVM,
Arrow, and pandas.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cogroup_asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    payload_dtypes: dict[str, str],
    schema: str,
    num_buckets: int = 64,
) -> DataFrame:
    """LEFT as-of join: for each left row, the latest right row of the
    same ``key`` with ts strictly earlier. ``left`` and ``right``
    must already carry ``ts_col`` as int64 (e.g. unix micros); right
    ties on ts resolve to the largest first payload column (matching
    the window form's deterministic dedup).

    ``payload_dtypes`` maps each right payload column to the pandas
    dtype its nullable ``prev_*`` output should carry (e.g. "Int64",
    "float64", "object") — merge_asof's NaN fill would otherwise
    leave integer payloads as float64, which Arrow refuses to put
    into a long field.
    """
    payload_cols = list(payload_dtypes)
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).alias("_b")

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.drop(columns=["_b"]).sort_values(ts_col, kind="mergesort")
        if rdf.empty:
            out = ldf.copy()
        else:
            rdf = (
                rdf.drop(columns=["_b"])
                .sort_values([ts_col, payload_cols[0]], kind="mergesort")
                .drop_duplicates([key, ts_col], keep="last")
                .sort_values(ts_col, kind="mergesort")
                .rename(columns={c: "prev_" + c for c in payload_cols})
            )
            out = pd.merge_asof(
                ldf,
                rdf,
                on=ts_col,
                by=key,
                allow_exact_matches=False,
                direction="backward",
            )
        for c, dtype in payload_dtypes.items():
            name = "prev_" + c
            if name not in out.columns:
                out[name] = pd.array([None] * len(out), dtype=dtype)
            else:
                out[name] = out[name].astype(dtype)
        return out

    return (
        left.withColumn("_b", bucket)
        .groupBy("_b")
        .cogroup(right.withColumn("_b", bucket).groupBy("_b"))
        .applyInPandas(merge, schema)
    )
