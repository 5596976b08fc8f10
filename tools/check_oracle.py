"""Local mimic of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a scale factor and
compares it against the matching ``oracle_sql()`` in DuckDB:
row count, column names, and order-insensitive value equality.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from movie_rankings_spark.catalog import TABLES, table_path  # noqa: E402
from movie_rankings_spark.session import get_spark  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes the way a value-hash would see them
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_df), _normalize(duck_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(av)} values differ; first@{i}: "
                f"spark={x!r} duck={y!r}"
            )
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    statuses: dict[str, str] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            statuses[name] = "FAIL"
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(sdf)} (no oracle — rows-only check)")
            statuses[name] = "rows-only"
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            statuses[name] = "FAIL"
            failures += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            failures += 1
            statuses[name] = "FAIL"
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            statuses[name] = "oracle-pass"
            print(f"PASS  {name}: rows={len(sdf)}")
    print(f"\n{failures} failures / {len(queries)} queries")
    if not only:  # full runs refresh the local-status snapshot
        import json

        with open("/root/repo/ORACLE_LOCAL.json", "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "statuses": statuses}, fh, indent=1,
                sort_keys=True,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
