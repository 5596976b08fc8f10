"""Generate an sf1 perf dataset (10x sf0.1) for the scaling-curve bench.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); the 100 TB
claims rest on plan shapes, so one decade of empirical scaling
(VERDICT r3 item 2) needs a local sf1. This derives it from sf0.1 by
UNION-ing 10 key-shifted copies — never touching /root/testdata —
with two decorrelation steps so workload size scales LINEARLY in sf
instead of quadratically in the pair-based tiers:

- documents: every word in copies 1..9 gets a per-copy suffix, so
  cross-copy shingle overlap is zero — exact-dup groups and near-dup
  pair counts grow 10x, not 100x (10 verbatim copies of each doc
  would put 45 cross-copy pairs in every cluster). n_chars is
  recomputed from the rewritten text.
- embeddings: copy i rotates the 64-dim vector by i positions —
  norms (and the per-label planted structure within a copy) are
  preserved while cross-copy cosine decorrelates, so ANN/SemDeDup
  candidate sets scale linearly too.

Dimension tables (region, nation) are NOT scaled — TPC-H semantics.
Foreign keys (custkey/orderkey/partkey/suppkey/user_id) shift by
copy x stride so every join keeps its selectivity.

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

#: key column -> stride (max key + 1 at sf0.1; keys are 0-based dense)
STRIDES = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "o_custkey": 15_000,
    "l_orderkey": 150_000,
    "l_partkey": 20_000,
    "l_suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}

PASSTHROUGH = {
    "customer": ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": [
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ],
    "events": ["ts", "event_type", "value", "props"],
}

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def copy_select(table: str, i: int) -> str:
    keys = ", ".join(
        f"{k} + {i * STRIDES[k]} AS {k}" for k in KEYS[table]
    )
    rest = ", ".join(PASSTHROUGH[table])
    return f"SELECT {keys}, {rest} FROM src"


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
            f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied (dimension, unscaled)")
    for table in KEYS:
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        )
        union = " UNION ALL ".join(copy_select(table, i) for i in range(N))
        con.execute(
            f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    con.execute(
        f"CREATE OR REPLACE VIEW src AS "
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    )
    doc_parts = []
    for i in range(N):
        text = (
            "text"
            if i == 0
            else f"regexp_replace(text, '(\\S+)', '\\1k{i}', 'g')"
        )
        doc_parts.append(
            f"SELECT doc_id + {i * STRIDES['doc_id']} AS doc_id, "
            f"{text} AS text, lang, source, "
            f"CAST(length({text}) AS BIGINT) AS n_chars FROM src"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) "
        f"TO '{DST}/documents.parquet' (FORMAT PARQUET)"
    )
    print(
        "documents:",
        con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/documents.parquet')"
        ).fetchone()[0],
        "rows (per-copy word suffixes)",
    )

    con.execute(
        f"CREATE OR REPLACE VIEW src AS "
        f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')"
    )
    emb_parts = []
    for i in range(N):
        emb = (
            "embedding"
            if i == 0
            else f"list_concat(embedding[{i + 1}:], embedding[1:{i}])"
        )
        emb_parts.append(
            f"SELECT vec_id + {i * STRIDES['vec_id']} AS vec_id, "
            f"CAST({emb} AS FLOAT[]) AS embedding, label FROM src"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(emb_parts)}) "
        f"TO '{DST}/embeddings.parquet' (FORMAT PARQUET)"
    )
    print(
        "embeddings:",
        con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/embeddings.parquet')"
        ).fetchone()[0],
        "rows (per-copy rotation)",
    )


if __name__ == "__main__":
    main()
