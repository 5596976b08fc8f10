"""Named-query registry.

Every implemented operator from SURVEY.md §2 registers here as
(spark, sf_dir) -> DataFrame plus, where SQL-expressible, a DuckDB
oracle string. Column names/aliases MUST match between the two sides;
float aggregates go through an exact per-row decimal cast so both
engines produce bit-identical doubles regardless of summation order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Registry:
    queries: dict[str, QueryFn] = field(default_factory=dict)
    oracles: dict[str, str] = field(default_factory=dict)

    def register(self, name: str, oracle: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            self.queries[name] = fn
            if oracle is not None:
                self.oracles[name] = oracle
            return fn

        return deco


REGISTRY = Registry()

# --- shared SQL fragments (DuckDB dialect) ---------------------------------

#: exact revenue sum: per-row decimal cast -> exact sum -> double
REVENUE_SUM_SQL = (
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"
)

#: title normalization, DuckDB spelling of functions/normalize.py
#: (needs the 'g' flag — DuckDB replaces first match only by default)
def norm_title_sql(col: str) -> str:
    return (
        f"lower(regexp_replace(regexp_replace({col}, "
        f"'[^a-zA-Z0-9 ]', '', 'g'), '\\s{{2,}}', ' ', 'g'))"
    )


ALIAS_CASE_SQL = (
    "CASE title WHEN 'Seven' THEN 'Se7en' "
    "WHEN 'Star Wars' THEN 'Star Wars: Episode IV — A New Hope' "
    "WHEN 'Indiana Jones and the Raiders of the Lost Ark' "
    "THEN 'Raiders of the Lost Ark' ELSE title END"
)


def flagship_tail_sql(n_sources: int, k: int = 10) -> str:
    """The shared flagship tail: count-filter -> agg -> ordered top-k.
    Expects a CTE named `norm` with (url, rank int, title_comp)."""
    return f"""
counted AS (
  SELECT *, COUNT(*) OVER (PARTITION BY title_comp) AS _n FROM norm
)
SELECT title_comp,
       CAST(SUM(rank) AS BIGINT) AS rank_sum,
       AVG(rank)                 AS rank_avg,
       COUNT(*)                  AS n_rows
FROM counted WHERE _n = {n_sources}
GROUP BY title_comp
ORDER BY rank_sum ASC, title_comp ASC
LIMIT {k}"""
