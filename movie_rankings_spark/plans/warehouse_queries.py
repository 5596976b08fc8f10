"""Warehouse-lifecycle tier: SCD2 history, conversion attribution,
z-order layout.

Round-3 additions to the [EXT] surface — the slowly-changing-dimension
and data-layout machinery a 100 TB warehouse runs daily, each as a
registered oracle-checked query over the standard test tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators.attribution import last_touch_attribution
from movie_rankings_spark.operators.layout import morton_sql, zorder_bucket_stats
from movie_rankings_spark.operators.scd2 import scd2_history
from movie_rankings_spark.plans.registry import REGISTRY


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- SCD Type-2 history -----------------------------------------------------

_SCD2_ORACLE = """
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       event_id, value,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
ORDER BY user_id, event_type, valid_from_us, event_id
"""


@REGISTRY.register("scd2_user_event_history", _SCD2_ORACLE)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events changelog as a Type-2 dimension: every version kept,
    half-open [valid_from, valid_to) validity intervals attached via a
    lead(1) window — one shuffle on the key, O(1) window state
    (operators/scd2.py). Point-in-time lookups then need no window at
    read time."""
    hist = scd2_history(
        _t(spark, sf_dir, "events"),
        keys=["user_id", "event_type"],
        version_cols=["ts", "event_id"],
        payload_cols=["value"],
    )
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        "event_id",
        "value",
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    ).orderBy("user_id", "event_type", "valid_from_us", "event_id")


# --- last-touch attribution -------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH carried AS (
  SELECT event_type, value, ts,
         last_value(CASE WHEN event_type IN ('view', 'click')
                         THEN struct_pack(t_ts := ts, t_type := event_type)
                    END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
)
SELECT COALESCE(
         CASE WHEN touch IS NOT NULL
               AND epoch_us(ts) - epoch_us(touch.t_ts) <= 86400000000
              THEN touch.t_type END,
         'direct') AS touch_type,
       COUNT(*) AS conversions,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS attributed_revenue
FROM carried
WHERE event_type = 'purchase'
GROUP BY touch_type
ORDER BY touch_type
"""


@REGISTRY.register("attribution_last_touch", _ATTRIBUTION_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases credited to the user's most recent view/click within
    24 h, else 'direct'; revenue rolled up per touch type. Windowed
    carry-forward, no self-join (operators/attribution.py)."""
    return last_touch_attribution(
        _t(spark, sf_dir, "events"),
        touch_types=("view", "click"),
        conversion_type="purchase",
        lookback_hours=24,
    )


# --- z-order layout ---------------------------------------------------------

_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT {morton_sql(
      'o_custkey',
      "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))")} AS z,
         o_custkey AS a,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS b
  FROM orders
)
SELECT (z >> 16) AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(a) AS a_min, MAX(a) AS a_max,
       MIN(b) AS b_min, MAX(b) AS b_max
FROM keyed GROUP BY z_bucket ORDER BY z_bucket
"""


@REGISTRY.register("layout_zorder_orders", _ZORDER_ORACLE)
def layout_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code layout stats for orders clustered on
    (o_custkey, order epoch-day): per-z-bucket occupancy and min/max
    of BOTH dimensions — the stats a file-skipping reader sees after a
    z-order re-layout (operators/layout.py; write path covered by
    tests/test_layout.py). Pure bit-math projection + one partial
    aggregate; no UDF, no extra shuffle."""
    o = _t(spark, sf_dir, "orders")
    return zorder_bucket_stats(
        o,
        F.col("o_custkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long"),
        bucket_shift=16,
    )
