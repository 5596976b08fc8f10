"""transformWithStateInPandas — the Spark 4 arbitrary-state streaming
API (SURVEY.md §2i [EXT]; successor to applyInPandasWithState, which
streaming/events.py::user_lifetime_stats demonstrates).

What the new API adds over the old one, and what this operator
exercises:

* TYPED state handles instead of one opaque tuple — a ValueState for
  the scalar running aggregate and a MapState keyed by event_type for
  the distinct-type census (per-key lookup/update without
  deserializing the whole map — with the RocksDB provider each map
  entry is its own store key).
* a processor lifecycle (init/handleInputRows/close) — state handles
  are declared once in init, not re-packed per batch.

The operator: per-user lifetime stats (count, distinct event types,
first/last event time, exact micro-quantized value sum), emitted as
an UPDATE snapshot every micro-batch. All accumulators are integers
(count/min/max/Σfloor(value·10⁶)), so results are independent of row
order within and across micro-batches — which is what lets the final
snapshot (max n_events per user) equal a batch groupBy and carry a
full DuckDB oracle instead of a rows-only check.

State size: O(active users × (4 longs + |event types|)) — bounded by
key cardinality, not stream length; at 100 TB the RocksDB provider
spills it off-heap and the shuffle is one exchange on the grouping
key, exactly like any stateful aggregate.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

OUTPUT_SCHEMA = (
    "user_id long, n_events long, n_types long, first_us long, "
    "last_us long, sum_micro long"
)


class UserLifetimeProcessor(StatefulProcessor):
    """Running per-user stats; one snapshot row per batch the user
    appears in. n_events is strictly monotone, so 'row with max
    n_events' is the final state regardless of batch slicing."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n long, first_us long, last_us long, sum_micro long"
        )
        self._types = handle.getMapState("types", "t string", "one byte")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        n, first_us, last_us, sum_micro = 0, None, None, 0
        prev = self._agg.get() if self._agg.exists() else None
        if prev is not None:
            n, first_us, last_us, sum_micro = prev
        for pdf in rows:
            n += len(pdf)
            ts = pdf["ts_us"].to_numpy()
            first_us = (
                int(ts.min()) if first_us is None else min(first_us, int(ts.min()))
            )
            last_us = (
                int(ts.max()) if last_us is None else max(last_us, int(ts.max()))
            )
            sum_micro += int(
                np.floor(pdf["value"].to_numpy() * 1000000.0).astype(np.int64).sum()
            )
            for t in pdf["event_type"].unique():
                self._types.updateValue((str(t),), (1,))
        self._agg.update((n, first_us, last_us, sum_micro))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [n_types],
                "first_us": [first_us],
                "last_us": [last_us],
                "sum_micro": [sum_micro],
            }
        )

    def close(self) -> None:
        pass


def user_lifetime_tws(events: DataFrame) -> DataFrame:
    """events (streaming) -> per-user running snapshots via
    transformWithStateInPandas. Caller materializes with
    run_to_batch(output_mode='update') and keeps each user's max-
    n_events row. Requires the RocksDB state store provider (the
    transformWithState operator's native backend)."""
    from pyspark.sql import functions as F

    slim = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "value",
    )
    return slim.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserLifetimeProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


LASTK_SCHEMA = (
    "user_id long, n_seen long, ts1 long, id1 long, ts2 long, id2 long, "
    "ts3 long, id3 long"
)


class LastKEventsProcessor(StatefulProcessor):
    """Per-user top-3 most-recent events through a ListState — the
    typed-state feature UserLifetimeProcessor doesn't exercise: a
    BOUNDED per-key list maintained across micro-batches (the
    "recent activity" panel / feature-store shape), where only the
    k survivors are ever stored, not the event history.

    Determinism: the kept set is the global top-3 by (ts_us DESC,
    event_id DESC) — a total order, so the final state is independent
    of how micro-batches slice the input; n_seen is strictly
    monotone, so 'row with max n_seen' is the final snapshot. State
    size: O(active users × k) regardless of stream length.
    """

    K = 3

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._top = handle.getListState("topk", "ts_us long, event_id long")
        self._n = handle.getValueState("n_seen", "n long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        entries = [(int(t), int(e)) for t, e in self._top.get()]
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
            entries.extend(
                zip(
                    pdf["ts_us"].to_numpy(dtype=np.int64).tolist(),
                    pdf["event_id"].to_numpy(dtype=np.int64).tolist(),
                )
            )
            entries = sorted(entries, key=lambda p: (-p[0], -p[1]))[: self.K]
        self._top.put([(int(t), int(e)) for t, e in entries])
        self._n.update((n,))
        padded = entries + [(None, None)] * (self.K - len(entries))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "ts1": [padded[0][0]],
                "id1": [padded[0][1]],
                "ts2": [padded[1][0]],
                "id2": [padded[1][1]],
                "ts3": [padded[2][0]],
                "id3": [padded[2][1]],
            }
        )

    def close(self) -> None:
        pass


def user_lastk_tws(events: DataFrame) -> DataFrame:
    """events (streaming) -> per-user top-3-recent snapshots via
    transformWithStateInPandas with a ListState. Caller materializes
    with run_to_batch(output_mode='update') and keeps each user's
    max-n_seen row. RocksDB provider, like user_lifetime_tws."""
    from pyspark.sql import functions as F

    slim = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    return slim.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=LastKEventsProcessor(),
        outputStructType=LASTK_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
