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


SESSION_SCHEMA = (
    "user_id long, session_seq int, n_events long, start_us long, "
    "last_us long"
)

#: 6 h gap, matching the batch sessionize_events convention
SESSION_GAP_US = 21_600_000_000
SESSION_GAP_MS = SESSION_GAP_US // 1000
#: emission threshold slack past the raw gap (ms). Both the processor
#: and the DuckDB oracle apply the SAME threshold, so its exact value
#: only shifts which trailing sessions count as closed — the slack
#: exists to keep the decision away from the watermark's ms-floor
#: boundary of the gap itself.
SESSION_CLOSE_SLACK_MS = 1000


class SessionTimeoutProcessor(StatefulProcessor):
    """Gap-based sessionization with EVENT-TIME TIMERS — the
    typed-state features the other two processors don't touch:
    ``registerTimer``/``handleExpiredTimer`` (a session with no
    successor event is closed by a timer when the watermark passes
    last_event + gap + slack, the classic session-timeout emission).
    State TTL is the OTHER remaining typed-state feature, but Spark
    rejects ttlDurationMs outside timeMode=ProcessingTime
    (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL), so it
    lives in TtlCountProcessor + its eviction unit test instead.

    Emission contract (what makes the batch oracle exact): every
    session is emitted EXACTLY once — by the input path when a later
    event opens the next session (works regardless of how many
    micro-batches separate them: the state carries the open session),
    or by the timer path when the event-time watermark passes
    last_ms + gap + slack first. Double emission is impossible: the
    input path deletes the pending timer before emitting, and the
    timer path clears the session state (the persistent seq counter
    survives in its own non-TTL ValueState, so numbering continues).
    A user's trailing session below the threshold at stream end is
    never emitted — the oracle applies the same cut.

    REQUIRES event-time-ordered micro-batches (stage with
    _stage_time_split_events, not the hash split): with time-ordered
    arrival, a timer that fires cannot be contradicted by a
    later-batch event (later events' timestamps are >= the watermark
    that fired the timer, which is past the session's extension
    horizon), so the stream's sessions equal the batch window
    regardless of where batch boundaries fall. State size: O(active
    users × 1 open session); timers: one per active user.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "sess", "start_us long, last_us long, n long, seq int"
        )
        self._nextseq = handle.getValueState("nextseq", "s int")

    def _emit(self, key, start_us, last_us, n, seq) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_seq": [int(seq)],
                "n_events": [int(n)],
                "start_us": [int(start_us)],
                "last_us": [int(last_us)],
            }
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        evs: list[tuple[int, int]] = []
        for pdf in rows:
            evs.extend(
                zip(
                    pdf["ts_us"].to_numpy(dtype=np.int64).tolist(),
                    pdf["event_id"].to_numpy(dtype=np.int64).tolist(),
                )
            )
        evs.sort()
        if not evs:
            return
        cur = self._sess.get() if self._sess.exists() else None
        next_seq = self._nextseq.get()[0] if self._nextseq.exists() else 1
        for expiry in list(self._handle.listTimers()):
            self._handle.deleteTimer(expiry)
        for ts_us, _eid in evs:
            if cur is not None and ts_us - cur[1] <= SESSION_GAP_US:
                cur = (cur[0], max(cur[1], ts_us), cur[2] + 1, cur[3])
            else:
                if cur is not None:
                    yield self._emit(key, *cur)
                cur = (ts_us, ts_us, 1, next_seq)
                next_seq += 1
        self._sess.update(cur)
        self._nextseq.update((next_seq,))
        self._handle.registerTimer(
            cur[1] // 1000 + SESSION_GAP_MS + SESSION_CLOSE_SLACK_MS
        )

    def handleExpiredTimer(
        self, key: Any, timerValues: "TimerValues", expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._sess.exists():
            return
        start_us, last_us, n, seq = self._sess.get()
        threshold = last_us // 1000 + SESSION_GAP_MS + SESSION_CLOSE_SLACK_MS
        if timerValues.getCurrentWatermarkInMs() >= threshold:
            yield self._emit(key, start_us, last_us, n, seq)
            self._sess.clear()
        else:
            # stale/early firing (session was extended since): re-arm
            self._handle.registerTimer(threshold)

    def close(self) -> None:
        pass


def sessionize_tws(events: DataFrame) -> DataFrame:
    """events (streaming) -> closed 6 h-gap sessions, emitted once
    each via event-time timers. Caller materializes with
    run_to_batch(output_mode='append'); input MUST be staged in
    event-time order (see SessionTimeoutProcessor). RocksDB
    provider, like the other TWS operators."""
    from pyspark.sql import functions as F

    slim = events.withWatermark("ts", "0 seconds").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "ts",
    )
    return slim.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionTimeoutProcessor(),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


TTL_COUNT_SCHEMA = "user_id long, batch_count long"


class TtlCountProcessor(StatefulProcessor):
    """Minimal TTL demonstrator — the typed-state feature the session
    processor cannot carry (Spark only allows ``ttlDurationMs`` in
    timeMode=ProcessingTime): a per-key event counter whose ValueState
    expires after ``ttl_ms`` of wall time. With a tiny TTL every
    micro-batch sees no surviving state (micro-batches are spaced far
    beyond 1 ms), so the emitted count per batch is that batch's OWN
    size; with no TTL it's the running total — the difference is what
    the eviction unit test asserts."""

    def __init__(self, ttl_ms: int | None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState(
            "cnt", "n long", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "batch_count": [n]})

    def close(self) -> None:
        pass


def ttl_count_tws(events: DataFrame, ttl_ms: int | None) -> DataFrame:
    """events (streaming) -> per-user counts through a TTL'd
    ValueState (ProcessingTime mode — the only timeMode Spark permits
    state TTL in). RocksDB provider, like the other TWS operators.

    CAUTION: ProcessingTime-mode TWS keeps scheduling no-data
    micro-batches even under trigger(availableNow) — the query never
    self-terminates, so callers must bound the run (poll the sink,
    then q.stop()) rather than awaitTermination()."""
    slim = events.select("user_id", "event_id")
    return slim.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TtlCountProcessor(ttl_ms),
        outputStructType=TTL_COUNT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
