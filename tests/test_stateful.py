"""transformWithStateInPandas processor (streaming/stateful.py).

Two tiers (r6: the engine path runs for real — the vendored
pure-Python protobuf runtime in vendor/ satisfies the state-server
wire protocol, so the end-to-end test is no longer skip-gated and the
old fake-handle tier is reduced to fast pure-logic unit tests of the
accumulator arithmetic):

* pure-logic: handleInputRows against an in-memory fake handle —
  millisecond-fast checks of carry-across-batches and batch-slicing
  invariance of the integer accumulators.
* engine: the registered stream_transform_with_state query end to
  end through the real transformWithStateInPandas operator (RocksDB
  state store, 4 micro-batches), value-compared against the batch
  groupBy aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from movie_rankings_spark.streaming.stateful import UserLifetimeProcessor


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeMapState:
    def __init__(self):
        self._m = {}

    def updateValue(self, k, v):
        self._m[tuple(k)] = tuple(v)

    def keys(self):
        return iter(self._m.keys())

    def containsKey(self, k):
        return tuple(k) in self._m

    def clear(self):
        self._m.clear()


class FakeListState:
    def __init__(self):
        self._l = []

    def get(self):
        return iter(self._l)

    def put(self, newState):
        self._l = [tuple(t) for t in newState]

    def appendValue(self, v):
        self._l.append(tuple(v))

    def appendList(self, vs):
        self._l.extend(tuple(t) for t in vs)

    def clear(self):
        self._l.clear()


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeMapState())

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeListState())


def _batch(ts_us, types, values):
    return pd.DataFrame({"ts_us": ts_us, "event_type": types, "value": values})


def test_processor_accumulates_across_batches():
    p = UserLifetimeProcessor()
    p.init(FakeHandle())
    out1 = list(
        p.handleInputRows(
            (7,), iter([_batch([100, 50], ["view", "click"], [1.5, 2.25])]), None
        )
    )[0]
    assert out1.iloc[0]["n_events"] == 2
    assert out1.iloc[0]["n_types"] == 2
    assert out1.iloc[0]["first_us"] == 50
    assert out1.iloc[0]["last_us"] == 100
    assert out1.iloc[0]["sum_micro"] == 1_500_000 + 2_250_000
    # second micro-batch: state carries, type census dedups
    out2 = list(
        p.handleInputRows((7,), iter([_batch([200], ["view"], [0.5])]), None)
    )[0]
    assert out2.iloc[0]["n_events"] == 3
    assert out2.iloc[0]["n_types"] == 2  # 'view' already known
    assert out2.iloc[0]["first_us"] == 50
    assert out2.iloc[0]["last_us"] == 200
    assert out2.iloc[0]["sum_micro"] == 3_750_000 + 500_000


def test_processor_matches_batch_aggregate_on_random_slicing():
    rng = np.random.RandomState(3)
    n = 200
    ts = rng.randint(0, 10**9, n)
    types = rng.choice(["a", "b", "c", "d"], n)
    vals = np.round(rng.uniform(-5, 5, n), 6)
    p = UserLifetimeProcessor()
    p.init(FakeHandle())
    cuts = sorted(rng.choice(range(1, n), 5, replace=False))
    last = None
    for lo, hi in zip([0] + cuts, cuts + [n]):
        last = list(
            p.handleInputRows(
                (1,),
                iter([_batch(ts[lo:hi], types[lo:hi], vals[lo:hi])]),
                None,
            )
        )[0]
    assert last.iloc[0]["n_events"] == n
    assert last.iloc[0]["n_types"] == len(set(types))
    assert last.iloc[0]["first_us"] == int(ts.min())
    assert last.iloc[0]["last_us"] == int(ts.max())
    assert last.iloc[0]["sum_micro"] == int(
        np.floor(vals * 1_000_000.0).astype(np.int64).sum()
    )


def test_engine_end_to_end_matches_batch_aggregate(spark, sf_dir):
    """The real operator (RocksDB state store, 4 micro-batches) must
    equal the batch groupBy on every column — the same equivalence
    the registered oracle checks, asserted value-exactly here."""
    from pyspark.sql import functions as F

    from movie_rankings_spark.plans.streaming_queries import (
        stream_transform_with_state,
    )

    out = {
        r["user_id"]: (
            r["n_events"], r["n_types"], r["first_us"], r["last_us"],
            r["sum_micro"],
        )
        for r in stream_transform_with_state(spark, sf_dir).collect()
    }
    batch = {
        r["user_id"]: (
            r["n_events"], r["n_types"], r["first_us"], r["last_us"],
            r["sum_micro"],
        )
        for r in (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("event_type").alias("n_types"),
                F.min(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                ).alias("first_us"),
                F.max(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                ).alias("last_us"),
                F.sum(
                    F.floor(F.col("value") * 1000000.0).cast("long")
                ).alias("sum_micro"),
            )
            .collect()
        )
    }
    assert out == batch


def test_lastk_processor_slicing_invariance():
    """LastKEventsProcessor: final top-3 equals the global top-3 by
    (ts DESC, event_id DESC) regardless of micro-batch slicing."""
    import numpy as np

    from movie_rankings_spark.streaming.stateful import LastKEventsProcessor

    rng = np.random.RandomState(6)
    n = 120
    ts = rng.randint(0, 50, n)  # heavy ties -> event_id tie-break matters
    ids = rng.permutation(n)
    p = LastKEventsProcessor()
    p.init(FakeHandle())
    cuts = sorted(rng.choice(range(1, n), 4, replace=False))
    last = None
    for lo, hi in zip([0] + cuts, cuts + [n]):
        last = list(
            p.handleInputRows(
                (9,),
                iter([pd.DataFrame({"ts_us": ts[lo:hi], "event_id": ids[lo:hi]})]),
                None,
            )
        )[0]
    want = sorted(zip(ts.tolist(), ids.tolist()), key=lambda x: (-x[0], -x[1]))[:3]
    got = [
        (last.iloc[0]["ts1"], last.iloc[0]["id1"]),
        (last.iloc[0]["ts2"], last.iloc[0]["id2"]),
        (last.iloc[0]["ts3"], last.iloc[0]["id3"]),
    ]
    assert last.iloc[0]["n_seen"] == n
    assert [(int(a), int(b)) for a, b in got] == want
