"""SCD2 history, last-touch attribution, z-order layout (round 3).

Fixture-level semantics checks (the sf0.01 oracle equivalence is
covered by tools/check_oracle.py / the driver): hand-computed
intervals and attributions on small changelogs, including the
tie/boundary cases the oracle data may never hit, plus the write-path
clustering claim for the z-order layout.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from movie_rankings_spark.operators.attribution import last_touch_attribution
from movie_rankings_spark.operators.layout import (
    morton_interleave,
    write_zordered,
)
from movie_rankings_spark.operators.scd2 import scd2_history

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, TS0 + dt.timedelta(minutes=m), uid, etype, float(v))
            for eid, m, uid, etype, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


class TestScd2:
    def test_intervals_chain_and_current(self, spark):
        ev = _ev(
            spark,
            [
                (1, 0, 7, "click", 1.0),
                (2, 10, 7, "click", 2.0),
                (3, 25, 7, "click", 3.0),
                (4, 5, 8, "view", 9.0),
            ],
        )
        hist = scd2_history(
            ev,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            payload_cols=["value"],
        )
        rows = {
            (r["user_id"], r["event_id"]): r
            for r in hist.collect()
        }
        # chain: each version's valid_to is the next version's valid_from
        assert rows[(7, 1)]["valid_to"] == rows[(7, 2)]["valid_from"]
        assert rows[(7, 2)]["valid_to"] == rows[(7, 3)]["valid_from"]
        # exactly one current row per key, with open interval
        assert rows[(7, 3)]["valid_to"] is None and rows[(7, 3)]["is_current"]
        assert not rows[(7, 1)]["is_current"]
        assert rows[(8, 4)]["is_current"]

    def test_same_ts_breaks_ties_on_event_id(self, spark):
        ev = _ev(spark, [(2, 0, 1, "click", 2.0), (1, 0, 1, "click", 1.0)])
        hist = scd2_history(
            ev,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            payload_cols=["value"],
        ).collect()
        by_id = {r["event_id"]: r for r in hist}
        assert not by_id[1]["is_current"]
        assert by_id[2]["is_current"]


class TestAttribution:
    def test_last_touch_within_window(self, spark):
        ev = _ev(
            spark,
            [
                (1, 0, 1, "view", 0.0),
                (2, 30, 1, "click", 0.0),
                (3, 60, 1, "purchase", 10.0),  # -> click (latest touch)
                (4, 0, 2, "purchase", 5.0),  # no touch -> direct
                (5, 0, 3, "view", 0.0),
                # 25h later: outside the 24h lookback -> direct
                (6, 25 * 60, 3, "purchase", 7.0),
            ],
        )
        out = {
            r["touch_type"]: r
            for r in last_touch_attribution(ev, lookback_hours=24).collect()
        }
        assert out["click"]["conversions"] == 1
        assert out["click"]["attributed_revenue"] == 10.0
        assert out["direct"]["conversions"] == 2
        assert out["direct"]["attributed_revenue"] == 12.0
        assert "view" not in out  # click superseded the view

    def test_touch_at_same_ts_needs_smaller_event_id(self, spark):
        # touch sorts before the purchase only via event_id tie-break
        ev = _ev(spark, [(1, 0, 1, "click", 0.0), (2, 0, 1, "purchase", 3.0)])
        out = {r["touch_type"]: r for r in last_touch_attribution(ev).collect()}
        assert out == {} or "click" in out  # deterministic: click wins
        assert out["click"]["conversions"] == 1
        # reversed ids: purchase sorts first, no preceding touch
        ev2 = _ev(spark, [(2, 0, 1, "click", 0.0), (1, 0, 1, "purchase", 3.0)])
        out2 = {r["touch_type"]: r for r in last_touch_attribution(ev2).collect()}
        assert out2["direct"]["conversions"] == 1


class TestZorderLayout:
    def test_morton_interleave_known_values(self, spark):
        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long"
        )
        got = {
            (r["a"], r["b"]): r["z"]
            for r in df.select(
                "a", "b", morton_interleave(F.col("a"), F.col("b")).alias("z")
            ).collect()
        }
        # a bits at odd positions, b bits at even: (3,5) =
        # a=0b11 -> bits 1,3 ; b=0b101 -> bits 0,4 -> 0b11011 = 27
        assert got[(0, 0)] == 0
        assert got[(1, 0)] == 2
        assert got[(0, 1)] == 1
        assert got[(3, 5)] == 27

    def test_write_clusters_both_dimensions(self, spark, tmp_path):
        # 64x64 grid, shuffled input: after z-order re-layout each of
        # the 8 files must cover a small sub-rectangle of BOTH dims,
        # not a full-range slice.
        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
        )
        path = str(tmp_path / "zordered")
        write_zordered(
            grid.repartition(13), F.col("a"), F.col("b"), path, files=8
        )
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("a").alias("a_min"),
                F.max("a").alias("a_max"),
                F.min("b").alias("b_min"),
                F.max("b").alias("b_max"),
            )
            .collect()
        )
        assert len(per_file) == 8
        # prunability, the property the layout exists for: a reader
        # filtering on EITHER dimension's half-range must be able to
        # skip files outside it. Most files sit fully inside one half
        # of each dimension (files straddling a z-block boundary may
        # span both halves of one dim — that's inherent, and bounded).
        # A single-column sort scores 0 for the unsorted dimension.
        a_clean = sum(1 for r in per_file if r["a_max"] < 32 or r["a_min"] >= 32)
        b_clean = sum(1 for r in per_file if r["b_max"] < 32 or r["b_min"] >= 32)
        assert a_clean >= 5, [tuple(r) for r in per_file]
        assert b_clean >= 5, [tuple(r) for r in per_file]


class TestTokenizerAndJl:
    def test_bpe_pair_counts_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [(1, "ab ab cd"), (2, "ab x")], "doc_id long, text string"
        )
        from movie_rankings_spark.operators.tokenizer import bpe_pair_counts

        got = {r["pair"]: r["n"] for r in bpe_pair_counts(docs, k=10).collect()}
        # "ab" occurs 3 times (weight 3), "cd" once, "x" has no pair
        assert got == {"ab": 3, "cd": 1}

    def test_jl_projection_preserves_geometry(self, spark, sf_dir):
        from movie_rankings_spark.catalog import load_table
        from movie_rankings_spark.operators.embeddings import jl_project

        out = jl_project(
            load_table(spark, sf_dir, "embeddings"), out_dim=16
        ).collect()
        assert all(len(r["proj"]) == 16 for r in out)
        # norm distortion: E[proj_norm²] = orig_norm² per vector; at
        # out_dim 16 individual ratios concentrate within ~3σ ≈ ±1.1
        # and the corpus MEAN ratio within a few percent
        ratios = [
            r["proj_norm_sq"] / r["orig_norm_sq"]
            for r in out
            if r["orig_norm_sq"] > 0
        ]
        mean = sum(ratios) / len(ratios)
        assert 0.9 < mean < 1.1, mean
        assert all(0.05 < x < 4.0 for x in ratios)
        # deterministic across runs (seeded matrix)
        again = jl_project(
            load_table(spark, sf_dir, "embeddings"), out_dim=16
        ).collect()
        assert [r["proj"] for r in out] == [r["proj"] for r in again]


class TestSplitAndCollocations:
    def test_split_ratios_and_stability(self, spark, sf_dir):
        from movie_rankings_spark.catalog import load_table
        from movie_rankings_spark.operators.textops import hash_split_summary

        docs = load_table(spark, sf_dir, "documents")
        total = docs.count()
        out = hash_split_summary(docs).collect()
        by_split = {}
        for r in out:
            by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
        assert sum(by_split.values()) == total
        # 13/256 ≈ 5.1% each for test/val; generous bounds at 500 docs
        assert 0.01 * total < by_split.get("test", 0) < 0.12 * total
        assert 0.01 * total < by_split.get("val", 0) < 0.12 * total
        assert by_split["train"] > 0.8 * total
        # deterministic
        assert out == hash_split_summary(docs).collect()

    def test_collocation_lift_hand_computed(self, spark):
        from movie_rankings_spark.operators.textops import collocation_lift

        # "a b" always together (lift high); "c d" independent-ish
        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(5)] + [(9, "c d"), (10, "d c")],
            "doc_id long, text string",
        )
        got = {r["bigram"]: r for r in collocation_lift(docs, k=10, min_count=5).collect()}
        # tokens: a×5, b×5, c×7, d×2, N=19; c_ab("a b")=5
        assert got["a b"]["c_ab"] == 5
        assert got["a b"]["lift"] == (5 * 19) / (5 * 5)
        assert "c d" not in got  # c_ab = 1 < min_count


class TestMortonProperties:
    def test_interleave_roundtrip_property(self, spark):
        """Deinterleaving recovers both inputs for arbitrary 16-bit
        values — the interleave is a bijection on (a, b) pairs."""
        import random

        rng = random.Random(3)
        rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
        df = spark.createDataFrame(rows, "a long, b long")
        z = morton_interleave(F.col("a"), F.col("b"))
        # reconstruct a from odd bits, b from even bits
        a_back = None
        b_back = None
        for i in range(16):
            a_bit = F.shiftleft(
                F.shiftright(z, 2 * i + 1).bitwiseAND(F.lit(1)), i
            )
            b_bit = F.shiftleft(F.shiftright(z, 2 * i).bitwiseAND(F.lit(1)), i)
            a_back = a_bit if a_back is None else a_back.bitwiseOR(a_bit)
            b_back = b_bit if b_back is None else b_back.bitwiseOR(b_bit)
        got = df.select("a", "b", a_back.alias("a2"), b_back.alias("b2")).collect()
        for r in got:
            assert r["a"] == r["a2"] and r["b"] == r["b2"], tuple(r)

    def test_z_adjacency_locality(self, spark):
        """Consecutive z-values differ in (a, b) by at most 1 in each
        coordinate within an aligned 4-block — the locality the layout
        relies on (weak but cheap canary; the real guarantee is the
        prunability test above)."""
        df = spark.createDataFrame(
            [(a, b) for a in range(8) for b in range(8)], "a long, b long"
        )
        rows = sorted(
            df.select(
                "a", "b", morton_interleave(F.col("a"), F.col("b")).alias("z")
            ).collect(),
            key=lambda r: r["z"],
        )
        # within each aligned pair (z even, z+1): only b's low bit flips
        for i in range(0, len(rows), 2):
            r0, r1 = rows[i], rows[i + 1]
            assert r1["z"] == r0["z"] + 1
            assert r0["a"] == r1["a"] and abs(r0["b"] - r1["b"]) == 1


class TestScd2Properties:
    def test_intervals_tile_without_overlap(self, spark):
        """Per key, sorted intervals chain exactly: valid_from[i+1] ==
        valid_to[i], one open interval per key, no gaps or overlaps —
        for a randomized changelog."""
        import random

        rng = random.Random(7)
        rows = []
        eid = 0
        for uid in range(20):
            for _ in range(rng.randrange(1, 8)):
                eid += 1
                rows.append((eid, rng.randrange(0, 10_000), uid, "set", 1.0))
        ev = _ev(spark, rows)
        hist = scd2_history(
            ev,
            keys=["user_id", "event_type"],
            version_cols=["ts", "event_id"],
            payload_cols=["value"],
        ).collect()
        by_key: dict = {}
        for r in hist:
            by_key.setdefault((r["user_id"], r["event_type"]), []).append(r)
        for key, ivs in by_key.items():
            ivs.sort(key=lambda r: (r["valid_from"], r["event_id"]))
            opens = [r for r in ivs if r["valid_to"] is None]
            assert len(opens) == 1 and ivs[-1]["valid_to"] is None, key
            for prev, nxt in zip(ivs, ivs[1:]):
                assert prev["valid_to"] == nxt["valid_from"], key
