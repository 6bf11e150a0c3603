"""Partition-layout invariance pins for rounded-float aggregates.

Round 13's driver run flipped q16_rolling_outliers' oracle value hash:
the corpus contains z values within 1e-10 of a 4-dp rounding boundary,
and float avg/stddev accumulate in partition-layout-dependent order over
same-day tie rows.  The fix (round 14) computes the moments from exact
integer sums, so the rounded output must be BIT-IDENTICAL under any
partitioning.  These tests permute the physical layout aggressively
(single partition, many partitions, reversed/sorted input order) over
synthetic knife-edge data and assert exact equality — they would fail on
the old float-accumulation implementation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _collect_map(df, key_cols):
    rows = df.collect()
    return {tuple(r[k] for k in key_cols): tuple(r) for r in rows}


class TestRollingZscoreLayoutInvariance:
    def _knife_events(self, spark):
        # Many same-day ties per user with 2-dp values: tie rows are
        # window peers whose float accumulation order used to depend on
        # the layout.  251 pseudo-random cents values per user make the
        # windows large enough that naive double sums differ across
        # orderings in the last ulps.
        epoch = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(7):
            for i in range(251):
                d = (i * 17) % 35  # many collisions per (user, day)
                cents = ((i * 7919 + u * 104729) % 56021) + 1
                rows.append((u, epoch + dt.timedelta(days=d), cents / 100.0))
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )

    def test_bit_identical_across_layouts(self, spark):
        from fantasy_premier_league_spark.operators.sessionize import (
            rolling_zscore_outliers,
        )

        ev = self._knife_events(spark)
        layouts = [
            ev.repartition(1),
            ev.repartition(16),
            ev.repartition(5, "user_id"),
            ev.sortWithinPartitions(F.col("value").desc()),
            ev.repartition(16).sortWithinPartitions(F.col("value")),
        ]
        keys = ("user_id", "day", "value")
        ref = _collect_map(rolling_zscore_outliers(layouts[0]), keys)
        assert len(ref) == 7 * 251  # (user, day, value) is unique here
        for lay in layouts[1:]:
            got = _collect_map(rolling_zscore_outliers(lay), keys)
            # exact float equality, not approx: the round-14 contract
            assert got == ref

    def test_dsir_weighted_mean_layout_invariant(self, spark):
        # q05's dsir_score is a cnt-weighted mean of per-bucket log
        # ratios; round 14 accumulates it over DECIMAL(20,14)-cast
        # addends so the 6-dp rounded score cannot move with the
        # partition layout (the corpus holds scores 1.3e-11 from a
        # boundary; float regrouping error can exceed that).
        from fantasy_premier_league_spark.operators.selection import dsir_weights

        rows = []
        for i in range(400):
            words = " ".join(
                f"w{(i * 31 + j * 7) % 211}" for j in range((i % 37) + 3)
            )
            rows.append((i, i % 3 == 0, words))
        docs = spark.createDataFrame(
            rows, "doc_id long, is_t boolean, text string"
        )
        layouts = [
            docs.repartition(1),
            docs.repartition(16),
            docs.repartition(3, "doc_id"),
            docs.sortWithinPartitions(F.col("doc_id").desc()),
        ]
        ref = _collect_map(
            dsir_weights(layouts[0], "doc_id", "text", "is_t", n_buckets=64),
            ("doc_id",),
        )
        assert len(ref) == 400
        for lay in layouts[1:]:
            got = _collect_map(
                dsir_weights(lay, "doc_id", "text", "is_t", n_buckets=64),
                ("doc_id",),
            )
            assert got == ref  # exact float equality across layouts

    def test_exact_moments_match_hand_computation(self, spark):
        # Cross-check the decimal-sum z against a from-scratch exact
        # computation (python ints -> one final float expression).
        import math

        from fantasy_premier_league_spark.operators.sessionize import (
            rolling_zscore_outliers,
        )

        epoch = dt.datetime(2024, 1, 1)
        vals = [(0, 19.94), (0, 12.38), (0, 33.07), (1, 5.55), (2, 12.38),
                (3, 0.01), (5, 560.21), (9, 29.27), (29, 100.00), (30, 2.11)]
        ev = spark.createDataFrame(
            [(1, epoch + dt.timedelta(days=d), v) for d, v in vals],
            "user_id long, ts timestamp, value double",
        )
        got = {
            (r["day"], round(r["value"] * 100)): r["zscore"]
            for r in rolling_zscore_outliers(ev).collect()
        }
        cents = [(d, round(v * 100)) for d, v in vals]
        for d, c in cents:
            w = [cc for dd, cc in cents if d - 28 <= dd <= d]
            n = len(w)
            s = sum(w)
            ss = sum(x * x for x in w)
            e = n * ss - s * s
            if n < 2 or e == 0:
                assert got[(d, c)] is None
                continue
            z = float(c * n - s) / math.sqrt(float(e) * float(n) / (float(n) - 1.0))
            assert got[(d, c)] == round(z, 4), (d, c, got[(d, c)], z)
