"""End-to-end: snapshot drops → streaming status log → as-of point-in-time
features (the M1.ipynb § 20 workflow on engine primitives), plus a
property-based check of the as-of join against a brute-force reference."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fantasy_premier_league_spark.etl.features import point_in_time_features
from fantasy_premier_league_spark.operators.asof import asof_join
from fantasy_premier_league_spark.streaming import snapshots as ST


class TestPointInTime:
    def test_stream_to_asof_features(self, spark, tmp_path):
        drops = tmp_path / "drops"
        drops.mkdir()

        def drop(ts, pid, form, news):
            doc = {"elements": [{"id": pid, "form": form, "news": news,
                                 "news_added": None, "status": "a",
                                 "chance_of_playing_next_round": None,
                                 "chance_of_playing_this_round": None,
                                 "transfers_in_event": 1, "transfers_out_event": 0}]}
            (drops / f"main_{ts}.json").write_text(json.dumps(doc))

        # two snapshots before the gw1 deadline (latest must win), one after
        drop("20200101-080000", 10, "2.0", "")
        drop("20200101-100000", 10, "2.5", "knock")
        drop("20200102-090000", 10, "3.0", "fit again")
        out, ck = str(tmp_path / "log"), str(tmp_path / "ck")
        ST.run_to_parquet(
            ST.players_status_stream(ST.stream_snapshots(spark, str(drops))),
            path=out, checkpoint=ck,
        )
        log = spark.read.parquet(out)
        gameweeks = spark.createDataFrame(
            [("1", "2020-01-01 11:00:00"), ("2", "2020-01-08 11:00:00"), ("0", "2019-12-01 11:00:00")],
            "gameweek_id string, d string",
        ).select("gameweek_id", F.to_timestamp("d").alias("gameweek_deadline_time"))
        players = spark.createDataFrame([("10",)], "player_id string")
        pit = {r["gameweek_id"]: r.asDict()
               for r in point_in_time_features(log, gameweeks, players).collect()}
        assert pit["1"]["deadline_form"] == 2.5       # latest before gw1 deadline
        assert pit["1"]["deadline_news"] == "knock"
        assert pit["2"]["deadline_form"] == 3.0       # post-gw1 snapshot applies to gw2
        assert pit["0"]["deadline_form"] is None      # nothing known pre-season


class TestAsofProperty:
    @settings(max_examples=20, deadline=None)
    @given(
        left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=12),
        right=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
            min_size=0, max_size=12,
        ),
    )
    def test_matches_bruteforce(self, spark, left, right):
        base = dt.datetime(2024, 1, 1)
        lrows = [(k, base + dt.timedelta(hours=t), i) for i, (k, t) in enumerate(left)]
        rrows = [(k, base + dt.timedelta(hours=t), v) for k, t, v in right]
        ldf = spark.createDataFrame(lrows, "key int, lts timestamp, row_id int")
        rdf = spark.createDataFrame(rrows or [(99, base, 0)], "key int, rts timestamp, val int")
        if not rrows:
            rdf = rdf.filter("key < 0")
        out = {r["row_id"]: r["asof_val"] for r in asof_join(
            ldf, rdf, left_on="key", right_on="key", left_ts="lts", right_ts="rts",
            right_value_cols=("val",),
        ).collect()}

        def brute(k, lt):
            cands = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= lt]
            # tie resolution: max (ts, then val) — the operator's documented order
            return max(cands)[1] if cands else None

        expected = {i: brute(k, base + dt.timedelta(hours=t)) for i, (k, t) in enumerate(left)}
        assert out == expected
