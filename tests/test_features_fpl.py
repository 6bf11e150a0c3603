"""FPL model-matrix build tests over the synthetic season fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fantasy_premier_league_spark.etl import features as FF
from fantasy_premier_league_spark.etl import ingest, transform
from tests import fpl_fixtures


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    outdir = tmp_path_factory.mktemp("fpl_feat")
    paths = fpl_fixtures.write_fixture_files(str(outdir))
    return transform.build_all(
        ingest.read_fixtures_json(spark, paths["fixtures"]),
        ingest.read_main_json(spark, paths["main"]),
        ingest.read_players_json(spark, paths["players"]),
    )


def test_last_complete_gameweek(catalog):
    assert FF.last_complete_gameweek(catalog["gameweeks"]) == 3


def test_model_matrix_shape_and_lags(catalog):
    mm = FF.build_model_matrix(catalog)
    rows = {(r["player_id"], r["fixture_id"]): r.asDict() for r in mm.collect()}
    # scope: gameweeks <= 3 → p10 fixtures 1,4,5 and p11 fixtures 2,3,5
    assert set(rows) == {("10", "1"), ("10", "4"), ("10", "5"),
                         ("11", "2"), ("11", "3"), ("11", "5")}
    # lag: p10's second fixture (f4, gw2) sees f1's stats
    assert rows[("10", "4")]["previous_total_points"] == 8
    assert rows[("10", "1")]["previous_total_points"] is None
    # days_since_last from kickoff datetimes
    assert rows[("10", "4")]["days_since_last"] is not None
    # targets (M16)
    assert rows[("10", "5")]["target_played"] == 1
    assert rows[("10", "5")]["target_points"] == 0  # 2 points < 4
    assert rows[("10", "1")]["target_points"] == 1  # 8 points


def test_team_and_opponent_enrichment(catalog):
    mm = FF.build_model_matrix(catalog)
    rows = {(x["player_id"], x["fixture_id"]): x.asDict() for x in mm.collect()}
    r = rows[("10", "1")]
    # p10 plays for team 1 (home, won 2-0 in f1)
    assert r["opponent_team_id"] == "2"
    assert r["team_win"] == 1 and r["team_points"] == 3
    assert r["own_team_strength"] == 3 and r["diff_strength"] == 0
    assert r["kickoff_datetime_hour"] is not None
    assert r["days_into_gameweek"] == 0  # f1 is gw1's first kickoff
    # perspective difficulty: home rows see home difficulty (2), away see 3
    assert r["fixture_difficulty"] == 2  # p10 home in f1
    assert rows[("10", "4")]["fixture_difficulty"] == 3  # p10 away in f4


def test_matrix_feeds_ml_pipeline(catalog, spark):
    from fantasy_premier_league_spark.ml import pipeline as P

    mm = FF.build_model_matrix(catalog).fillna(0, subset=["previous_total_points", "previous_minutes"])
    m = P.baseline_prediction(mm, predictor="previous_minutes", threshold=1.0, label="target_played")
    assert 0.0 <= m["accuracy"] <= 1.0 and m["target_rate"] > 0
