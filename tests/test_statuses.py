"""players_statuses batch append log (run_load.py:205-223 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fantasy_premier_league_spark.etl import ingest, statuses, transform
from fantasy_premier_league_spark.etl.quality import check_unique_pk
from tests import fpl_fixtures


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    outdir = tmp_path_factory.mktemp("statuses")
    paths = fpl_fixtures.write_fixture_files(str(outdir))
    return transform.build_all(
        ingest.read_fixtures_json(spark, paths["fixtures"]),
        ingest.read_main_json(spark, paths["main"]),
        ingest.read_players_json(spark, paths["players"]),
    )


def test_current_gameweek_is_first_unfinished(catalog):
    assert statuses.current_gameweek(catalog["gameweeks"]) == 4  # 3 finished


def test_append_log_accumulates(spark, catalog, tmp_path):
    log_path = str(tmp_path / "statuses_log")
    for i, ts in enumerate(["2020-03-01 10:00:00", "2020-03-08 10:00:00"]):
        snap = statuses.players_statuses_snapshot(
            catalog["players_summary"],
            gameweek_now=statuses.current_gameweek(catalog["gameweeks"]) + i,
            load_datetime=ts,
        )
        statuses.append_statuses(snap, log_path)
    log = spark.read.parquet(log_path)
    assert log.count() == 6  # 3 players x 2 loads
    # PK of the log holds (load.py:404-460 triple)
    res = check_unique_pk(log, ["load_datetime", "gameweek_now", "player_id"], "players_statuses")
    assert res.ok
    gws = {r["gameweek_now"] for r in log.select("gameweek_now").distinct().collect()}
    assert gws == {"4", "5"}
    # the log feeds the as-of reconstruction directly
    assert "form" in log.columns and "news" in log.columns
