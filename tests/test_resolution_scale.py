"""Entity resolution at reference scale (SURVEY M3: 'the scale-critical
operator — benchmark it'): ~600 FPL players vs ~2000 FIFA rows, and the
will-a-player-play model trained on the full-season matrix."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from fantasy_premier_league_spark.operators import fuzzy

POSITIONS = ["GKP", "DEF", "MID", "FWD"]
FIFA_POS = {"GKP": "GK", "DEF": "CB, RB", "MID": "CM, CAM", "FWD": "ST"}

FIRST = ["mohamed", "harry", "kevin", "raheem", "sadio", "jordan", "marcus",
         "mason", "declan", "bukayo", "phil", "jack", "james", "trent", "virgil"]
LAST = ["salah", "kane", "bruyne", "sterling", "mane", "henderson", "rashford",
        "mount", "rice", "saka", "foden", "grealish", "maddison", "alexander", "dijk"]


def _name(i: int) -> str:
    return f"{FIRST[i % len(FIRST)]} {LAST[(i * 7) % len(LAST)]} {i}"


@pytest.fixture(scope="module")
def resolution_frames(spark):
    fpl = spark.createDataFrame(
        [(str(i), _name(i), POSITIONS[i % 4]) for i in range(600)],
        "player_id string, fpl_player_name string, position_name string",
    )
    # 600 exact-matchable + 600 fuzzy-near (reordered tokens) + 800 noise
    fifa_rows = []
    for i in range(600):
        fifa_rows.append((10_000 + i, _name(i).title(), _name(i).title(), FIFA_POS[POSITIONS[i % 4]]))
    for i in range(600):
        toks = _name(i).split()
        near = " ".join([toks[1], toks[0], toks[2]])
        fifa_rows.append((20_000 + i, near.title(), (near + " junior").title(), FIFA_POS[POSITIONS[i % 4]]))
    for i in range(800):
        fifa_rows.append((30_000 + i, f"Zz{i} Qq{i}", f"Zz{i} Qq{i} Xx{i}", FIFA_POS[POSITIONS[i % 4]]))
    fifa = spark.createDataFrame(
        fifa_rows, "sofifa_id long, fifa_name_short string, fifa_name_long string, player_positions string"
    )
    return fpl, fifa


class TestResolutionAtScale:
    def test_reference_scale_resolution(self, resolution_frames):
        fpl, fifa = resolution_frames
        t0 = time.time()
        out = fuzzy.resolve_entities(fpl, fifa, threshold=90).collect()
        elapsed = time.time() - t0
        by_player = {r["player_id"]: r for r in out}
        assert len(by_player) == 600
        matched = [r for r in out if r["sofifa_id"] is not None]
        # every player has an exact candidate → all should match at 100
        assert len(matched) == 600
        assert all(r["match_best"] == 100.0 for r in matched)
        # exact candidates (1xxxx) or token-reordered ones (2xxxx) both score
        # 100 under token_set_ratio; noise ids (3xxxx) never win
        assert all(r["sofifa_id"] < 30_000 for r in matched)
        # SURVEY M3 perf contract: candidate space is blocked per position
        # class (~600*500 scored pairs); must stay interactive locally
        assert elapsed < 120, f"resolution took {elapsed:.0f}s"

    def test_blocking_shrinks_candidates(self, resolution_frames):
        fpl, fifa = resolution_frames
        blocked = fuzzy._fifa_blocked(fifa)
        per_class = {r["position_name"]: r["n"] for r in
                     blocked.groupBy("position_name").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(per_class) == set(POSITIONS)
        # candidate pairs = sum(fpl_class * fifa_class) ≈ 1/4 of the cross join
        total_pairs = sum(150 * per_class[p] for p in POSITIONS)
        assert total_pairs < 600 * 2000 / 2


class TestFullSeasonModel:
    def test_train_played_model_on_full_season(self, spark, tmp_path_factory):
        from fantasy_premier_league_spark.etl import features as FF
        from fantasy_premier_league_spark.etl import ingest, transform
        from fantasy_premier_league_spark.ml import pipeline as P
        from fantasy_premier_league_spark.ml import splits as S
        from tests.test_etl_fullseason import build_season

        outdir = tmp_path_factory.mktemp("season_ml")
        paths = build_season(str(outdir))
        cat = transform.build_all(
            ingest.read_fixtures_json(spark, paths["fixtures"]),
            ingest.read_main_json(spark, paths["main"]),
            ingest.read_players_json(spark, paths["players"]),
        )
        feat_cols = ["previous_total_points", "previous_minutes", "diff_strength",
                     "transfers_in_share", "previous_points_decile", "days_since_last"]
        mm = FF.build_model_matrix(cat).fillna(0, subset=feat_cols)
        train, test = S.entity_train_test_split(mm, entity="player_id", test_fraction=0.25)
        train = P.add_balanced_weights(train, label="target_played")
        model = P.make_classifier_pipeline(feature_cols=feat_cols, label="target_played").fit(train)
        preds = model.transform(test.withColumn("weight", F.lit(1.0)))
        metrics = P.evaluate_binary(preds, label="target_played")
        # synthetic labels carry weak signal; the integration contract is a
        # well-formed, calibrated model over 15k rows, not model quality
        assert 0.0 <= metrics["roc_auc"] <= 1.0
        assert 0.0 <= metrics["accuracy"] <= 1.0
        probs = preds.select(F.min("prediction"), F.max("prediction")).first()
        assert set([probs[0], probs[1]]) <= {0.0, 1.0}
        assert preds.filter(F.col("prediction").isNull()).count() == 0
