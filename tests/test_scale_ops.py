"""PercentageCalc estimator, salted join, IVF ANN, grouped grid search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fantasy_premier_league_spark.ml.percentage import PercentageCalc
from fantasy_premier_league_spark.operators import similarity as S
from fantasy_premier_league_spark.operators.skew import salted_join


class TestPercentageCalc:
    def test_fit_transform_and_unseen_group_fallback(self, spark):
        train = spark.createDataFrame(
            [("gw1", 30.0), ("gw1", 45.0), ("gw2", 10.0)], "gameweek_id string, transfers double"
        )
        est = PercentageCalc(by_group="gameweek_id", variables=["transfers"], constant=15.0,
                             drop_originals=False)
        model = est.fit(train)
        out = {(r["gameweek_id"], r["transfers"]): r["transfers_perc"]
               for r in model.transform(train).collect()}
        # gw1 total = 75/15 = 5 → 30/5 = 6
        assert out[("gw1", 30.0)] == pytest.approx(6.0)
        assert out[("gw2", 10.0)] == pytest.approx(15.0)
        # unseen gw3 at transform time: totals computed from the new data
        test = spark.createDataFrame([("gw3", 20.0), ("gw3", 40.0)], "gameweek_id string, transfers double")
        got = {r["transfers"]: r["transfers_perc"] for r in model.transform(test).collect()}
        assert got[20.0] == pytest.approx(20.0 / (60.0 / 15.0))

    def test_zero_total_fills_zero(self, spark):
        train = spark.createDataFrame([("g", 0.0), ("g", 0.0)], "gameweek_id string, v double")
        model = PercentageCalc(by_group="gameweek_id", variables=["v"], drop_originals=True).fit(train)
        assert [r["v_perc"] for r in model.transform(train).collect()] == [0.0, 0.0]


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        left = spark.createDataFrame(
            [(1, f"row{i}") for i in range(100)] + [(2, "only")], "k int, tag string"
        )
        right = spark.createDataFrame([(1, "dim1"), (2, "dim2"), (3, "dim3")], "k int, name string")
        plain = {(r["k"], r["tag"], r["name"]) for r in left.join(right, "k").collect()}
        salted = {(r["k"], r["tag"], r["name"])
                  for r in salted_join(left, right, "k", n_salt=4, left_disambiguator="tag").collect()}
        assert salted == plain

    def test_left_join_preserves_unmatched(self, spark):
        left = spark.createDataFrame([(9, "x")], "k int, tag string")
        right = spark.createDataFrame([(1, "d")], "k int, name string")
        out = salted_join(left, right, "k", n_salt=2, left_disambiguator="tag", how="left").collect()
        assert len(out) == 1 and out[0]["name"] is None


class TestIvf:
    def test_ivf_recall_against_bruteforce(self, spark):
        rng = np.random.default_rng(7)
        # clustered data so IVF cells are meaningful
        centers = rng.standard_normal((4, 16)) * 5
        vecs = [(i, (centers[i % 4] + rng.standard_normal(16) * 0.3).tolist()) for i in range(120)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        queries = df.filter(F.col("vec_id") < 4)
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in S.cosine_topk(df, queries, k=3).collect()}
        approx = {(r["query_id"], r["neighbor_id"])
                  for r in S.ivf_topk(df, queries, k=3, n_centroids=4, n_probe=2).collect()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9  # probing the home cell of tight clusters


class TestGridSearch:
    def test_grouped_grid_search_picks_best(self, spark):
        from pyspark.ml.tuning import ParamGridBuilder

        from fantasy_premier_league_spark.ml import pipeline as P

        rng = np.random.default_rng(3)
        rows = [(f"e{i//5}", float(x := rng.standard_normal()), int(x + 0.2 * rng.standard_normal() > 0), 1.0)
                for i in range(400)]
        df = spark.createDataFrame(rows, "entity string, f1 double, label int, weight double")
        pipe = P.make_classifier_pipeline(feature_cols=["f1"], label="label", standardize=False)
        lr = pipe.getStages()[-1]
        grid = ParamGridBuilder().addGrid(lr.regParam, [0.0, 10.0]).build()
        res = P.grid_search_grouped(df, pipeline=pipe, param_grid=grid, entity="entity", k=2, label="label")
        assert len(res["scores"]) == 2
        assert res["best_score"] >= max(s for _, s in res["scores"]) - 1e-9
        assert res["best_params"][lr.regParam] == 0.0  # huge regParam collapses AUC
