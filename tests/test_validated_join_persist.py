"""Validated joins (J6/J7) + model persistence (S14)."""

from __future__ import annotations

import pytest

from fantasy_premier_league_spark.etl.quality import DataValidationError, validated_join
from fantasy_premier_league_spark.ml import persist as PS


class TestValidatedJoin:
    def test_many_to_one_passes_and_joins(self, spark):
        left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
        right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, dim string")
        out = validated_join(left, right, "k", validate="many_to_one")
        assert out.count() == 3

    def test_duplicate_right_key_raises(self, spark):
        left = spark.createDataFrame([(1, "a")], "k int, v string")
        right = spark.createDataFrame([(1, "X"), (1, "Y")], "k int, dim string")
        with pytest.raises(DataValidationError, match="unique_pk"):
            validated_join(left, right, "k", validate="many_to_one")

    def test_one_to_one_checks_both_sides(self, spark):
        left = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
        right = spark.createDataFrame([(1, "X")], "k int, dim string")
        with pytest.raises(DataValidationError):
            validated_join(left, right, "k", validate="one_to_one")

    def test_bad_mode_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="validate mode"):
            validated_join(df, df, "k", validate="many_to_many")


class TestModelPersistence:
    def test_roundtrip_with_metadata(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from fantasy_premier_league_spark.ml import pipeline as P

        df = spark.createDataFrame(
            [(float(i % 7) / 7, float((i * 3) % 5), i % 2) for i in range(80)],
            "f1 double, f2 double, label int",
        ).withColumn("weight", F.lit(1.0))
        model = P.make_classifier_pipeline(feature_cols=["f1", "f2"], label="label").fit(df)
        meta = {"trained_at": "2026-08-13", "features": ["f1", "f2"], "auc": 0.5}
        PS.save_model_with_metadata(model, str(tmp_path / "m1"), meta)
        loaded, got_meta = PS.load_model_with_metadata(str(tmp_path / "m1"))
        assert got_meta == meta
        orig = model.transform(df).select("prediction").collect()
        again = loaded.transform(df).select("prediction").collect()
        assert orig == again
