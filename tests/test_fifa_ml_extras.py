"""FIFA cleaning + regression imputation + correlation matrix + topic model."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fantasy_premier_league_spark.etl import fifa as FI
from fantasy_premier_league_spark.ml import impute as IM
from fantasy_premier_league_spark.ml import stats as STT
from fantasy_premier_league_spark.ml import text as TX


@pytest.fixture(scope="module")
def fifa_csv(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fifa")
    p = d / "players_20.csv"
    header = (
        "sofifa_id,short_name,long_name,club,player_positions,overall,value_eur,"
        "work_rate,player_tags,player_traits,body_type,preferred_foot,"
        "pace,gk_diving,st,cb,release_clause_eur,player_url,real_face"
    )
    rows = [
        "10,M. Salah,Mohamed Salah,Liverpool,\"RW, LW\",90,80000000,High/Medium,"
        "\"#Speedster, #Dribbler\",Flair,Normal,Left,93,,84+3,55+2,120000000,http://x,No",
        "30,Ederson,Ederson Moraes,Manchester City ,GK,88,50000000,Medium/Medium,"
        ",,Normal,Left,,87,,,90000000,http://y,No",
        "40,K. Walker,Kyle Walker,Manchester City ,RB,85,40000000,High/High,"
        "#Speedster,,Normal,Right,90,,60+1,80,,http://z,No",
    ]
    p.write_text(header + "\n" + "\n".join(rows) + "\n")
    return str(p)


class TestFifaCleaning:
    def test_load_drops_and_cleans(self, spark, fifa_csv):
        raw = FI.read_fifa_csv(spark, fifa_csv)
        assert "player_url" not in raw.columns and "real_face" not in raw.columns
        cleaned, vocab = FI.clean_fifa(raw)
        rows = {r["sofifa_id"]: r.asDict() for r in cleaned.collect()}
        # work_rate split + map
        assert rows[10]["work_rate_attack"] == 3 and rows[10]["work_rate_defense"] == 2
        assert "work_rate" not in cleaned.columns
        # "84+3" → 87.0; null pos rating → 0
        assert rows[10]["pos_st"] == 87.0 and rows[10]["pos_cb"] == 57.0
        assert rows[30]["pos_st"] == 0.0
        # plain numeric rating (no '+') survives as its value
        assert rows[40]["pos_cb"] == 80.0
        # gk/outfield structural nulls → 0
        assert rows[30]["pace"] == 0 and rows[10]["gk_diving"] == 0
        # tags exploded
        assert vocab == ["dribbler", "speedster"]
        assert rows[10]["ptag_speedster"] == 1 and rows[30]["ptag_speedster"] == 0

    def test_release_clause_imputation(self, spark, fifa_csv):
        raw = FI.read_fifa_csv(spark, fifa_csv)
        out = IM.regression_impute_loglog(raw, x="value_eur", y="release_clause_eur")
        rows = {r["sofifa_id"]: r["release_clause_eur"] for r in out.collect()}
        assert rows[10] == 120000000  # non-null untouched
        assert rows[40] is not None and rows[40] > 0  # imputed


class TestCorrelationMatrix:
    def test_pearson_and_spearman_long_form(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(2 * i), float(-i + (i % 2))) for i in range(50)],
            "a double, b double, c double",
        )
        corr = STT.correlation_matrix(df, ["a", "b", "c"])
        vals = {(r["col_a"], r["col_b"]): r["corr"] for r in corr.collect()}
        assert vals[("a", "b")] == pytest.approx(1.0)
        assert vals[("a", "c")] == pytest.approx(-1.0, abs=0.01)
        assert vals[("a", "a")] == pytest.approx(1.0)
        top = STT.top_correlations(corr, k=1).first()
        assert {top["col_a"], top["col_b"]} <= {"a", "b", "c"}
        spear = STT.correlation_matrix(df, ["a", "b"], method="spearman")
        sv = {(r["col_a"], r["col_b"]): r["corr"] for r in spear.collect()}
        assert sv[("a", "b")] == pytest.approx(1.0)


class TestTopicModel:
    def test_lda_over_news_strings(self, spark):
        news = [
            (1, "Knee injury - 75% chance of playing"),
            (2, "Hamstring injury, expected back next month"),
            (3, "Suspended for violent conduct"),
            (4, "Suspended - one match ban"),
            (5, "Joined Lokomotiv on loan"),
            (6, "Loan deal until end of season"),
        ] * 3
        df = spark.createDataFrame(news, "id int, news string")
        model, out = TX.topic_features(df, text_col="news", n_topics=3, vocab_size=50, max_ngram=2)
        assert "topicDistribution" in out.columns
        first = out.first()["topicDistribution"]
        assert len(first) == 3
        assert math.isclose(sum(first), 1.0, rel_tol=1e-6)
        # cleaning stripped punctuation/percent signs
        assert out.filter(F.col("text_clean").contains("%")).count() == 0

    def test_embedded_stopword_list_matches_mllib(self, spark):
        # q21's DuckDB oracle replays StopWordsRemover with a hardcoded
        # copy of MLlib's english list (no JVM in the oracle) — an MLlib
        # upgrade that changes the resource must fail HERE, not as a
        # silent q21 hash mismatch
        from pyspark.ml.feature import StopWordsRemover

        from fantasy_premier_league_spark.queries.text import MLLIB_EN_STOPWORDS

        assert list(MLLIB_EN_STOPWORDS) == StopWordsRemover.loadDefaultStopWords("english")
