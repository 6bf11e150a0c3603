"""FIFA-20 dataset cleaning + enrichment (EDA.ipynb § 35-65; SURVEY M4).

The CSV's quirks and their Spark expressions:

- ``work_rate`` "High/Medium" → two int columns via split + dict map
  (EDA § 43, F4/F6)
- per-position ratings as "NN+M" strings → numeric sum, null → 0
  (EDA § 61, F4)
- GK columns null for outfielders / outfield columns null for GKs → 0
  (EDA § 50)
- ``player_tags``/``player_traits`` comma lists with '#'/nbsp noise →
  lowercased, tag boolean columns (EDA § 44-45, F3/F23)
- ``release_clause_eur`` ~10% null → log-log regression imputation from
  ``value_eur`` (EDA § 51-60, M14 — ml/impute.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.features import tag_columns

#: dropped on load (EDA § 42)
DROP_COLS = [
    "player_url", "real_face", "team_position", "team_jersey_number",
    "loaned_from", "nation_position", "nation_jersey_number",
    "contract_valid_until", "joined",
]

#: per-position "NN+M" rating columns (EDA § 61 pos_cols)
POS_RATING_COLS = [
    "ls", "st", "rs", "lw", "lf", "cf", "rf", "rw", "lam", "cam", "ram",
    "lm", "lcm", "cm", "rcm", "rm", "lwb", "ldm", "cdm", "rdm", "rwb",
    "lb", "lcb", "cb", "rcb", "rb",
]

GK_COLS = ["gk_diving", "gk_handling", "gk_kicking", "gk_reflexes", "gk_speed", "gk_positioning"]
OUTFIELD_COLS = ["pace", "shooting", "passing", "dribbling", "defending", "physic"]

WORK_RATE_MAP = {"Low": 1, "Medium": 2, "High": 3}


def read_fifa_csv(spark: SparkSession, path: str) -> DataFrame:
    """S6: header CSV with inferred types (explicit-schema upgrade point)."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    return df.drop(*[c for c in DROP_COLS if c in df.columns])


def _work_rate_value(part: F.Column) -> F.Column:
    expr = F.lit(None).cast("int")
    for name, val in WORK_RATE_MAP.items():
        expr = F.when(part == name, val).otherwise(expr)
    return expr


def clean_fifa(df: DataFrame, *, max_tags: int = 64) -> tuple[DataFrame, list[str]]:
    """The EDA § 42-61 cleaning chain as one lazy plan. Returns the cleaned
    frame and the discovered tag vocabulary."""
    # work_rate "Attack/Defense" → two mapped int columns (§ 43)
    wr = F.split(F.col("work_rate"), "/")
    df = (
        df.withColumn("work_rate_attack", _work_rate_value(wr.getItem(0)))
        .withColumn("work_rate_defense", _work_rate_value(wr.getItem(1)))
        .drop("work_rate")
    )
    # text-ish columns lowercased, null → '' (§ 44)
    for c in ("player_tags", "player_traits", "body_type", "preferred_foot"):
        if c in df.columns:
            df = df.withColumn(c, F.lower(F.coalesce(F.col(c), F.lit(""))))
    # "NN+M" position ratings → summed numeric pos_<c>, null → 0 (§ 61)
    for c in POS_RATING_COLS:
        if c in df.columns:
            parts = F.split(F.col(c).cast("string"), r"\+")
            total = F.aggregate(
                F.transform(parts, lambda p: F.coalesce(p.try_cast("double"), F.lit(0.0))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            df = df.withColumn(f"pos_{c}", F.when(F.col(c).isNull(), 0.0).otherwise(total)).drop(c)
    # GK/outfield structural nulls → 0 (§ 50)
    fill0 = [c for c in GK_COLS + OUTFIELD_COLS if c in df.columns]
    df = df.fillna(0, subset=fill0)
    # tag boolean columns (§ 45, F23)
    df, vocab = tag_columns(df, col="player_tags", max_tags=max_tags, prefix="ptag_")
    return df, vocab
