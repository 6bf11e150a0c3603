"""Ingestion of raw FPL JSON payloads into typed DataFrames.

Three documents (reference: etl/extract.py:8-46, etl/run_transform.py:81-83):

- ``fixtures.json`` — array of fixture objects → one row each
- ``main.json``     — object with 4 keyed lists (events/teams/element_types/
                      elements) → 4 DataFrames via explode
- ``players.json``  — object keyed by player_id, each value holding 3
                      sub-lists (history/fixtures/history_past).

The reference loops over the players dict building ~700 pandas frames and
concatenating (run_transform.py:249-254, U1). Spark-first: parse the whole
document as ``map<string, struct<...>>``, explode the map once — the dict
key becomes the ``player_id`` column, and each sub-list explodes into its
fact table. One scan, no unions, fully parallel.

Schemas are declared (SURVEY §1.3: declared side primary, inference only at
the JSON edge). String-typed numeric fields from the API (form, ict_index…)
are kept as strings here; the transform layer casts them (F2 semantics via
try_* = null-on-failure, matching pandas errors='coerce').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- element schemas ------------------------------------------------------

_HISTORY_FIELDS = [
    ("element", T.LongType()),
    ("fixture", T.LongType()),
    ("opponent_team", T.LongType()),
    ("total_points", T.LongType()),
    ("was_home", T.BooleanType()),
    ("kickoff_time", T.StringType()),
    ("team_h_score", T.LongType()),
    ("team_a_score", T.LongType()),
    ("round", T.LongType()),
    ("minutes", T.LongType()),
    ("goals_scored", T.LongType()),
    ("assists", T.LongType()),
    ("clean_sheets", T.LongType()),
    ("goals_conceded", T.LongType()),
    ("own_goals", T.LongType()),
    ("penalties_saved", T.LongType()),
    ("penalties_missed", T.LongType()),
    ("yellow_cards", T.LongType()),
    ("red_cards", T.LongType()),
    ("saves", T.LongType()),
    ("bonus", T.LongType()),
    ("bps", T.LongType()),
    ("influence", T.StringType()),
    ("creativity", T.StringType()),
    ("threat", T.StringType()),
    ("ict_index", T.StringType()),
    ("value", T.LongType()),
    ("transfers_balance", T.LongType()),
    ("selected", T.LongType()),
    ("transfers_in", T.LongType()),
    ("transfers_out", T.LongType()),
]

_FUTURE_FIELDS = [
    ("id", T.LongType()),
    ("code", T.LongType()),
    ("team_h", T.LongType()),
    ("team_a", T.LongType()),
    ("team_h_score", T.LongType()),
    ("team_a_score", T.LongType()),
    ("event", T.LongType()),
    ("finished", T.BooleanType()),
    ("minutes", T.LongType()),
    ("provisional_start_time", T.BooleanType()),
    ("kickoff_time", T.StringType()),
    ("event_name", T.StringType()),
    ("is_home", T.BooleanType()),
    ("difficulty", T.LongType()),
]

_HISTORY_PAST_FIELDS = [
    ("season_name", T.StringType()),
    ("element_code", T.LongType()),
    ("start_cost", T.LongType()),
    ("end_cost", T.LongType()),
    ("total_points", T.LongType()),
    ("minutes", T.LongType()),
    ("goals_scored", T.LongType()),
    ("assists", T.LongType()),
    ("clean_sheets", T.LongType()),
    ("goals_conceded", T.LongType()),
    ("own_goals", T.LongType()),
    ("penalties_saved", T.LongType()),
    ("penalties_missed", T.LongType()),
    ("yellow_cards", T.LongType()),
    ("red_cards", T.LongType()),
    ("saves", T.LongType()),
    ("bonus", T.LongType()),
    ("bps", T.LongType()),
    ("influence", T.StringType()),
    ("creativity", T.StringType()),
    ("threat", T.StringType()),
    ("ict_index", T.StringType()),
]


def _struct(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


PLAYER_DOC_SCHEMA = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("history", T.ArrayType(_struct(_HISTORY_FIELDS)), True),
            T.StructField("fixtures", T.ArrayType(_struct(_FUTURE_FIELDS)), True),
            T.StructField("history_past", T.ArrayType(_struct(_HISTORY_PAST_FIELDS)), True),
        ]
    ),
)


def read_fixtures_json(spark: SparkSession, path: str) -> DataFrame:
    """fixtures.json: top-level array of fixture objects (S3)."""
    return spark.read.option("multiLine", True).json(path)


def read_main_json(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """main.json: one object with keyed lists → {events, teams,
    element_types, elements} DataFrames."""
    doc = spark.read.option("multiLine", True).json(path)
    out = {}
    for key in ("events", "teams", "element_types", "elements"):
        out[key] = doc.select(F.explode(key).alias("r")).select("r.*")
    return out


def read_players_json(spark: SparkSession, path: str, *, strict: bool = True) -> dict[str, DataFrame]:
    """players.json: dict keyed by player_id → exploded history / fixtures /
    history_past DataFrames, each carrying ``player_id`` (the dict key,
    reference run_transform.py:251-252).

    ``strict`` guards the silent-corruption mode of ``from_json`` (a
    malformed document parses to null → an empty catalog with no error):
    non-empty input that fails to parse raises.
    """
    raw = spark.read.text(path, wholetext=True)
    parsed = raw.select(F.from_json(F.col("value"), PLAYER_DOC_SCHEMA).alias("m"), "value")
    if strict:
        bad = parsed.filter(F.col("m").isNull() & (F.length(F.trim(F.col("value"))) > 0)).count()
        if bad:
            raise ValueError(f"players document at {path} is not parseable as the expected schema")
    per_player = parsed.select(F.explode("m").alias("player_id", "doc"))
    out = {}
    for key in ("history", "fixtures", "history_past"):
        out[key] = per_player.select("player_id", F.explode(f"doc.{key}").alias("r")).select(
            "player_id", "r.*"
        )
    return out
