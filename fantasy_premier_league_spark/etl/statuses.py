"""players_statuses append log — batch form (etl/run_load.py:205-223;
DDL load.py:404-460).

Per load run, the full players_summary snapshot is stamped with
``gameweek_now`` (the first unfinished gameweek, read back from the live
gameweeks table: run_load.py:34-39 ``MAX(finished)+1``) and
``load_datetime``, then appended — the slowly-accumulating point-in-time
log the as-of reconstruction (etl/features.point_in_time_features) reads.
The streaming form of the same log lives in streaming/snapshots.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def current_gameweek(gameweeks: DataFrame) -> int | None:
    """run_load.py:34-39: MAX(int(gameweek_id)) WHERE finished, plus one
    (the gameweek currently in progress / next to play)."""
    row = gameweeks.filter(F.col("gameweek_finished")).agg(
        F.max(F.col("gameweek_id").cast("int")).alias("m")
    ).first()
    return None if row["m"] is None else row["m"] + 1


def players_statuses_snapshot(
    players_summary: DataFrame, *, gameweek_now: int | None, load_datetime: str
) -> DataFrame:
    """One append batch: players_summary + (gameweek_now, load_datetime).
    PK of the log is (load_datetime, gameweek_now, player_id)."""
    return players_summary.select(
        F.to_timestamp(F.lit(load_datetime)).alias("load_datetime"),
        F.lit(None if gameweek_now is None else str(gameweek_now)).cast("string").alias("gameweek_now"),
        "*",
    )


def append_statuses(
    snapshot: DataFrame, path: str
) -> None:
    """Append the stamped snapshot to the parquet log (JDBC variant:
    sources/jdbc.batch_append)."""
    snapshot.write.mode("append").parquet(path)
