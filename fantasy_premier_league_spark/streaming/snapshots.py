"""Streaming ingestion of snapshot drops + windowed event aggregation.

Design: the S12 snapshot convention (``main_YYYYmmdd-HHMMSS.json`` files
landing in a directory) is exactly a Structured Streaming file source. The
append-only ``players_statuses`` table (etl/run_load.py:205-223) becomes a
streaming append sink: each new snapshot contributes one point-in-time row
per player, keyed (snapshot_ts, player_id) — late/duplicate files are
dropped by watermark + dropDuplicates, which the batch reference cannot do.

At scale: file-source listing is incremental (maxFilesPerTrigger), state
for dedup/windows is bounded by the watermark, and checkpointing makes the
append log exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.files import TS_FORMAT, TS_PATTERN

#: point-in-time columns carried into the status log (run_load.py:205-214,
#: FIXTURES.md §5)
STATUS_COLS = [
    "id", "form", "news", "news_added", "status",
    "chance_of_playing_next_round", "chance_of_playing_this_round",
    "transfers_in_event", "transfers_out_event",
]

SNAPSHOT_ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("form", T.StringType()),
        T.StructField("news", T.StringType()),
        T.StructField("news_added", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("chance_of_playing_next_round", T.LongType()),
        T.StructField("chance_of_playing_this_round", T.LongType()),
        T.StructField("transfers_in_event", T.LongType()),
        T.StructField("transfers_out_event", T.LongType()),
    ]
)

SNAPSHOT_DOC_SCHEMA = T.StructType(
    [T.StructField("elements", T.ArrayType(SNAPSHOT_ELEMENT_SCHEMA))]
)


def stream_snapshots(spark: SparkSession, directory: str, *, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming file source over the snapshot directory; one row per
    snapshot document with its name-embedded timestamp."""
    reader = spark.readStream.schema(SNAPSHOT_DOC_SCHEMA).option("multiLine", True)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(directory).withColumn("__file", F.input_file_name())
    name = F.element_at(F.split("__file", "/"), -1)
    return raw.withColumn(
        "snapshot_ts", F.to_timestamp(F.regexp_extract(name, TS_PATTERN, 1), TS_FORMAT)
    )


def players_status_stream(snapshots: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """The players_statuses append log as a stream: explode elements, stamp
    the snapshot timestamp, dedup (snapshot_ts, player_id) within the
    watermark (duplicate file drops are a real S3 failure mode)."""
    exploded = snapshots.select(
        "snapshot_ts", F.explode("elements").alias("e")
    ).select(
        "snapshot_ts",
        F.col("e.id").cast("long").cast("string").alias("player_id"),
        F.col("e.form").try_cast("double").alias("form"),
        F.col("e.news").alias("news"),
        F.try_to_timestamp("e.news_added").alias("news_added_datetime"),
        F.col("e.status").alias("status"),
        F.col("e.chance_of_playing_next_round").cast("int").alias("chance_of_playing_next_round"),
        F.col("e.chance_of_playing_this_round").cast("int").alias("chance_of_playing_this_round"),
        F.col("e.transfers_in_event").cast("int").alias("transfers_in_event"),
        F.col("e.transfers_out_event").cast("int").alias("transfers_out_event"),
    )
    return exploded.withWatermark("snapshot_ts", watermark).dropDuplicates(
        ["snapshot_ts", "player_id"]
    )


def windowed_event_counts(
    events: DataFrame, *, ts: str = "ts", window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the canonical
    late-data-tolerant streaming aggregation (works identically as a batch
    expression; tests assert batch/stream equivalence)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, on: str, *, how: str = "left") -> DataFrame:
    """Stream-static join: enrich a stream with a (broadcastable) dimension
    — the standard shape for attaching user/team attributes to events in
    flight. The static side is re-read per micro-batch, so a slowly
    changing dimension picks up updates without restarting the query."""
    return stream.join(F.broadcast(dim), on, how)


def run_to_parquet(stream: DataFrame, *, path: str, checkpoint: str, mode: str = "append") -> None:
    """Drain a stream to parquet with trigger=availableNow (incremental
    batch): processes everything currently in the source, checkpoints, and
    stops — the scheduled-ingest pattern for snapshot drops."""
    (
        stream.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
