"""Streaming distinct-count monitor backed by the portable KMV sketch.

The streaming twin of r65 (queries/selection.py::r65_kmv_distinct): each
arriving micro-batch is reduced to per-key KMV state
(operators/incremental.py::kmv_state — the k smallest 60-bit hashes of
the batch's distinct values) and folded into a persisted state store
with the exact merge law kmv(A ∪ B) == k-smallest(kmv(A) ∪ kmv(B)).
Maintenance cost per batch is O(|batch| + |state|) and the state is
BOUNDED BY CONSTRUCTION — n_keys × k longs (~2 KB per key at k=256) no
matter how many rows ever flowed — which is what makes the running
"distinct users/tokens per key so far" dashboard viable at ingest rates
where exact distinct would hold an unbounded set.

Why foreachBatch and not applyInPandasWithState: the sketch state must
be readable by OUTSIDE consumers mid-stream (the monitor's whole point
is that a batch job — or a different engine entirely, the hashes are
portable md5 — can audit the running estimate), so it lives in parquet
the same way streaming/dedup.py's LSM signature index does, not in
opaque operator state. Same exactly-once caveats as run_near_dup_ingest:
foreachBatch replays failed batches; production points the store at a
transactional table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import incremental as INC

#: state schema: key columns + kmv_v array<long>
_STATE_DIR = "state"
_ESTIMATES_DIR = "estimates"


def run_kmv_distinct_monitor(
    stream: DataFrame,
    *,
    keys: list[str],
    value_col: str,
    store_path: str,
    checkpoint: str,
    k: int = 256,
    available_now: bool = True,
):
    """Maintain per-key KMV distinct state over a stream.

    Per micro-batch: sketch the batch (one distinct + salted top-k over
    batch rows only), merge with the persisted state (state-sized), then
    OVERWRITE ``<store>/state`` and APPEND one estimate row per key to
    ``<store>/estimates`` tagged with the batch id — the running
    distinct-count curve a dashboard reads.

    The state overwrite is safe against the read-own-input hazard
    (streaming/dedup.py's LSM tombstone lesson) because the merged state
    is materialized to the driver first — legitimate here and ONLY here
    because the sketch state is bounded by construction (n_keys × k
    longs), never corpus-sized; this is the one collect the design
    guarantees small.
    """
    spark = stream.sparkSession
    state_path = f"{store_path}/{_STATE_DIR}"
    est_path = f"{store_path}/{_ESTIMATES_DIR}"

    def _fold(batch: DataFrame, batch_id: int) -> None:
        batch_state = INC.kmv_state(batch, keys, value_col, k=k)
        try:
            prior = spark.read.parquet(state_path)
            merged = INC.merge_kmv_state(prior, batch_state, k=k)
        except Exception:  # first batch: no state yet
            merged = batch_state
        # bounded by design: n_keys × k longs
        rows = merged.collect()
        if not rows:
            return
        fresh = spark.createDataFrame(rows, merged.schema)
        fresh.write.mode("overwrite").parquet(state_path)
        (
            INC.estimate_kmv(fresh, k=k)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(est_path)
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
