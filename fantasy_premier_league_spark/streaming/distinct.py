"""Streaming distinct-count monitor backed by the portable KMV sketch.

The streaming twin of q03 (queries/selection.py::v53_kmv_distinct): each
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
opaque operator state.

Crash atomicity (ADVICE r10): state generations are never overwritten
in place. Each fold writes ``<store>/state/gen-NNNNNNNN`` and readers
resolve the newest generation that carries Spark's ``_SUCCESS`` marker
(the committer writes it last), so a crash mid-write leaves a marker-
less partial dir that is simply skipped and the previous generation
stays readable. Only a genuine "no complete generation exists" is
treated as the first batch — any read error on an existing generation
propagates so the checkpointed foreachBatch retries instead of
destroying accumulated state. Batch replay after a crash is safe
because the KMV merge is idempotent (set-union + k-min: re-merging the
same batch's sketch is a no-op). Same exactly-once caveats as
run_near_dup_ingest otherwise; production points the store at a
transactional table (the generation dance is the filesystem stand-in).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import incremental as INC

#: state schema: key columns + kmv_v array<long>
_STATE_DIR = "state"
_ESTIMATES_DIR = "estimates"
_GEN_PREFIX = "gen-"


def _complete_generations(state_path: str) -> list[int]:
    """Generation numbers under ``state_path`` whose write completed
    (``_SUCCESS`` present). Partial dirs from a crash are ignored."""
    if not os.path.isdir(state_path):
        return []
    gens = []
    for d in os.listdir(state_path):
        if d.startswith(_GEN_PREFIX) and os.path.exists(
            os.path.join(state_path, d, "_SUCCESS")
        ):
            gens.append(int(d[len(_GEN_PREFIX) :]))
    return sorted(gens)


def _gen_dir(state_path: str, gen: int) -> str:
    return os.path.join(state_path, f"{_GEN_PREFIX}{gen:08d}")


def read_kmv_state(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Latest complete state generation, or None if no fold has committed
    yet — the resolution outside consumers (and the fold itself) use."""
    state_path = os.path.join(store_path, _STATE_DIR)
    gens = _complete_generations(state_path)
    if not gens:
        return None
    return spark.read.parquet(_gen_dir(state_path, gens[-1]))


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
    commit a NEW ``<store>/state/gen-N`` generation and APPEND one
    estimate row per key to ``<store>/estimates`` tagged with the batch
    id — the running distinct-count curve a dashboard reads. All but the
    two newest complete generations are pruned after each commit.

    The merged state is materialized to the driver before writing —
    legitimate here and ONLY here because the sketch state is bounded by
    construction (n_keys × k longs), never corpus-sized; this is the one
    collect the design guarantees small.
    """
    spark = stream.sparkSession
    state_path = os.path.join(store_path, _STATE_DIR)
    est_path = os.path.join(store_path, _ESTIMATES_DIR)

    def _fold(batch: DataFrame, batch_id: int) -> None:
        batch_state = INC.kmv_state(batch, keys, value_col, k=k)
        gens = _complete_generations(state_path)
        if gens:
            # an existing generation that fails to read must raise (the
            # checkpointed batch retries) — never be mistaken for "first
            # batch", which would silently reset the distinct curve
            prior = spark.read.parquet(_gen_dir(state_path, gens[-1]))
            merged = INC.merge_kmv_state(prior, batch_state, k=k)
        else:
            merged = batch_state
        # bounded by design: n_keys × k longs
        rows = merged.collect()
        if not rows:
            return
        fresh = spark.createDataFrame(rows, merged.schema)
        new_gen = (gens[-1] + 1) if gens else 1
        # _SUCCESS lands last: a crash anywhere before it leaves this
        # generation invisible and gens[-1] still authoritative
        fresh.write.mode("overwrite").parquet(_gen_dir(state_path, new_gen))
        for g in _complete_generations(state_path):
            if g < new_gen - 1:
                shutil.rmtree(_gen_dir(state_path, g), ignore_errors=True)
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
