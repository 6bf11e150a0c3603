"""Streaming semantic-decontamination gate: benchmark-leak screening at
ingest.

The production shape for eval-set hygiene: the held-out benchmark/eval
embedding set is frozen ONCE (it is small by nature — the same asymmetry
q37_semantic_decontaminate exploits), then every arriving micro-batch of
train-candidate embeddings is scored against it inside ``foreachBatch``
and routed to a clean or contaminated sink. No streaming state at all —
the eval frame is static, scoring is the broadcast-eval cosine fold
(operators/similarity.py::semantic_decontaminate) within the batch, so
the gate runs at whatever rate the source delivers and each batch's cost
is |batch| x |eval| JVM-side dot products.

This is the train-offline / serve-in-stream twin of
streaming/quality.py::run_dsir_gate (frozen 256-row DSIR model there,
frozen eval embedding frame here); the batch query it must agree with is
q37_semantic_decontaminate (queries/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import semantic_decontaminate


def run_decontaminate_gate(
    emb_stream: DataFrame,
    eval_df: DataFrame,
    *,
    clean_path: str,
    contaminated_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    available_now: bool = True,
):
    """Route an embedding stream through the semantic-decontamination gate.

    Per micro-batch: every vector's best cosine match in the frozen
    ``eval_df`` is computed (broadcast fold — the batch side never
    shuffles its vectors), then rows with best cosine >= ``threshold``
    append to ``contaminated_path`` (with ``eval_id`` + ``cosine`` so a
    human can audit WHAT leaked) and the rest to ``clean_path``. Rows
    whose vector is NULL cannot be scored and are routed contaminated —
    the fail-closed choice for a leak filter.

    Exactly-once caveats are run_near_dup_ingest's: foreachBatch replays
    failed batches; production points the sinks at transactional tables,
    the parquet append here is the test-harness stand-in.
    """

    # a decontamination gate with no eval set is a misconfiguration, not
    # an edge case: every row would route contaminated (the left join
    # finds no verdicts). eval_df is static, so count once at start —
    # the count also feeds the operator's broadcast-vs-IVF dispatch so
    # no per-batch count job re-probes the frozen frame.
    n_eval = eval_df.count()
    if n_eval == 0:
        raise ValueError("run_decontaminate_gate: eval_df is empty")

    def _gate(batch: DataFrame, _batch_id: int) -> None:
        # Score per PHYSICAL ROW, not per id value: replayed sources can
        # deliver duplicate ids within a batch, and a NULL-vector row must
        # fail closed even when a scorable row shares its id (ADVICE r12).
        # The surrogate is pinned by persisting the stamped frame — both
        # join sides then read the same materialized ids.
        stamped = batch.withColumn(
            "__row_id", F.monotonically_increasing_id()
        ).persist()
        try:
            scorable = stamped.filter(F.col(vec_col).isNotNull())
            # semantic_decontaminate reads the SAME id column name from
            # both sides; the eval frame keeps its real ids under the
            # surrogate name so audit rows still carry true eval_ids
            verdicts = semantic_decontaminate(
                scorable,
                eval_df.withColumnRenamed(id_col, "__row_id"),
                id_col="__row_id",
                vec_col=vec_col,
                threshold=threshold,
                eval_rows=n_eval,
            ).withColumnRenamed("train_id", "__row_id")
            routed = stamped.join(verdicts, "__row_id", "left").drop("__row_id")
            clean = routed.filter(F.col("contaminated") == 0)
            dirty = routed.filter(
                F.col("contaminated").isNull() | (F.col("contaminated") == 1)
            )
            clean.write.mode("append").parquet(clean_path)
            dirty.write.mode("append").parquet(contaminated_path)
        finally:
            stamped.unpersist()

    writer = emb_stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
