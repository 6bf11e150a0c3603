"""Streaming semantic-decontamination gate: benchmark-leak screening at
ingest.

The production shape for eval-set hygiene: the held-out benchmark/eval
embedding set is frozen ONCE (it is small by nature — the same asymmetry
r69_semantic_decontaminate exploits), then every arriving micro-batch of
train-candidate embeddings is scored against it inside ``foreachBatch``
and routed to a clean or contaminated sink. No streaming state at all —
the eval frame is static, scoring is the broadcast-eval cosine fold
(operators/similarity.py::semantic_decontaminate) within the batch, so
the gate runs at whatever rate the source delivers and each batch's cost
is |batch| x |eval| JVM-side dot products.

This is the train-offline / serve-in-stream twin of
streaming/quality.py::run_dsir_gate (frozen 256-row DSIR model there,
frozen eval embedding frame here); the batch query it must agree with is
r69_semantic_decontaminate (queries/similarity.py).
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
    # finds no verdicts). eval_df is static, so check once at start.
    if eval_df.isEmpty():
        raise ValueError("run_decontaminate_gate: eval_df is empty")

    def _gate(batch: DataFrame, _batch_id: int) -> None:
        scorable = batch.filter(F.col(vec_col).isNotNull())
        verdicts = semantic_decontaminate(
            scorable,
            eval_df,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
        ).withColumnRenamed("train_id", id_col)
        routed = batch.join(verdicts, id_col, "left")
        clean = routed.filter(F.col("contaminated") == 0)
        dirty = routed.filter(
            F.col("contaminated").isNull() | (F.col("contaminated") == 1)
        )
        clean.write.mode("append").parquet(clean_path)
        dirty.write.mode("append").parquet(contaminated_path)

    writer = emb_stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
