"""Streaming quality gate: an offline-trained DSIR model applied at ingest.

The production shape for model-guided data selection: the bucket model is
trained ONCE from a static reference corpus (operators/selection.py::
dsir_bucket_model — a 256-row artifact), then every arriving micro-batch
is scored against it inside ``foreachBatch`` and routed to an accept or
reject sink. No streaming state at all — the model is static, scoring is
a broadcast join + per-doc aggregate within the batch, so the gate runs
at whatever rate the source delivers.

This is the train-offline / serve-in-stream twin of
streaming/dedup.py::run_near_dup_ingest (whose state lives in the
signature index); here the "state" is the frozen model frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.selection import dsir_score


def run_dsir_gate(
    docs_stream: DataFrame,
    model: DataFrame,
    *,
    accept_path: str,
    reject_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    threshold: float = 0.0,
    available_now: bool = True,
):
    """Route a document stream through the DSIR gate.

    Per micro-batch: score every document against the frozen ``model``
    (``(bucket, log_ratio)``, trained offline), then append rows with
    ``dsir_score >= threshold`` to ``accept_path`` and the rest —
    including token-less documents, which score null — to
    ``reject_path``. Both sinks carry the original columns plus
    ``n_tokens`` and ``dsir_score``.

    Exactly-once caveats are run_near_dup_ingest's: foreachBatch replays
    failed batches; production points the sinks at transactional tables,
    the parquet append here is the test-harness stand-in.
    """

    def _gate(batch: DataFrame, _batch_id: int) -> None:
        scores = dsir_score(batch, id_col, text_col, model, n_buckets=n_buckets)
        scored = batch.join(
            scores.withColumnRenamed("doc_id", id_col), id_col, "left"
        )
        accept = scored.filter(F.col("dsir_score") >= threshold)
        reject = scored.filter(
            F.col("dsir_score").isNull() | (F.col("dsir_score") < threshold)
        )
        accept.write.mode("append").parquet(accept_path)
        reject.write.mode("append").parquet(reject_path)

    writer = docs_stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
