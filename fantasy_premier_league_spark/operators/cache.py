"""Session-scoped lifecycle tracking for operator-persisted frames.

Several operators persist an intermediate that feeds multiple consumers of
one returned plan (the dedup inverted index, MinHash/SimHash sketch tables,
PageRank's degree-annotated edge list). The returned DataFrame is lazy, so
the operator itself has no terminal action after which it could unpersist —
left alone, the cached blocks outlive the query and accumulate across calls
in a long-lived session or a 90-query bench run.

``tracked_persist`` registers every such frame; ``release_operator_caches``
drops them all once the caller has consumed its results. The bench harness
releases after every query, long-lived pipelines should release per stage.
Unpersisting a CACHE is always safe in Spark (blocks drop, lineage
recomputes), so for tracked_persist frames a release that races a
still-running consumer costs performance, never correctness.
TRACKED CHECKPOINTS are stricter: a localCheckpoint's lineage is truncated,
so once its blocks release the returned DataFrame cannot be re-executed —
release only AFTER all consumers (including any later re-collect of the
same result frame) are done. The per-query bench/parity harnesses satisfy
this by construction (collect once, release, never touch the frame again).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_TRACKED_CHECKPOINTS: list[tuple[object, list[int]]] = []  # (SparkContext, rdd ids)


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for a later bulk release."""
    out = df.persist()
    _TRACKED.append(out)
    return out


def _persistent_rdd_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` + registration of the checkpoint's
    storage blocks for a later bulk release.

    localCheckpoint persists its RDD at the RDD layer, invisible to
    ``DataFrame.unpersist`` (which only talks to the SQL cache manager) —
    without this wrapper every checkpointed iteration (PageRank, label
    propagation, connected components) would leave a nodes-sized block set
    resident for the life of the session, accumulating across a 136-query
    bench run. The checkpoint is EAGER so the newly-persisted RDD ids are
    observable as a before/after delta of ``getPersistentRDDs``.

    Unlike plain caches, a released checkpoint cannot be recomputed (its
    lineage was truncated) — release only after the results are consumed,
    which is already the module contract.
    """
    sc = df.sparkSession.sparkContext
    before = _persistent_rdd_ids(sc)
    out = df.localCheckpoint(eager=True)
    new_ids = sorted(_persistent_rdd_ids(sc) - before)
    if new_ids:
        _TRACKED_CHECKPOINTS.append((sc, new_ids))
    return out


def release_operator_caches(*, blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    while _TRACKED_CHECKPOINTS:
        sc, ids = _TRACKED_CHECKPOINTS.pop()
        try:
            jmap = sc._jsc.getPersistentRDDs()
            for rdd_id in ids:
                jrdd = jmap.get(rdd_id)
                if jrdd is not None:
                    jrdd.unpersist(blocking)
                    released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return released
