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
Unpersisting is always safe in Spark (blocks drop, lineage recomputes), so
a release that races a still-running consumer costs performance, never
correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for a later bulk release."""
    out = df.persist()
    _TRACKED.append(out)
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
    return released
