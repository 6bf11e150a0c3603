"""Entity-aware splits (SURVEY §2.10 M9/M10).

The reference uses sklearn GroupKFold / GroupShuffleSplit over player_id
(M1.ipynb § 13-16, M2.ipynb § 9) so no player leaks across train/test. MLlib
has no group-aware CV; the Spark-native form:

- fold = xxhash64(entity, seed) mod k — deterministic, needs no entity
  list on the driver, stays group-consistent by construction at any scale;
- train/test split = the same hash against a fraction threshold.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _entity_bucket(entity: str, seed: int, buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(entity), F.lit(seed)), F.lit(buckets))


def entity_train_test_split(
    df: DataFrame, *, entity: str, test_fraction: float = 0.2, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """M10: split by entity so every row of one entity lands on one side."""
    buckets = 1000
    thresh = int(buckets * test_fraction)
    b = _entity_bucket(entity, seed, buckets)
    return df.filter(b >= thresh), df.filter(b < thresh)


def with_group_fold(df: DataFrame, *, entity: str, k: int = 5, seed: int = 42) -> DataFrame:
    """M9: add a ``fold`` column (0..k-1), constant per entity."""
    return df.withColumn("fold", _entity_bucket(entity, seed, k).cast("int"))


def cross_validate_grouped(
    df: DataFrame,
    *,
    entity: str,
    k: int,
    fit_fn: Callable[[DataFrame], object],
    eval_fn: Callable[[object, DataFrame], float],
    seed: int = 42,
) -> list[float]:
    """M9: group-aware k-fold CV. ``fit_fn(train) -> model``,
    ``eval_fn(model, test) -> metric``. The fold loop is driver-side (as in
    the reference's nested CV) but each fit/eval is a distributed job; the
    folded frame is cached once across all k fits."""
    folded = with_group_fold(df, entity=entity, k=k, seed=seed).cache()
    try:
        scores = []
        for fold in range(k):
            train = folded.filter(F.col("fold") != fold)
            test = folded.filter(F.col("fold") == fold)
            model = fit_fn(train)
            scores.append(eval_fn(model, test))
        return scores
    finally:
        folded.unpersist()
