"""Skew-handling join utilities.

AQE's skew-join splitting covers sort-merge joins at runtime; explicit
salting remains the tool when a *logical* hot key would overwhelm a single
task (the classic 100 TB failure mode: one user/null key holding 10% of
rows). Pattern:

    left:  salt = deterministic bucket of a high-cardinality disambiguator
    right: replicated once per salt value
    join on (key, salt) — the hot key's rows spread over n_salt tasks.

Deterministic (hash-based, not rand()) so retries/speculative tasks agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salt: int = 8,
    left_disambiguator: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted by a hash of
    ``left_disambiguator`` and the right side replicated ``n_salt`` times.
    Semantically identical to ``left.join(right, on, how)`` for inner/left
    joins with duplicate-free right keys."""
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(left_disambiguator)), F.lit(n_salt)).cast("int")
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_left.join(replicated_right, [on, "__salt"], how)
    return out.drop("__salt")
