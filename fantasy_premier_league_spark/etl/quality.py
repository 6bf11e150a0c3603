"""Data-quality constraint operators (SURVEY §2.9, Q1-Q5).

The reference enforces PK uniqueness and not-null PKs as runtime checks on
every transform run (etl/transform.py:14-56, etl/run_transform.py:462-506),
with a raise-vs-warn switch. Spark has no constraint enforcement, so these
are deliberate actions; run them on cached inputs when checking many tables
built from the same plan.
"""

from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


class DataValidationError(ValueError):
    """A PK constraint failed and raise_errors was set (Q3)."""


@dataclass(frozen=True)
class CheckResult:
    table: str
    check: str
    ok: bool
    detail: str = ""


def _fail(result: CheckResult, raise_errors: bool) -> CheckResult:
    msg = f"{result.table}: {result.check} failed — {result.detail}"
    if raise_errors:
        raise DataValidationError(msg)
    warnings.warn(msg, stacklevel=3)
    log.warning(msg)
    return result


def check_unique_pk(df: DataFrame, pk: list[str], table: str, *, raise_errors: bool = True) -> CheckResult:
    """Q1: no duplicate PK tuples (≙ dval_unique_index). Diagnostic counts
    come from one groupBy rather than count-vs-distinct-count twice."""
    dup = (
        df.groupBy(*pk)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("groups"), F.coalesce(F.sum("n"), F.lit(0)).alias("rows"))
        .first()
    )
    if dup["groups"]:
        return _fail(
            CheckResult(table, "unique_pk", False, f"{dup['groups']} duplicated keys over {dup['rows']} rows"),
            raise_errors,
        )
    return CheckResult(table, "unique_pk", True)


def check_notnull_pk(df: DataFrame, pk: list[str], table: str, *, raise_errors: bool = True) -> CheckResult:
    """Q2: no nulls in any PK level (≙ dval_notnull_index)."""
    cond = None
    for c in pk:
        cond = F.col(c).isNull() if cond is None else (cond | F.col(c).isNull())
    n = df.filter(cond).count()
    if n:
        return _fail(CheckResult(table, "notnull_pk", False, f"{n} rows with null PK"), raise_errors)
    return CheckResult(table, "notnull_pk", True)


def check_join_cardinality(
    build_side: DataFrame, keys: list[str], table: str, *, expect: str = "unique", raise_errors: bool = True
) -> CheckResult:
    """Q4: pre-join cardinality validation (≙ pandas merge validate=
    'many_to_one'/'one_to_one' on the build side, EDA.ipynb § 33,40,65)."""
    assert expect == "unique"
    return check_unique_pk(build_side, keys, f"{table}<join-build-side>", raise_errors=raise_errors)


def validated_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "left",
    *,
    validate: str = "many_to_one",
    right_keys: list[str] | None = None,
    left_keys: list[str] | None = None,
    raise_errors: bool = True,
) -> DataFrame:
    """J6/J7: pandas ``merge(validate=...)`` semantics — assert join-key
    cardinality *before* joining (EDA.ipynb § 33,40,65: validated m:1 and
    1:1 merges). ``validate`` in {'many_to_one', 'one_to_one'}; the right
    side must always be unique on the key, 1:1 additionally checks the
    left. The checks are eager count actions; run them on cached inputs
    when validating many joins from one plan.

    ``on`` may be a column name / list of names (keys inferred) or an
    arbitrary join Column — then ``right_keys`` (and ``left_keys`` for
    1:1) must name the key columns to validate.
    """
    if validate not in ("many_to_one", "one_to_one"):
        raise ValueError(f"unsupported validate mode {validate!r}")
    if isinstance(on, str):
        rk = lk = [on]
    elif isinstance(on, (list, tuple)) and all(isinstance(c, str) for c in on):
        rk = lk = list(on)
    else:
        if right_keys is None:
            raise ValueError(
                "validated_join with a Column condition needs right_keys= "
                "(and left_keys= for one_to_one) naming the join keys to check"
            )
        rk, lk = list(right_keys), list(left_keys or [])
    check_unique_pk(right, rk, "<join-right>", raise_errors=raise_errors)
    if validate == "one_to_one":
        if not lk:
            raise ValueError("one_to_one with a Column condition needs left_keys=")
        check_unique_pk(left, lk, "<join-left>", raise_errors=raise_errors)
    return left.join(right, on, how)


def run_catalog_checks(
    tables: dict[str, DataFrame], pks: dict[str, list[str]], *, raise_errors: bool = True
) -> list[CheckResult]:
    """Q1+Q2 across the whole catalog (≙ run_transform.py:462-506)."""
    results = []
    for name, df in tables.items():
        pk = pks[name]
        results.append(check_unique_pk(df, pk, name, raise_errors=raise_errors))
        results.append(check_notnull_pk(df, pk, name, raise_errors=raise_errors))
    return results
