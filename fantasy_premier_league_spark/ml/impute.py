"""Model-based imputation (SURVEY §2.10 M14).

The reference fits a log-log OLS of release_clause_eur on value_eur and
predicts into the nulls (EDA.ipynb § 51-60). Generalized: fit
``log(y) ~ log(x + eps)`` on the non-null rows with MLlib
LinearRegression, fill nulls with ``exp(prediction)``.
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def regression_impute_loglog(
    df: DataFrame, *, x: str, y: str, out: str | None = None, eps: float = 0.001
) -> DataFrame:
    """Fill nulls of ``y`` with exp(OLS_loglog(x)). Non-null rows keep their
    value exactly. One fit job + one transform; no driver-side data."""
    out = out or y
    base = df.withColumn("__lx", F.log(F.col(x) + eps))
    train = base.filter(F.col(y).isNotNull() & F.col("__lx").isNotNull()).withColumn(
        "__ly", F.log(F.col(y))
    )
    assembler = VectorAssembler(inputCols=["__lx"], outputCol="__xv")
    lr = LinearRegression(featuresCol="__xv", labelCol="__ly", predictionCol="__pred")
    model = lr.fit(assembler.transform(train))
    scored = model.transform(assembler.transform(base))
    return scored.withColumn(
        out, F.coalesce(F.col(y), F.exp(F.col("__pred")))
    ).drop("__lx", "__ly", "__xv", "__pred")
