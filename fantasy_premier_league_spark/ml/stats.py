"""Statistical surface (SURVEY §2.10 A13, M15).

Full correlation matrices over ~150 numeric columns (EDA § 82-84) via
MLlib ``Correlation.corr`` on an assembled vector — one distributed pass,
O(d^2) result on the driver (a 150x150 matrix is 90 KB; fine). Pairwise
``F.corr`` stays the right tool for a handful of pairs (q19).
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.stat import Correlation
from pyspark.sql import DataFrame

from ..operators.local import local_frame


def correlation_matrix(df: DataFrame, cols: list[str], *, method: str = "pearson") -> DataFrame:
    """(col_a, col_b, corr) long-form matrix, upper triangle included both
    ways; method in {pearson, spearman} (EDA § 82-84; M1 § 33; M2 § 20)."""
    spark = df.sparkSession
    assembled = VectorAssembler(inputCols=cols, outputCol="__v", handleInvalid="skip").transform(df)
    mat = Correlation.corr(assembled, "__v", method).first()[0].toArray()
    rows = [
        (cols[i], cols[j], float(mat[i][j]))
        for i in range(len(cols))
        for j in range(len(cols))
    ]
    return local_frame(spark, rows, "col_a string, col_b string, corr double")


def top_correlations(corr_long: DataFrame, *, k: int = 10) -> DataFrame:
    """O5: strongest off-diagonal correlations (EDA § 83-84 head(10))."""
    from pyspark.sql import functions as F

    return (
        corr_long.filter(F.col("col_a") < F.col("col_b"))
        .orderBy(F.desc(F.abs(F.col("corr"))), F.asc("col_a"), F.asc("col_b"))
        .limit(k)
    )
