"""Scalar (int8) quantization of embedding columns.

The standard memory/IO lever for a 100 TB embedding store: per-dimension
min/max over the corpus, each float mapped to an 8-bit code

    q = floor((x - min_d) * 255 / (max_d - min_d) + 0.5)

and reconstructed as ``min_d + q * range_d / 255``. A 64-dim float32
vector drops from 256 B to 64 B; at retrieval time the codes are either
compared directly (asymmetric distance, as in operators/similarity.py's
PQ scan) or dequantized on the fly.

Dataflow (the 100 TB shape):
- pass 1 (stats): posexplode to (pos, val), one groupBy(pos) — output is
  dims-sized (64 rows), partial agg collapses the stream map-side;
- the per-dim stats are packed into two array literals on a ONE-ROW frame
  and broadcast-cross-joined — no driver collect, no corpus shuffle;
- pass 2 (encode/measure): pure ``zip_with``/``aggregate`` Column
  expressions, whole-stage codegen, narrow — scan speed.

``floor(x + 0.5)`` is used instead of round() so the grid is identical
in any engine (round() half-even vs half-up varies); the whole operator
is replayable in ANSI SQL and value-hash checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim_stats(e: DataFrame) -> DataFrame:
    """One-row frame with ``mins``/``maxs`` arrays ordered by dimension."""
    dims = (
        e.select(F.posexplode("v").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    )
    # array_sort on struct arrays orders by the leading field (pos), so the
    # packed arrays are dimension-ordered without an orderBy-collect race.
    return dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s["mx"]
        ).alias("maxs"),
    )


def _with_reconstruction(e: DataFrame) -> DataFrame:
    """Attach quantization columns to ``(vec_id, v)``: codes ``q`` and
    dequantized reconstruction ``r`` (array<double> each)."""
    stats = _dim_stats(e)
    x = e.crossJoin(F.broadcast(stats))

    ranges = F.zip_with("maxs", "mins", lambda mx, mn: mx - mn)
    x = x.withColumn("rng", ranges)
    codes = F.zip_with(
        F.zip_with("v", "mins", lambda a, mn: a - mn),
        "rng",
        lambda d, r: F.when(r == 0, F.lit(0.0)).otherwise(
            F.floor(d * 255.0 / r + 0.5).cast("double")
        ),
    )
    x = x.withColumn("q", codes)
    recon = F.zip_with(
        F.zip_with("q", "rng", lambda qq, r: qq * r / 255.0),
        "mins",
        lambda s, mn: s + mn,
    )
    return x.withColumn("r", recon)


def int8_reconstruct(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """``(vec_id, r)`` — the corpus as it would be served from the int8
    store (quantize → dequantize). Feeding this to the ANN operators
    measures end-to-end retrieval quality under quantization."""
    e = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    return _with_reconstruction(e).select("vec_id", "r")


def int8_quantize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Quantize ``vec_col`` to int8 codes and measure reconstruction loss.

    Returns one row per vector::

        vec_id, n_dims, rmse, cos_sim

    ``rmse`` is the per-vector reconstruction root-mean-square error and
    ``cos_sim`` the cosine between the original and its reconstruction —
    the two numbers that decide whether int8 is safe for a given corpus.
    Constant dimensions (max == min) quantize to code 0 and reconstruct
    exactly.
    """
    e = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    x = _with_reconstruction(e)

    sq_err = F.aggregate(
        F.zip_with("v", "r", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    dot = F.aggregate(
        F.zip_with("v", "r", lambda a, b: a * b), F.lit(0.0), lambda acc, t: acc + t
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, t: acc + t * t)
    )
    denom = norm(F.col("v")) * norm(F.col("r"))
    return x.select(
        "vec_id",
        F.size("v").alias("n_dims"),
        F.round(F.sqrt(sq_err / F.size("v")), 6).alias("rmse"),
        # zero vectors (or zero reconstructions) have no direction — null,
        # not a divide-by-zero under ANSI mode
        F.when(denom == 0, F.lit(None).cast("double"))
        .otherwise(F.round(dot / denom, 4))
        .alias("cos_sim"),
    )
