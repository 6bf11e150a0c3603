"""Experimentation analytics: deterministic arm assignment and the
two-proportion z-test — the batch statistics behind A/B dashboards.

Reference analogue: the reference's notebook-side model evaluation
(accuracy deltas between heuristics) is the same compare-two-rates
shape; here it is a distributed aggregate over the event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash32


def assign_arm(user_col: F.Column, *, n_arms: int = 2, salt: str = "exp1") -> F.Column:
    """Deterministic, engine-portable arm assignment: md5-derived hash of
    (salt || user) mod n_arms. Stable across runs/engines (the same
    portable hash the sketch family uses), uniform enough for bucketing,
    and reproducible in the DuckDB oracle."""
    return portable_hash32(F.concat(F.lit(salt), user_col.cast("string"))) % n_arms


def ab_conversion_ztest(
    per_user: DataFrame,
    *,
    arm_col: str = "arm",
    converted_col: str = "converted",
    z_threshold: float = 1.96,
) -> DataFrame:
    """Two-proportion z-test between arm 0 (control) and arm 1
    (treatment) over per-user conversion flags.

    Input: one row per user with an integer arm and a 0/1 conversion
    flag. The whole test is two tiny aggregates: a per-arm groupBy
    (2 rows) and closed-form math on the pooled rate — the event log is
    touched exactly once upstream to build the per-user frame. Returns
    ONE row: n/conversions/rate per arm, pooled z (4 dp — the rounding
    absorbs float-sum ordering across engines), and a |z| >= 1.96
    significance flag. Degenerate pools (pooled rate 0 or 1, or an
    empty arm) yield a null z and flag 0 instead of dividing by zero.
    """
    arms = per_user.groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(converted_col).alias("conv"),
    )
    a = arms.filter(F.col(arm_col) == 0).select(
        F.col("n").alias("n_control"), F.col("conv").alias("conv_control")
    )
    b = arms.filter(F.col(arm_col) == 1).select(
        F.col("n").alias("n_treat"), F.col("conv").alias("conv_treat")
    )
    row = a.crossJoin(F.broadcast(b))
    p_a = F.col("conv_control") / F.col("n_control")
    p_b = F.col("conv_treat") / F.col("n_treat")
    pooled = (F.col("conv_control") + F.col("conv_treat")) / (
        F.col("n_control") + F.col("n_treat")
    )
    se = F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n_control") + 1 / F.col("n_treat"))
    )
    z = F.when(se > 0, F.round((p_b - p_a) / se, 4)).otherwise(
        F.lit(None).cast("double")
    )
    return row.select(
        "n_control",
        "conv_control",
        F.round(p_a, 6).alias("rate_control"),
        "n_treat",
        "conv_treat",
        F.round(p_b, 6).alias("rate_treat"),
        z.alias("zstat"),
        F.when(F.abs(z) >= z_threshold, F.lit(1)).otherwise(F.lit(0)).alias("significant"),
    )


def growth_accounting(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
) -> DataFrame:
    """Daily growth accounting: active users, new vs returning split, and
    the cumulative user curve — the DAU/new/returning decomposition on
    every growth dashboard.

    One (user, day) distinct, one user-keyed min-day aggregate folded in
    as a window (first-seen flag), one day-keyed groupBy, and a running
    sum over the day-ordered totals. All shuffles are on bounded keys;
    the final cumulative window is over the days-sized frame only.
    """
    day = F.datediff(F.col(ts_col), F.lit(epoch).cast("date"))
    from pyspark.sql import Window as W

    ud = events.select(F.col(key_col).alias("u"), day.alias("day")).distinct()
    first_day = F.min("day").over(W.partitionBy("u"))
    flagged = ud.withColumn("is_new", (F.col("day") == first_day).cast("int"))
    daily = flagged.groupBy("day").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum("is_new").alias("new_users"),
    )
    cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(cum).alias("cumulative_users"),
    )


def cuped_adjusted_ab(
    per_user: DataFrame,
    *,
    arm_col: str = "arm",
    metric_col: str = "y",
    covariate_col: str = "x",
) -> DataFrame:
    """CUPED variance reduction for an A/B comparison (Deng et al.,
    WSDM'13): adjust each user's metric with a pre-experiment covariate
    — y_adj = y - θ·(x - x̄), θ = cov(x,y)/var(x) — shrinking metric
    variance by the squared correlation without biasing the treatment
    difference (θ is fit on the pooled population, and E[x] is arm-
    independent under randomization).

    Everything reduces to INTEGER sufficient statistics (n, Σx, Σy,
    Σx², Σxy — exact in doubles for any realistic count scale), so θ
    and the adjusted means are bit-deterministic across engines and
    partitionings — no float-sum ordering anywhere. Two tiny
    aggregates: pooled stats (1 row, broadcast) and per-arm sums; the
    per-user frame is scanned twice but is users-sized.

    Returns ONE row: theta, adjusted control/treatment means, their
    difference, and the variance-reduction percentage (100·ρ²); null
    theta (and unadjusted means) when var(x) = 0.
    """
    x, y = F.col(covariate_col), F.col(metric_col)
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    arms = per_user.groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("n_a"),
        F.sum(x).alias("sx_a"),
        F.sum(y).alias("sy_a"),
    )
    a = arms.filter(F.col(arm_col) == 0).select(
        F.col("n_a").alias("n_c"), F.col("sx_a").alias("sx_c"), F.col("sy_a").alias("sy_c")
    )
    b = arms.filter(F.col(arm_col) == 1).select(
        F.col("n_a").alias("n_t"), F.col("sx_a").alias("sx_t"), F.col("sy_a").alias("sy_t")
    )
    row = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(pooled))
    varx_n2 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov_n2 = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    theta = F.when(varx_n2 > 0, cov_n2 / varx_n2).otherwise(F.lit(None).cast("double"))
    xbar = F.col("sx") / F.col("n")
    adj = lambda sy_a, n_a, sx_a: (  # noqa: E731 - local formula
        sy_a / n_a - F.coalesce(theta, F.lit(0.0)) * (sx_a / n_a - xbar)
    )
    mean_c = adj(F.col("sy_c"), F.col("n_c"), F.col("sx_c"))
    mean_t = adj(F.col("sy_t"), F.col("n_t"), F.col("sx_t"))
    rho2 = F.when(
        (varx_n2 > 0) & (vary_n2 > 0), (cov_n2 * cov_n2) / (varx_n2 * vary_n2)
    ).otherwise(F.lit(0.0))
    return row.select(
        F.round(theta, 6).alias("theta"),
        F.round(mean_c, 6).alias("adj_rate_control"),
        F.round(mean_t, 6).alias("adj_rate_treat"),
        F.round(mean_t - mean_c, 6).alias("adj_diff"),
        F.round(100.0 * rho2, 2).alias("var_reduction_pct"),
    )
