"""Thirtieth-wave query inventory: continuous-outcome experiment
statistics — Welch's unequal-variance t-test between hash-assigned
arms, and two-feature ordinary least squares solved in closed form
from the normal equations. With q_ab_test_z (proportions),
q_bootstrap_ci (resampling), q_chi2_assoc (association), q_ks_drift /
q_psi_drift (distribution drift) and q_cusum_changepoint
(monitoring), this closes the experiment-analytics toolkit.

Determinism discipline (queries.py header): every statistic is a
closed-form expression of decimal-exact raw moments (sums, sums of
squares, cross-products of exactly-quantized inputs accumulate as
DECIMAL — order-free), evaluated once per output row in identical
IEEE doubles on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from ..operators.dedup import portable_hash60
from . import q


@q(
    "q_welch_ttest",
    oracle="""
    WITH assigned AS (
      SELECT (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT % 2)
               AS arm,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders
    ), m AS (
      SELECT arm, COUNT(*) AS n,
             CAST(SUM(p) AS DOUBLE) AS s1,
             CAST(SUM(p * p) AS DOUBLE) AS s2
      FROM assigned GROUP BY arm
    ), w AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 0 THEN s1 END) AS a1,
             MAX(CASE WHEN arm = 0 THEN s2 END) AS a2,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 1 THEN s1 END) AS b1,
             MAX(CASE WHEN arm = 1 THEN s2 END) AS b2
      FROM m
    ), v AS (
      SELECT n0, n1,
             a1 / n0 AS m0, b1 / n1 AS m1,
             (a2 - a1 * a1 / n0) / (n0 - 1) AS v0,
             (b2 - b1 * b1 / n1) / (n1 - 1) AS v1
      FROM w
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           (m0 - m1) AS diff,
           ((m0 - m1) / SQRT(v0 / n0 + v1 / n1)) AS t,
           (POWER(v0 / n0 + v1 / n1, 2)
                 / (POWER(v0 / n0, 2) / (n0 - 1) + POWER(v1 / n1, 2) / (n1 - 1))) AS df
    FROM v
    """,
    desc="Welch's unequal-variance t-test for mean order value "
         "between md5-hash-assigned customer arms, with the "
         "Welch-Satterthwaite degrees of freedom: the "
         "continuous-outcome A/B readout beside q_ab_test_z's "
         "proportions. Raw moments (count, decimal sum, decimal sum "
         "of squares) accumulate exactly in one combinable agg over "
         "the stream — means and variances are then single IEEE "
         "expressions of identical doubles, so nothing about the "
         "statistic depends on accumulation order at any scale.",
    tags=["agg", "sample"],
)
def q_welch_ttest(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    assigned = o.select(
        F.pmod(portable_hash60(col("o_custkey").cast("string")), F.lit(2)).alias("arm"),
        col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    m = assigned.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("p").cast("double").alias("s1"),
        F.sum(col("p") * col("p")).cast("double").alias("s2"),
    )
    w = m.agg(
        F.max(F.when(col("arm") == 0, col("n"))).alias("n0"),
        F.max(F.when(col("arm") == 0, col("s1"))).alias("a1"),
        F.max(F.when(col("arm") == 0, col("s2"))).alias("a2"),
        F.max(F.when(col("arm") == 1, col("n"))).alias("n1"),
        F.max(F.when(col("arm") == 1, col("s1"))).alias("b1"),
        F.max(F.when(col("arm") == 1, col("s2"))).alias("b2"),
    )
    m0 = col("a1") / col("n0")
    m1 = col("b1") / col("n1")
    v0 = (col("a2") - col("a1") * col("a1") / col("n0")) / (col("n0") - 1)
    v1 = (col("b2") - col("b1") * col("b1") / col("n1")) / (col("n1") - 1)
    se2 = v0 / col("n0") + v1 / col("n1")
    return w.select(
        "n0", "n1",
        (m0 - m1).alias("diff"),
        ((m0 - m1) / F.sqrt(se2)).alias("t"),
        (F.pow(se2, 2)
            / (F.pow(v0 / col("n0"), 2) / (col("n0") - 1)
               + F.pow(v1 / col("n1"), 2) / (col("n1") - 1))).alias("df"),
    )


@q(
    "q_ols_normal_eq",
    oracle="""
    WITH feat AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS DOUBLE) AS x1,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS x2
      FROM lineitem GROUP BY l_orderkey
    ), xy AS (
      SELECT f.x1, f.x2, CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS y,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS yd
      FROM feat f JOIN orders o ON f.l_orderkey = o.o_orderkey
    ), mom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x1 AS DECIMAL(18,0))) AS DOUBLE) AS sx1,
             CAST(SUM(CAST(x2 AS DECIMAL(18,0))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(x1 * x1 AS DECIMAL(18,0))) AS DOUBLE) AS sx11,
             CAST(SUM(CAST(x1 * x2 AS DECIMAL(18,0))) AS DOUBLE) AS sx12,
             CAST(SUM(CAST(x2 * x2 AS DECIMAL(18,0))) AS DOUBLE) AS sx22,
             CAST(SUM(yd) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 AS DECIMAL(10,0)) * yd) AS DOUBLE) AS sx1y,
             CAST(SUM(CAST(x2 AS DECIMAL(10,0)) * yd) AS DOUBLE) AS sx2y,
             CAST(SUM(yd * yd) AS DOUBLE) AS syy
      FROM xy
    ), c AS (
      SELECT n,
             sx11 - sx1 * sx1 / n AS s11,
             sx12 - sx1 * sx2 / n AS s12,
             sx22 - sx2 * sx2 / n AS s22,
             sx1y - sx1 * sy / n AS s1y,
             sx2y - sx2 * sy / n AS s2y,
             syy - sy * sy / n AS stot,
             sx1 / n AS mx1, sx2 / n AS mx2, sy / n AS my
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n,
           ((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12)) AS beta_items,
           ((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12)) AS beta_qty,
           (my - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * mx1
                    - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * mx2) AS intercept,
           (((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * s1y
                  + (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * s2y)
                 / stot) AS r2
    FROM c
    """,
    desc="Two-feature OLS (order value ~ item count + total quantity) "
         "solved in CLOSED FORM from the normal equations — the "
         "distributed linear-regression shape that needs no iteration "
         "and no solver: ONE combinable aggregation collects the nine "
         "raw moments (all decimal-exact: the features are integers, "
         "the target a 2-dec decimal, so sums, squares and "
         "cross-products accumulate without FP error), then the 2x2 "
         "system inverts in a single expression per coefficient; R^2 "
         "falls out of the same centered moments. Extends the "
         "driver-green q_forecast_revenue single-regressor OLS to the "
         "multivariate case; the fact-side join is keyed on the order "
         "and the moment vector is 10 numbers regardless of scale.",
    tags=["agg", "join"],
)
def q_ols_normal_eq(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", col("o_totalprice").cast("decimal(18,2)").alias("yd")
    )
    feat = li.groupBy("l_orderkey").agg(
        F.count("*").cast("double").alias("x1"),
        F.sum(col("l_quantity").cast("long")).cast("double").alias("x2"),
    )
    xy = feat.join(o, col("l_orderkey") == col("o_orderkey"))
    mom = xy.agg(
        F.count("*").alias("n"),
        F.sum(col("x1").cast("decimal(18,0)")).cast("double").alias("sx1"),
        F.sum(col("x2").cast("decimal(18,0)")).cast("double").alias("sx2"),
        F.sum((col("x1") * col("x1")).cast("decimal(18,0)")).cast("double").alias("sx11"),
        F.sum((col("x1") * col("x2")).cast("decimal(18,0)")).cast("double").alias("sx12"),
        F.sum((col("x2") * col("x2")).cast("decimal(18,0)")).cast("double").alias("sx22"),
        F.sum("yd").cast("double").alias("sy"),
        F.sum(col("x1").cast("decimal(10,0)") * col("yd")).cast("double").alias("sx1y"),
        F.sum(col("x2").cast("decimal(10,0)") * col("yd")).cast("double").alias("sx2y"),
        F.sum(col("yd") * col("yd")).cast("double").alias("syy"),
    )
    s11 = col("sx11") - col("sx1") * col("sx1") / col("n")
    s12 = col("sx12") - col("sx1") * col("sx2") / col("n")
    s22 = col("sx22") - col("sx2") * col("sx2") / col("n")
    s1y = col("sx1y") - col("sx1") * col("sy") / col("n")
    s2y = col("sx2y") - col("sx2") * col("sy") / col("n")
    stot = col("syy") - col("sy") * col("sy") / col("n")
    det = s11 * s22 - s12 * s12
    b1 = (s22 * s1y - s12 * s2y) / det
    b2 = (s11 * s2y - s12 * s1y) / det
    return mom.select(
        col("n").cast("long").alias("n"),
        (b1).alias("beta_items"),
        (b2).alias("beta_qty"),
        (col("sy") / col("n") - b1 * col("sx1") / col("n") - b2 * col("sx2") / col("n")).alias("intercept"),
        ((b1 * s1y + b2 * s2y) / stot).alias("r2"),
    )
