"""Ninety-fifth-wave query inventory: estimator engineering — CUPED
VARIANCE REDUCTION (theta = cov(post, pre)/var(pre) over per-customer
half-period spend, with the variance-reduction factor 1 - rho^2 and
the effective-sample multiplier: the standard pre-period covariate
adjustment that makes A/B tests cheaper — the direct answer to
q_mde_planner's 'your n can't see that lift': CUPED shrinks the
variance so the SAME n can) and the WINSORIZATION VARIANCE GAIN
(per segment, the variance of order value after clamping at the
exact p99 cut vs raw: how much estimator noise the single clamp
removes — quantifying the robustness step q_winsorize applies and
q_hill_tail's heavy tail makes necessary).

Determinism discipline: per-customer spends are exact integer
cents; the period split is the exact FLOOR-midpoint date; all
covariance moments are DECIMAL-accumulated integer cross-products;
the p99 cut is an exact integer-cents percentile; clamped moments
use exact integer products from CDF counts; every ratio is one
closing closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_cuped_adjustment",
    oracle="""
    WITH split AS (
      SELECT CAST(FLOOR((date_diff('day', DATE '1970-01-01',
                                   CAST(MIN(o_orderdate) AS DATE))
                         + date_diff('day', DATE '1970-01-01',
                                     CAST(MAX(o_orderdate) AS DATE)))
                        / 2.0) AS BIGINT) AS mid
      FROM orders
    ), cust AS (
      SELECT o.o_custkey,
             SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                                    CAST(o.o_orderdate AS DATE)) <= s.mid
                      THEN CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT)
                      ELSE 0 END) AS x,
             SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                                    CAST(o.o_orderdate AS DATE)) > s.mid
                      THEN CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT)
                      ELSE 0 END) AS y
      FROM orders o, split s
      GROUP BY o.o_custkey
    ), mom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
      FROM cust
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ((n * sxy - sx * sy) / (n * sxx - sx * sx))
             AS cuped_theta,
           (POWER(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
             AS rho_squared,
           (1 - POWER(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
             AS variance_ratio,
           (1 / (1 - POWER(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))))
             AS effective_n_multiplier
    FROM mom
    """,
    desc="CUPED pre-period adjustment over per-customer spend: split "
         "the order history at the exact midpoint date, regress "
         "post-period spend on pre-period spend — theta = "
         "cov(y,x)/var(x), rho^2, the adjusted-variance ratio "
         "1 - rho^2 and its reciprocal effective-sample multiplier "
         "— the industry-standard variance-reduction that answers "
         "q_mde_planner's verdict ('this n cannot see that lift') "
         "by shrinking the variance so the SAME n can; theta is "
         "exactly what an experimentation platform precomputes per "
         "metric. Per-customer cents are exact integer sums; the "
         "split is FLOOR-midpoint epoch days on both engines; all "
         "moments are DECIMAL cross-products (q_corr_exact "
         "discipline); every output is one closed form.",
    tags=["stats", "agg", "cross"],
)
def q_cuped_adjustment(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    epoch = F.datediff(col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    split = o.agg(
        dfloor((F.min(epoch) + F.max(epoch)) / 2).cast("long").alias("mid")
    )
    cents = dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long")
    cust = (
        o.crossJoin(broadcast(split))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(epoch <= col("mid"), cents).otherwise(0)).alias("x"),
            F.sum(F.when(epoch > col("mid"), cents).otherwise(0)).alias("y"),
        )
    )
    xd = col("x").cast("decimal(38,0)")
    yd = col("y").cast("decimal(38,0)")
    mom = cust.agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * col("y")).cast("double").alias("sxy"),
        F.sum(xd * col("x")).cast("double").alias("sxx"),
        F.sum(yd * col("y")).cast("double").alias("syy"),
    )
    nd = col("n").cast("double")
    cov_n = nd * col("sxy") - col("sx") * col("sy")
    varx_n = nd * col("sxx") - col("sx") * col("sx")
    vary_n = nd * col("syy") - col("sy") * col("sy")
    rho2 = F.pow(cov_n, 2) / (varx_n * vary_n)
    return mom.select(
        col("n").cast("long").alias("n_customers"),
        (cov_n / varx_n).alias("cuped_theta"),
        (rho2).alias("rho_squared"),
        (1 - rho2).alias("variance_ratio"),
        (1 / (1 - rho2)).alias("effective_n_multiplier"),
    )


@q(
    "q_winsor_variance_gain",
    oracle="""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cuts AS (
      SELECT seg, quantile_cont(CAST(cents AS DOUBLE), 0.99) AS p99
      FROM vals GROUP BY seg
    ), clamped AS (
      SELECT v.seg, v.cents,
             CAST(FLOOR((LEAST(CAST(v.cents AS DOUBLE), c.p99)) * 1e4 + 0.5) / 1e4
                  AS DECIMAL(38,4)) AS w
      FROM vals v JOIN cuts c ON v.seg = c.seg
    ), mom AS (
      SELECT seg, COUNT(*) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) AS s2,
             CAST(SUM(w) AS DOUBLE) AS w1,
             CAST(SUM(CAST(FLOOR((CAST(w AS DOUBLE) * CAST(w AS DOUBLE)) * 1e4 + 0.5) / 1e4
                           AS DECIMAL(38,4))) AS DOUBLE) AS w2
      FROM clamped GROUP BY seg
    )
    SELECT seg AS c_mktsegment,
           CAST(n AS BIGINT) AS n_orders,
           ((s2 / n - POWER(s1 / n, 2)) / 10000) AS raw_variance,
           ((w2 / n - POWER(w1 / n, 2)) / 10000)
             AS winsorized_variance,
           ((w2 / n - POWER(w1 / n, 2))
                 / (s2 / n - POWER(s1 / n, 2))) AS variance_ratio,
           ((s1 / n - w1 / n) / (s1 / n)) AS mean_shift_frac
    FROM mom ORDER BY seg
    """,
    desc="Winsorization variance gain per segment: clamp order value "
         "at the exact discrete p99 cut and compare variance to raw "
         "— the variance_ratio is the noise a single tail clamp "
         "removes from any mean-based estimate (the estimator-"
         "engineering companion to q_cuped_adjustment: CUPED buys "
         "variance with a covariate, winsorizing buys it with "
         "robustness bias, and mean_shift_frac PRICES that bias), "
         "quantifying what q_winsorize applies and q_hill_tail's "
         "tail index predicts. The p99 cut is the exact "
         "continuous percentile of integer cents (engine-identical "
         "interpolation, the q_winsorize pattern); clamped values "
         "and their squares quantize the 1e-4 grid ->DECIMAL before "
         "every sum; ratios are single closed forms.",
    tags=["stats", "join", "agg"],
)
def q_winsor_variance_gain(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        col("o_custkey") == col("c_custkey"),
    ).select(
        col("c_mktsegment").alias("seg"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
    )
    cuts = vals.groupBy(col("seg").alias("seg_c")).agg(
        F.expr("percentile(cast(cents as double), 0.99)").alias("p99")
    )
    clamped = vals.join(broadcast(cuts), col("seg") == col("seg_c")).select(
        "seg", "cents",
        (dfloor((F.least(col("cents").cast("double"), col("p99"))) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4))
        .cast("decimal(38,4)").alias("w"),
    )
    cd = col("cents").cast("decimal(38,0)")
    wdd = col("w").cast("double")
    mom = clamped.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(cd).cast("double").alias("s1"),
        F.sum(cd * col("cents")).cast("double").alias("s2"),
        F.sum("w").cast("double").alias("w1"),
        F.sum((dfloor((wdd * wdd) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).cast("decimal(38,4)")).cast("double")
        .alias("w2"),
    )
    nd = col("n").cast("double")
    raw_v = col("s2") / nd - F.pow(col("s1") / nd, 2)
    win_v = col("w2") / nd - F.pow(col("w1") / nd, 2)
    return mom.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("n_orders"),
        (raw_v / 10000).alias("raw_variance"),
        (win_v / 10000).alias("winsorized_variance"),
        # try_divide: a constant segment has zero raw variance and a
        # zero-mean one no shift denominator -> NULL, matching the
        # oracle's x/0 = NULL
        (F.try_divide(win_v, raw_v)).alias("variance_ratio"),
        (F.try_divide(col("s1") / nd - col("w1") / nd, col("s1") / nd)).alias("mean_shift_frac"),
    ).orderBy("c_mktsegment")
