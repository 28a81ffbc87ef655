"""Ninety-eighth-wave query inventory: volatility and price
dispersion — the SHARPE RATIO of daily revenue growth per segment
(mean over sd of day-over-day log returns, annualized by sqrt(365):
the risk-adjusted growth scalar that makes segments with different
volatilities comparable — raw growth rates (q_yoy_growth) reward
lucky volatility, Sharpe prices it; CAPM beta (q_capm_beta) splits
systemic from idiosyncratic, Sharpe summarizes what's left) and
SAME-PART PRICE DISPERSION (the coefficient of variation of unit
price within each part, top-15 dispersed parts: the law-of-one-
price audit — high within-part dispersion flags discriminatory or
erroneous pricing that q_price_index's between-year view and
q_round_price_bias's digit forensics both miss).

Determinism discipline: daily revenues are exact integer cents;
log returns quantize the 1e-8 grid ->DECIMAL(28,8) before per-segment
moment sums; unit prices are exact cents/quantity ratios quantized
before per-part sums; CV ordering breaks ties on partkey.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_sharpe_revenue",
    oracle="""
    WITH daily AS (
      SELECT c.c_mktsegment AS seg, o.o_orderdate AS day,
             SUM(CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), rets AS (
      SELECT seg,
             CAST(FLOOR((LN(CAST(cents AS DOUBLE)
                           / LAG(cents) OVER (PARTITION BY seg
                                              ORDER BY day))) * 1e8 + 0.5) / 1e8
                  AS DECIMAL(28,8)) AS r
      FROM daily
    ), mom AS (
      SELECT seg, COUNT(r) AS n,
             CAST(SUM(r) AS DOUBLE) AS s1,
             CAST(SUM(CAST(FLOOR((CAST(r AS DOUBLE) * CAST(r AS DOUBLE)) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(28,10))) AS DOUBLE) AS s2
      FROM rets WHERE r IS NOT NULL GROUP BY seg
    )
    SELECT seg AS c_mktsegment,
           CAST(n AS BIGINT) AS n_returns,
           (s1 / n) AS mean_log_return,
           (SQRT(s2 / n - POWER(s1 / n, 2))) AS volatility,
           ((s1 / n) / SQRT(s2 / n - POWER(s1 / n, 2))
                 * SQRT(365.0)) AS sharpe_annualized
    FROM mom ORDER BY seg
    """,
    desc="Sharpe ratio of each segment's daily revenue growth: "
         "day-over-day log returns of the daily cents total, their "
         "mean and population volatility, and the sqrt(365)-"
         "annualized mean/sd ratio — the risk-adjusted growth "
         "scalar that makes differently-volatile segments "
         "comparable (raw growth rewards lucky volatility; Sharpe "
         "divides it out — the summary companion to q_capm_beta's "
         "decomposition and q_max_drawdown's worst case). Daily "
         "revenues are exact integer cents; each log return "
         "quantizes the 1e-8 grid ->DECIMAL(28,8) and its square "
         "the 1e-10 grid ->DECIMAL before the per-segment sums; the "
         "lag window partitions by segment over the tiny daily "
         "table; Sharpe is one closed form.",
    tags=["stats", "window", "join", "agg"],
)
def q_sharpe_revenue(spark, sf_dir):
    from pyspark.sql import Window

    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    daily = (
        o.join(
            broadcast(c.select("c_custkey", "c_mktsegment")),
            col("o_custkey") == col("c_custkey"),
        )
        .groupBy(
            col("c_mktsegment").alias("seg"), col("o_orderdate").alias("day")
        )
        .agg(
            F.sum(dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    w = Window.partitionBy("seg").orderBy("day")
    r = (dfloor((F.log(col("cents").cast("double") / F.lag("cents").over(w))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    rets = daily.select("seg", r.alias("r")).filter(col("r").isNotNull())
    rd = col("r").cast("double")
    mom = rets.groupBy("seg").agg(
        F.count("r").alias("n"),
        F.sum("r").cast("double").alias("s1"),
        F.sum((dfloor((rd * rd) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")).cast("double")
        .alias("s2"),
    )
    nd = col("n").cast("double")
    mean = col("s1") / nd
    vol = F.sqrt(col("s2") / nd - F.pow(mean, 2))
    return mom.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("n_returns"),
        (mean).alias("mean_log_return"),
        (vol).alias("volatility"),
        (mean / vol * F.sqrt(F.lit(365.0)))
        .alias("sharpe_annualized"),
    ).orderBy("c_mktsegment")


@q(
    "q_price_dispersion",
    oracle="""
    WITH units AS (
      SELECT l_partkey,
             CAST(FLOOR((CAST(FLOOR((l_extendedprice * 100) + 0.5) AS BIGINT)
                        / l_quantity) * 1e4 + 0.5) / 1e4 AS DECIMAL(28,4)) AS up
      FROM lineitem WHERE l_quantity > 0
    ), mom AS (
      SELECT l_partkey, COUNT(*) AS n,
             CAST(SUM(up) AS DOUBLE) AS s1,
             CAST(SUM(CAST(FLOOR((CAST(up AS DOUBLE) * CAST(up AS DOUBLE)) * 1e4 + 0.5) / 1e4
                           AS DECIMAL(38,4))) AS DOUBLE) AS s2
      FROM units GROUP BY l_partkey HAVING COUNT(*) >= 5
    ), scored AS (
      SELECT l_partkey, n,
             SQRT(s2 / n - POWER(s1 / n, 2)) / (s1 / n) AS cv,
             s1 / n / 100 AS mean_unit_price
      FROM mom
    )
    SELECT l_partkey, CAST(n AS BIGINT) AS n_sales,
           (mean_unit_price) AS mean_unit_price,
           (cv) AS price_cv
    FROM scored ORDER BY cv DESC, l_partkey LIMIT 15
    """,
    desc="Same-part price dispersion: the coefficient of variation "
         "of unit price (extended cents / quantity, quantized to "
         "4 dp) within each part sold at least 5 times, top-15 most "
         "dispersed — the law-of-one-price audit: high within-part "
         "CV flags discriminatory, negotiated, or erroneous pricing "
         "that q_price_index's between-period basket and "
         "q_round_price_bias's digit forensics are both blind to "
         "(and a data-quality screen before any per-part elasticity "
         "model). Unit prices quantize the 1e-4 grid ->DECIMAL before "
         "per-part sums (order-free); CV is one closed form per "
         "part; ordering breaks ties on partkey; one combinable "
         "agg over the fact table.",
    tags=["stats", "agg"],
)
def q_price_dispersion(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    up = (dfloor((dfloor((col("l_extendedprice") * 100) + F.lit(0.5)).cast("long") / col("l_quantity")) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).cast("decimal(28,4)")
    units = li.filter(col("l_quantity") > 0).select(
        "l_partkey", up.alias("up")
    )
    ud = col("up").cast("double")
    mom = (
        units.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("up").cast("double").alias("s1"),
            F.sum((dfloor((ud * ud) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).cast("decimal(38,4)")).cast("double")
            .alias("s2"),
        )
        .filter(col("n") >= 5)
    )
    nd = col("n").cast("double")
    mean = col("s1") / nd
    cv = F.sqrt(col("s2") / nd - F.pow(mean, 2)) / mean
    return (
        mom.select(
            "l_partkey",
            col("n").cast("long").alias("n_sales"),
            (mean / 100).alias("mean_unit_price"),
            (cv).alias("price_cv"),
            cv.alias("_cv"),
        )
        .orderBy(col("_cv").desc(), "l_partkey")
        .limit(15)
        .drop("_cv")
    )
