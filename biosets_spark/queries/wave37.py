"""Thirty-seventh-wave query inventory: distribution-shape
diagnostics — per-group skewness and excess kurtosis from exact
integer-cent moments (the tail-risk panel a feature store publishes
next to mean/stddev), and a 7-observation centered rolling median of
daily revenue per order priority (the robust smoother that one
blowout day cannot drag, companion to q_ewma_daily's mean smoother).

Skewness/kurtosis deliberately do NOT use the engines' built-in
skewness()/kurtosis() aggregates: their bias corrections differ
(sample vs population) and their float accumulation is
order-dependent. Instead values quantize to exact integer cents and
the four raw power sums accumulate as DECIMAL(38,0) — exact at any
row count and any partition order — with the central-moment formulas
applied once, in doubles, at the end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import dfloor, q


@q(
    "q_skew_kurtosis",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(FLOOR((value * 100) + 0.5) AS BIGINT) AS c
      FROM events
    ), mom AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DOUBLE) AS s2,
             CAST(SUM(CAST(c AS DECIMAL(38,0)) * c * c) AS DOUBLE) AS s3,
             CAST(SUM(CAST(c AS DECIMAL(38,0)) * c * c * c) AS DOUBLE) AS s4
      FROM cents GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           (s1 / n / 100) AS mean_value,
           (SQRT(s2 / n - POWER(s1 / n, 2)) / 100) AS stddev_pop,
           ((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * POWER(s1 / n, 3))
                 / POWER(s2 / n - POWER(s1 / n, 2), 1.5)) AS skewness,
           ((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * POWER(s1 / n, 2) * (s2 / n) - 3 * POWER(s1 / n, 4))
                 / POWER(s2 / n - POWER(s1 / n, 2), 2) - 3)
             AS excess_kurtosis
    FROM mom ORDER BY event_type
    """,
    desc="Population skewness and excess kurtosis of event values per "
         "type — the tail-shape panel that flags a metric whose mean "
         "looks fine while its distribution grows a heavy tail. "
         "Built-in skewness()/kurtosis() aggregates are avoided on "
         "purpose: engines disagree on bias correction and their "
         "float accumulators are partition-order-dependent. Here "
         "values quantize to exact integer cents; the four raw power "
         "sums accumulate as DECIMAL(38,0) (exact, order-free, "
         "combinable — one map-side-combined shuffle per type); the "
         "central-moment formulas run once per group in doubles, "
         "rounded 6. c^4 of a 1e6-cent value is 1e24, leaving 14 "
         "orders of headroom for 100 TB row counts.",
    tags=["stats", "events", "agg"],
)
def q_skew_kurtosis(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cents = ev.select(
        "event_type", dfloor((col("value") * 100) + F.lit(0.5)).cast("long").alias("c")
    )
    mom = cents.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(col("c").cast(d38)).cast("double").alias("s1"),
        F.sum(col("c").cast(d38) * col("c")).cast("double").alias("s2"),
        F.sum(col("c").cast(d38) * col("c") * col("c")).cast("double").alias("s3"),
        F.sum(col("c").cast(d38) * col("c") * col("c") * col("c"))
        .cast("double").alias("s4"),
    )
    nd = col("n").cast("double")
    m1 = col("s1") / nd
    r2 = col("s2") / nd
    r3 = col("s3") / nd
    r4 = col("s4") / nd
    var = r2 - m1 * m1
    m3 = r3 - 3 * m1 * r2 + 2 * F.pow(m1, 3)
    m4 = r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * F.pow(m1, 4)
    return mom.select(
        "event_type",
        col("n").cast("long").alias("n_events"),
        (m1 / 100).alias("mean_value"),
        (F.sqrt(var) / 100).alias("stddev_pop"),
        # try_divide: a single-row or constant-valued group has zero
        # variance; the moment ratios are then NULL (matching the
        # oracle, where x/0 is NULL) instead of an ANSI crash
        (F.try_divide(m3, F.pow(var, 1.5))).alias("skewness"),
        (F.try_divide(m4, var * var) - 3).alias("excess_kurtosis"),
    ).orderBy("event_type")


@q(
    "q_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT pri AS o_orderpriority, day,
           CAST(rev_cents AS BIGINT) AS revenue_cents,
           (quantile_cont(CAST(rev_cents AS DOUBLE), 0.5) OVER (
               PARTITION BY pri ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
             AS rolling_median_cents
    FROM daily ORDER BY pri, day
    """,
    desc="7-observation centered rolling median of daily revenue per "
         "order priority — the robust trend smoother a single blowout "
         "day cannot drag (q_ewma_daily's mean smoother moves on any "
         "outlier; the median needs four). ROWS-frame semantics: the "
         "window is the 7 nearest observed days, deterministic on "
         "both engines because the order key (priority, day) is "
         "unique post-aggregation. The order stream collapses in one "
         "combinable decimal agg; the percentile window partitions by "
         "priority over the tiny daily table. The median runs over "
         "EXACT INTEGER CENTS so interpolated midpoints land on the "
         "half-cent grid (exactly representable doubles) — no "
         "engine-dependent rounding of a .005 tie can flip the last "
         "digit, the failure q_rolling_median's first draft hit at "
         "sf0.01.",
    tags=["window", "agg", "percentile"],
)
def q_rolling_median(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            col("o_orderpriority").alias("pri"),
            col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("rev_cents")
        )
    )
    w = Window.partitionBy("pri").orderBy("day").rowsBetween(-3, 3)
    return daily.select(
        col("pri").alias("o_orderpriority"),
        "day",
        col("rev_cents").cast("long").alias("revenue_cents"),
        (F.expr("percentile(cast(rev_cents as double), 0.5)").over(w)).alias("rolling_median_cents"),
    ).orderBy("o_orderpriority", "day")
