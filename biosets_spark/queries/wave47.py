"""Forty-seventh-wave query inventory: revenue-curve analytics — the
cohort LTV (lifetime value) curve (cumulative revenue per customer by
cohort age: the payback-period table growth teams read,
q_cohort_retention's revenue-side twin) and a seasonal-naive FORECAST
BACKTEST (score last week's value as this week's forecast and report
MAPE/SMAPE per event type — the baseline scorecard every forecasting
model must beat, and the acceptance gate for q_forecast_revenue's
fitted trend).

Determinism discipline: revenue is exact integer cents; cohort-age
cumulative sums run over the tiny (cohort x age) table partitioned by
cohort; per-point percentage errors quantize the 1e-8 grid ->DECIMAL
before averaging (exact ratios of integer counts thereafter).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import dfloor, q


@q(
    "q_cohort_ltv",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ), cohort_size AS (
      SELECT cohort, COUNT(*) AS n_customers FROM first_order GROUP BY cohort
    ), monthly AS (
      SELECT f.cohort,
             date_diff('month', f.cohort,
                       date_trunc('month', o.o_orderdate)) AS age,
             SUM(CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ), curve AS (
      SELECT m.cohort, m.age, s.n_customers,
             SUM(m.cents) OVER (PARTITION BY m.cohort ORDER BY m.age
                                ROWS UNBOUNDED PRECEDING) AS cum_cents
      FROM monthly m JOIN cohort_size s ON m.cohort = s.cohort
    )
    SELECT CAST(cohort AS DATE) AS cohort, CAST(age AS BIGINT) AS age_months,
           CAST(n_customers AS BIGINT) AS n_customers,
           (CAST(cum_cents AS DOUBLE) / n_customers / 100)
             AS ltv_per_customer
    FROM curve
    WHERE age <= 6
    ORDER BY cohort, age_months
    """,
    desc="Cohort LTV curve: customers grouped by first-order month, "
         "cumulative revenue per customer tracked across the first "
         "6 months of cohort age — the payback-period table (read "
         "along a row: when does LTV cross acquisition cost; down a "
         "column: are newer cohorts monetizing faster), "
         "q_cohort_retention's revenue-side twin. The orders stream "
         "collapses in one (cohort x age) combinable agg after a "
         "first-order min-join (shuffle on custkey, the natural "
         "key); the cumulative window runs per cohort over the tiny "
         "curve table. Exact integer cents to the final "
         "per-customer division.",
    tags=["window", "join", "agg"],
)
def q_cohort_ltv(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", col("o_orderdate"))).alias("cohort")
    )
    size = first.groupBy("cohort").agg(F.count("*").alias("n_customers"))
    monthly = (
        orders.join(first, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.date_trunc("month", col("o_orderdate")), col("cohort")
            ).cast("long").alias("age"),
        )
        .agg(
            F.sum(dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    w = (
        Window.partitionBy("cohort").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = monthly.join(size, "cohort").select(
        "cohort", "age", "n_customers",
        F.sum("cents").over(w).alias("cum_cents"),
    )
    return (
        curve.filter(col("age") <= 6)
        .select(
            col("cohort").cast("date").alias("cohort"),
            col("age").cast("long").alias("age_months"),
            col("n_customers").cast("long").alias("n_customers"),
            (col("cum_cents").cast("double") / col("n_customers") / 100).alias("ltv_per_customer"),
        )
        .orderBy("cohort", "age_months")
    )


@q(
    "q_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR((value * 100) + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, cents,
             LAG(cents, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS fc
      FROM daily
    ), err AS (
      SELECT event_type, cents, fc,
             CAST(FLOOR((ABS(CAST(cents - fc AS DOUBLE)) / cents) * 1e8 + 0.5) / 1e8
                  AS DECIMAL(28,8)) AS ape,
             CAST(FLOOR((2 * ABS(CAST(cents - fc AS DOUBLE))
                        / (cents + fc)) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS sape
      FROM scored WHERE fc IS NOT NULL AND cents > 0
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
           (CAST(SUM(ape) AS DOUBLE) / COUNT(*)) AS mape,
           (CAST(SUM(sape) AS DOUBLE) / COUNT(*)) AS smape
    FROM err GROUP BY event_type ORDER BY event_type
    """,
    desc="Seasonal-naive forecast backtest: forecast each day's value "
         "total as the SAME WEEKDAY LAST WEEK (lag-7) and score "
         "MAPE/SMAPE per event type — the baseline scorecard every "
         "forecasting model must beat before shipping (if a fitted "
         "model can't beat lag-7, q_forecast_revenue's trend is "
         "decoration), and with q_autocorrelation's acf_7 the "
         "complete seasonality panel. Daily totals are exact integer "
         "cents; each absolute-percentage error is one closed-form "
         "double quantized the 1e-8 grid ->DECIMAL before the order-free "
         "mean; the lag window partitions per type over the tiny "
         "daily table.",
    tags=["events", "stats", "window", "agg"],
)
def q_forecast_backtest(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            F.sum(dfloor((col("value") * 100) + F.lit(0.5)).cast("long")).alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type", "cents", F.lag("cents", 7).over(w).alias("fc")
    ).filter(col("fc").isNotNull() & (col("cents") > 0))
    err = scored.select(
        "event_type",
        (dfloor((F.abs((col("cents") - col("fc")).cast("double")) / col("cents")) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)").alias("ape"),
        (dfloor((2 * F.abs((col("cents") - col("fc")).cast("double"))
            / (col("cents") + col("fc"))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)").alias("sape"),
    )
    return (
        err.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            (F.sum("ape").cast("double") / F.count("*"))
            .alias("mape"),
            (F.sum("sape").cast("double") / F.count("*"))
            .alias("smape"),
        )
        .orderBy("event_type")
    )
