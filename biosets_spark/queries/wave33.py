"""Thirty-third-wave query inventory: time-series statistics closure —
lag-k autocorrelation of the daily series (the seasonality detector
behind every forecasting pipeline) and the Theil-Sen estimator (the
median-of-pairwise-slopes robust trend that one outlier day cannot
move).

Determinism discipline (queries.py header): daily means are exact
6-dec decimal ratios (the q_cusum_changepoint prelude); ACF moments
accumulate as decimal sums of exact products; Theil-Sen slopes are
single double divisions of exact 6-dec numerators by integer day
gaps, with the median taken over the exact slope multiset.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_DAILY_SQL = """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)) * 1e6 + 0.5) / 1e6 AS m
        FROM events GROUP BY event_type, CAST(ts AS DATE)
      )
"""


@q(
    "q_autocorrelation",
    oracle=_DAILY_SQL + """
    , lagged AS (
      SELECT event_type, m,
             LAG(m, 1) OVER (PARTITION BY event_type ORDER BY day) AS m1,
             LAG(m, 7) OVER (PARTITION BY event_type ORDER BY day) AS m7
      FROM daily
    ), mom AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(m AS DECIMAL(18,6)) * CAST(m AS DECIMAL(18,6)))
                  AS DOUBLE) AS ss,
             COUNT(m1) AS n1,
             CAST(SUM(CAST(m AS DECIMAL(18,6)) * CAST(m1 AS DECIMAL(18,6)))
                  AS DOUBLE) AS s1,
             COUNT(m7) AS n7,
             CAST(SUM(CAST(m AS DECIMAL(18,6)) * CAST(m7 AS DECIMAL(18,6)))
                  AS DOUBLE) AS s7
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ((s1 / n1 - (s / n) * (s / n)) / (ss / n - (s / n) * (s / n)))
             AS acf_1,
           ((s7 / n7 - (s / n) * (s / n)) / (ss / n - (s / n) * (s / n)))
             AS acf_7
    FROM mom ORDER BY event_type
    """,
    desc="Lag-1 and lag-7 autocorrelation of each event type's daily "
         "mean series — the seasonality/persistence detector a "
         "forecasting pipeline checks before choosing model structure "
         "(acf_7 spikes on weekly cycles). Computed from decimal-"
         "exact moments: daily means are exact 6-dec ratios, lagged "
         "pair products accumulate as DECIMAL sums, and each ACF is "
         "one closed-form double expression per type (no FP "
         "accumulation anywhere). The lag windows partition per type "
         "over the tiny daily table; the event stream collapses in "
         "one combinable agg.",
    tags=["events", "window", "agg"],
)
def q_autocorrelation(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)")).cast("double")
                / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        col("m").cast("decimal(18,6)").alias("md"),
        F.lag("m", 1).over(w).cast("decimal(18,6)").alias("m1"),
        F.lag("m", 7).over(w).cast("decimal(18,6)").alias("m7"),
    )
    mom = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("md").cast("double").alias("s"),
        F.sum(col("md") * col("md")).cast("double").alias("ss"),
        F.count("m1").alias("n1"),
        F.sum(col("md") * col("m1")).cast("double").alias("s1"),
        F.count("m7").alias("n7"),
        F.sum(col("md") * col("m7")).cast("double").alias("s7"),
    )
    mean = col("s") / col("n")
    var = col("ss") / col("n") - mean * mean
    return mom.select(
        "event_type",
        col("n").cast("long").alias("n_days"),
        ((col("s1") / col("n1") - mean * mean) / var).alias("acf_1"),
        ((col("s7") / col("n7") - mean * mean) / var).alias("acf_7"),
    ).orderBy("event_type")


@q(
    "q_theil_sen",
    oracle=_DAILY_SQL + """
    , pairs AS (
      SELECT a.event_type,
             FLOOR((b.m - a.m) * 1e6 + 0.5) / 1e6 / date_diff('day', a.day, b.day) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day > a.day
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (quantile_cont(slope, 0.5)) AS trend_per_day
    FROM pairs GROUP BY event_type ORDER BY event_type
    """,
    desc="Theil-Sen robust trend per event type: the MEDIAN of all "
         "pairwise day-over-day slopes of the daily mean series — the "
         "trend estimator a single outlier day cannot move (up to "
         "~29% contamination), the robust companion to "
         "q_forecast_revenue's least-squares line. The pair join is "
         "per-type over the tiny daily table (C(30,2) pairs per "
         "type); each slope is ONE double division of an exact 6-dec "
         "difference by an integer day gap, and the median "
         "interpolates over that exact multiset. At longer horizons "
         "the classical refinement is repeated median or a "
         "windowed-pair subsample — same plan, bounded fan-out.",
    tags=["events", "range", "agg", "percentile"],
)
def q_theil_sen(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)")).cast("double")
                / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    a = daily.select(col("event_type").alias("et"), col("day").alias("d1"), col("m").alias("m1"))
    b = daily.select(col("event_type").alias("et2"), col("day").alias("d2"), col("m").alias("m2"))
    pairs = a.join(
        broadcast(b), (col("et") == col("et2")) & (col("d2") > col("d1"))
    ).select(
        col("et").alias("event_type"),
        ((dfloor((col("m2") - col("m1")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)) / F.datediff(col("d2"), col("d1"))).alias("slope"),
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.expr("percentile(slope, 0.5)")).alias("trend_per_day"),
        )
        .orderBy("event_type")
    )
