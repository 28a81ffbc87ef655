"""Fifty-ninth-wave query inventory: process monitoring — the
SHEWHART CONTROL CHART (3-sigma limits on the daily-mean series with
out-of-control day counts: the SPC primitive behind every
metric-health monitor, turning q_events_anomaly's per-event z-gate
into the day-level chart operators actually watch) and SEASONAL
STRENGTH (the variance-decomposition scalar Fs = 1 - var(remainder)/
var(deseasonalized-candidate) that says how much of the series
weekly structure explains — the model-selection number between
q_autocorrelation's acf_7 detection and q_forecast_backtest's lag-7
baseline).

Determinism discipline: daily means are exact 6-dec decimal ratios
(the shared q_cusum prelude); chart limits are closed-form doubles
from decimal moment sums; remainder/seasonal variance terms quantize
the 1e-10 grid ->DECIMAL before their cross-day sums; every flag compares
identical doubles on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_DAILY_SQL = """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                          AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS m
        FROM events GROUP BY event_type, CAST(ts AS DATE)
      )
"""


@q(
    "q_control_chart",
    oracle=_DAILY_SQL + """
    , lim AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS center,
             SQRT(GREATEST(
                  CAST(SUM(CAST(m AS DECIMAL(18,6))
                           * CAST(m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                  - POWER(CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE)
                          / COUNT(*), 2), 0)) AS sigma
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(l.n AS BIGINT) AS n_days,
           (l.center) AS center_line,
           (l.center - 3 * l.sigma) AS lcl,
           (l.center + 3 * l.sigma) AS ucl,
           CAST(COUNT(*) FILTER (WHERE d.m > l.center + 3 * l.sigma
                                 OR d.m < l.center - 3 * l.sigma) AS BIGINT)
             AS n_beyond_3sigma,
           CAST(COUNT(*) FILTER (WHERE d.m > l.center + 2 * l.sigma
                                 OR d.m < l.center - 2 * l.sigma) AS BIGINT)
             AS n_beyond_2sigma
    FROM daily d JOIN lim l ON d.event_type = l.event_type
    GROUP BY d.event_type, l.n, l.center, l.sigma
    ORDER BY d.event_type
    """,
    desc="Shewhart control chart over each event type's daily-mean "
         "series: the center line, 3-sigma control limits, and the "
         "count of days beyond 3-sigma (rule-1 out-of-control "
         "signals) plus the 2-sigma warning count — the SPC "
         "primitive every metric-health monitor reduces to, "
         "day-level where q_events_anomaly gates per event. Daily "
         "means are exact 6-dec decimal ratios; limits come from "
         "decimal moment sums (one closed form per type); each "
         "day's flag compares identical doubles, so both engines "
         "count the same violations. Two passes over the tiny "
         "daily table (limits, then flags) — the event stream "
         "collapses once.",
    tags=["events", "stats", "agg"],
)
def q_control_chart(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    md = col("m").cast("decimal(18,6)")
    lim = daily.groupBy(col("event_type").alias("et")).agg(
        F.count("*").alias("n"),
        (F.sum(md).cast("double") / F.count("*")).alias("center"),
        # GREATEST(var, 0) on BOTH engines before the sqrt: a 1-day
        # (or constant) type's population variance cancels to an
        # epsilon-negative double, where Spark yields NaN but DuckDB
        # raises — the clamp makes the degenerate sigma an exact 0.0
        # in both
        F.sqrt(F.greatest(
            F.sum(md * md).cast("double") / F.count("*")
            - F.pow(F.sum(md).cast("double") / F.count("*"), 2),
            F.lit(0.0),
        )).alias("sigma"),
    )
    joined = daily.join(broadcast(lim), col("event_type") == col("et"))
    hi3 = col("center") + 3 * col("sigma")
    lo3 = col("center") - 3 * col("sigma")
    hi2 = col("center") + 2 * col("sigma")
    lo2 = col("center") - 2 * col("sigma")
    return (
        joined.groupBy("event_type", "n", "center", "sigma")
        .agg(
            F.count(F.when((col("m") > hi3) | (col("m") < lo3), 1))
            .alias("n3"),
            F.count(F.when((col("m") > hi2) | (col("m") < lo2), 1))
            .alias("n2"),
        )
        .select(
            "event_type",
            col("n").cast("long").alias("n_days"),
            (col("center")).alias("center_line"),
            (col("center") - 3 * col("sigma")).alias("lcl"),
            (col("center") + 3 * col("sigma")).alias("ucl"),
            col("n3").cast("long").alias("n_beyond_3sigma"),
            col("n2").cast("long").alias("n_beyond_2sigma"),
        )
        .orderBy("event_type")
    )


@q(
    "q_seasonal_strength",
    oracle=_DAILY_SQL + """
    , dowm AS (
      SELECT event_type, isodow(day) AS dow,
             CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS sm
      FROM daily GROUP BY event_type, isodow(day)
    ), grand AS (
      SELECT event_type,
             CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS gm
      FROM daily GROUP BY event_type
    ), terms AS (
      SELECT d.event_type,
             CAST(FLOOR((POWER(d.m - g.gm, 2)) * 1e10 + 0.5) / 1e10 AS DECIMAL(38,10)) AS tot,
             CAST(FLOOR((POWER(d.m - s.sm, 2)) * 1e10 + 0.5) / 1e10 AS DECIMAL(38,10)) AS rem
      FROM daily d
      JOIN grand g ON d.event_type = g.event_type
      JOIN dowm s ON d.event_type = s.event_type AND isodow(d.day) = s.dow
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           (GREATEST(1 - CAST(SUM(rem) AS DOUBLE)
                          / CAST(SUM(tot) AS DOUBLE), 0))
             AS seasonal_strength
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    desc="Seasonal strength of each event type's daily series: Fs = "
         "max(0, 1 - var(residual after removing weekday means) / "
         "var(total)) — the variance-decomposition scalar (Hyndman's "
         "measure with a weekday seasonal component) that quantifies "
         "what q_autocorrelation's acf_7 only detects: Fs ~ 0 means "
         "lag-7 forecasting (q_forecast_backtest) buys nothing, "
         "Fs -> 1 means the weekday profile IS the series. Weekday "
         "means and the grand mean come from exact decimal ratios; "
         "each day's squared deviation is one closed-form double "
         "quantized the 1e-10 grid ->DECIMAL before the only cross-day "
         "sums (the q_anova_oneway discipline — this is its "
         "eta-squared, framed for time series). isodow keeps the "
         "weekday anchor identical on both engines.",
    tags=["events", "stats", "join", "agg"],
)
def q_seasonal_strength(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
        .withColumn("dow", F.weekday(col("day")) + 1)
    )
    md = col("m").cast("decimal(18,6)")
    dowm = daily.groupBy(col("event_type").alias("et1"), col("dow").alias("d1")).agg(
        (F.sum(md).cast("double") / F.count("*")).alias("sm")
    )
    grand = daily.groupBy(col("event_type").alias("et2")).agg(
        (F.sum(md).cast("double") / F.count("*")).alias("gm")
    )
    terms = (
        daily.join(broadcast(grand), col("event_type") == col("et2"))
        .join(
            broadcast(dowm),
            (col("event_type") == col("et1")) & (col("dow") == col("d1")),
        )
        .select(
            "event_type",
            (dfloor((F.pow(col("m") - col("gm"), 2)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
            .cast("decimal(38,10)").alias("tot"),
            (dfloor((F.pow(col("m") - col("sm"), 2)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
            .cast("decimal(38,10)").alias("rem"),
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            # try_divide: a constant series has zero total variance;
            # the NULL ratio then clamps to 0.0 via greatest, which
            # skips NULLs identically in both engines
            (F.greatest(
                    1 - F.try_divide(F.sum("rem").cast("double"),
                                     F.sum("tot").cast("double")),
                    F.lit(0.0),
                )).alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )
