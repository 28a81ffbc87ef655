"""Forty-fourth-wave query inventory: temporal-profile closure — the
multiplicative day-of-week SEASONAL INDEX of revenue (the
normalization every ops dashboard applies before comparing a Monday
to a Saturday, and the seasonal factor q_forecast_revenue's trend
line needs to be deseasonalized by) and the BURSTINESS coefficient of
inter-event gaps (B = (sigma - mu)/(sigma + mu): -1 = metronome, 0 =
Poisson, ->1 = bursty — the temporal-shape scalar that tells a
capacity planner whether mean arrival rate is a usable number).

Determinism discipline: revenue is exact integer cents; day-of-week
uses weekday()/isodow (Monday-anchored on BOTH engines — Spark
dayofweek() is Sunday=1 while DuckDB dayofweek() is Sunday=0, a
cross-engine trap this wave sidesteps by construction); gaps are
exact integer microseconds; moment sums are DECIMAL(38,0); each
final statistic is one closed-form double, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_seasonal_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             isodow(CAST(o_orderdate AS DATE)) AS dow,
             SUM(CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ), per_dow AS (
      SELECT dow, COUNT(*) AS n_days, SUM(cents) AS cents
      FROM daily GROUP BY dow
    ), tot AS (
      SELECT SUM(n_days) AS all_days, SUM(cents) AS all_cents FROM per_dow
    )
    SELECT dow, CAST(n_days AS BIGINT) AS n_days,
           CAST(cents AS BIGINT) AS total_cents,
           ((CAST(cents AS DOUBLE) / n_days)
                 / (CAST(all_cents AS DOUBLE) / all_days))
             AS seasonal_index
    FROM per_dow, tot ORDER BY dow
    """,
    desc="Multiplicative day-of-week seasonal index of order revenue: "
         "average daily revenue on each weekday divided by the "
         "all-days average (index 1.10 = Mondays run 10% hot) — the "
         "deseasonalization factor applied before any day-over-day "
         "comparison or trend fit (q_forecast_revenue). Weekday is "
         "Monday-anchored on BOTH engines (Spark weekday()+1 = "
         "DuckDB isodow) — dayofweek() anchors differ Sunday=1 vs "
         "Sunday=0 across engines, the classic silent off-by-one. "
         "Exact integer cents; two combinable aggs + a 1-row total "
         "broadcast (tagged cross); scan speed at any scale.",
    tags=["stats", "agg", "cross"],
)
def q_seasonal_index(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            col("o_orderdate").cast("date").alias("day"),
            (F.weekday(col("o_orderdate").cast("date")) + 1).alias("dow"),
        )
        .agg(
            F.sum(dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    per_dow = daily.groupBy("dow").agg(
        F.count("*").alias("n_days"), F.sum("cents").alias("cents")
    )
    tot = per_dow.agg(
        F.sum("n_days").alias("all_days"), F.sum("cents").alias("all_cents")
    )
    return (
        per_dow.crossJoin(broadcast(tot))
        .select(
            "dow",
            col("n_days").cast("long").alias("n_days"),
            col("cents").cast("long").alias("total_cents"),
            ((col("cents").cast("double") / col("n_days"))
                / (col("all_cents").cast("double") / col("all_days"))).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@q(
    "q_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id)) AS gap_us
      FROM events
    ), mom AS (
      SELECT event_type, COUNT(gap_us) AS n,
             CAST(SUM(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(gap_us AS DECIMAL(38,0)) * gap_us) AS DOUBLE)
               AS s2
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           (s1 / n / 1e6) AS mean_gap_s,
           (SQRT(s2 / n - POWER(s1 / n, 2)) / 1e6) AS stddev_gap_s,
           ((SQRT(s2 / n - POWER(s1 / n, 2)) - s1 / n)
                 / (SQRT(s2 / n - POWER(s1 / n, 2)) + s1 / n))
             AS burstiness
    FROM mom ORDER BY event_type
    """,
    desc="Burstiness coefficient B = (sigma - mu)/(sigma + mu) of "
         "per-user inter-arrival gaps for each event type: B ~ -1 is "
         "a metronome, 0 is Poisson, positive is bursty — the "
         "temporal-shape scalar that says whether the mean arrival "
         "rate is a usable capacity number or a lie (Goh & Barabasi's "
         "measure). Gaps are exact integer MICROSECONDS from one lag "
         "window per (user, type); the two moment sums accumulate as "
         "DECIMAL(38,0) (order-free, combinable; us^2 of a day-long "
         "gap is ~1e21, 17 orders of headroom); B is one closed-form "
         "double per type, rounded 6.",
    tags=["events", "stats", "window", "agg"],
)
def q_burstiness(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros(col("ts")) - F.unix_micros(F.lag("ts").over(w)))
        .alias("gap_us"),
    ).filter(col("gap_us").isNotNull())
    d38 = "decimal(38,0)"
    mom = gaps.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(col("gap_us").cast(d38)).cast("double").alias("s1"),
        F.sum(col("gap_us").cast(d38) * col("gap_us")).cast("double")
        .alias("s2"),
    )
    mu = col("s1") / col("n")
    sigma = F.sqrt(col("s2") / col("n") - mu * mu)
    return mom.select(
        "event_type",
        col("n").cast("long").alias("n_gaps"),
        (mu / 1e6).alias("mean_gap_s"),
        (sigma / 1e6).alias("stddev_gap_s"),
        ((sigma - mu) / (sigma + mu)).alias("burstiness"),
    ).orderBy("event_type")
