"""Fifty-first-wave query inventory: engagement-decay and capacity
closure — the RETENTION HALF-LIFE (fit an exponential to the
day-offset retention curve and report ln2/lambda: the one scalar that
compresses q_events_retention's whole matrix into 'how many days
until half the cohort is gone', trackable release-over-release) and
PEAK CONCURRENCY per (event type, day) (sweep-line maximum of
simultaneously-open 5-minute activity windows: the capacity number a
rate mean cannot give when arrivals are bursty — q_burstiness says
whether to worry, this says how much).

Determinism discipline: retention rates are exact integer-count
ratios; each log-rate OLS term quantizes the 1e-12 grid ->DECIMAL; the
sweep line is integer +1/-1 endpoint arithmetic over microsecond
timestamps with a fully tie-broken sort, so the running maximum is
identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_retention_half_life",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
    ), act AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.d0, CAST(e.ts AS DATE)) AS off
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    ), curve AS (
      SELECT off, COUNT(*) AS active,
             (SELECT COUNT(*) FROM first_seen) AS cohort
      FROM act WHERE off BETWEEN 1 AND 14 GROUP BY off
    ), pts AS (
      SELECT off, active, cohort,
             CAST(FLOOR((LN(CAST(active AS DOUBLE) / cohort)) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(38,12)) AS ly,
             CAST(FLOOR((off * LN(CAST(active AS DOUBLE) / cohort)) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(38,12)) AS xy
      FROM curve WHERE active > 0
    ), fit AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(off AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(ly) AS DOUBLE) AS sy,
             CAST(SUM(CAST(off AS DECIMAL(38,0)) * off) AS DOUBLE) AS sxx,
             CAST(SUM(xy) AS DOUBLE) AS sxy
      FROM pts
    )
    SELECT p.off AS day_offset, CAST(p.active AS BIGINT) AS n_active,
           (CAST(p.active AS DOUBLE) / p.cohort) AS retention,
           (-LN(2) / ((f.n * f.sxy - f.sx * f.sy)
                           / (f.n * f.sxx - f.sx * f.sx)))
             AS half_life_days
    FROM pts p, fit f ORDER BY p.off
    """,
    desc="Retention half-life: the day-1..14 retention curve (share "
         "of the full cohort active on each day offset) and the "
         "exponential fit's ln2/lambda — the single 'days until half "
         "the cohort is gone' scalar that makes q_events_retention's "
         "matrix comparable release-over-release (a falling "
         "half-life is THE early churn alarm). Retention rates are "
         "exact integer-count ratios; each log-rate OLS term "
         "quantizes the 1e-12 grid ->DECIMAL before the 14-point fit; "
         "the slope's sign makes half-life positive for decaying "
         "curves. One distinct-activity shuffle on user_id, then "
         "everything runs over a 14-row curve (1-row fit broadcast, "
         "tagged cross).",
    tags=["events", "stats", "agg", "cross"],
)
def q_retention_half_life(spark, sf_dir):
    from pyspark.sql.functions import broadcast

    e = tables.load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(col("ts").cast("date")).alias("d0")
    )
    cohort = first_seen.agg(F.count("*").alias("cohort"))
    act = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            F.datediff(col("ts").cast("date"), col("d0")).alias("off"),
        )
        .distinct()
    )
    curve = (
        act.filter(col("off").between(1, 14))
        .groupBy("off")
        .agg(F.count("*").alias("active"))
        .crossJoin(broadcast(cohort))
    )
    lyd = F.log(col("active").cast("double") / col("cohort"))
    pts = curve.filter(col("active") > 0).select(
        "off", "active", "cohort",
        (dfloor((lyd) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("ly"),
        (dfloor((col("off") * lyd) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("xy"),
    )
    d38 = "decimal(38,0)"
    fit = pts.agg(
        F.count("*").alias("n"),
        F.sum(col("off").cast(d38)).cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum(col("off").cast(d38) * col("off")).cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    n = col("n").cast("double")
    slope = (n * col("sxy") - col("sx") * col("sy")) / (
        n * col("sxx") - col("sx") * col("sx"))
    return (
        pts.crossJoin(broadcast(fit))
        .select(
            col("off").alias("day_offset"),
            col("active").cast("long").alias("n_active"),
            (col("active").cast("double") / col("cohort"))
            .alias("retention"),
            (-F.log(lit(2.0)) / slope).alias("half_life_days"),
        )
        .orderBy("day_offset")
    )


@q(
    "q_peak_concurrency",
    oracle="""
    WITH ends AS (
      SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS t,
             1 AS delta, event_id
      FROM events
      UNION ALL
      SELECT event_type, CAST(ts AS DATE) AS day,
             epoch_us(ts) + 300000000 AS t, -1 AS delta, event_id
      FROM events
    ), swept AS (
      SELECT event_type, day,
             SUM(delta) OVER (PARTITION BY event_type, day
                              ORDER BY t, delta, event_id
                              ROWS UNBOUNDED PRECEDING) AS open_now
      FROM ends
    )
    SELECT event_type, day,
           CAST(MAX(open_now) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    desc="Peak concurrency per (event type, day): sweep-line over "
         "+1/-1 endpoints of each event's 5-minute activity window — "
         "the MAX of simultaneously-open windows is the capacity "
         "number bursty arrival means cannot give (q_burstiness "
         "flags the burstiness; this prices it). The sort is fully "
         "tie-broken (time, delta, event_id — closes before opens at "
         "the same microsecond puts delta=-1 first, the "
         "back-to-back-not-concurrent convention), so the running "
         "sum is identical on both engines. Windows partition by "
         "(type, day): at 100 TB no task ever holds more than one "
         "day of one type, and day-boundary truncation is the "
         "documented semantic (a window open at midnight counts in "
         "its opening day).",
    tags=["events", "window", "agg"],
)
def q_peak_concurrency(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    opens = ev.select(
        "event_type", col("ts").cast("date").alias("day"),
        F.unix_micros("ts").alias("t"), lit(1).alias("delta"), "event_id",
    )
    closes = ev.select(
        "event_type", col("ts").cast("date").alias("day"),
        (F.unix_micros("ts") + 300_000_000).alias("t"),
        lit(-1).alias("delta"), "event_id",
    )
    ends = opens.unionByName(closes)
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = ends.select(
        "event_type", "day", F.sum("delta").over(w).alias("open_now")
    )
    return (
        swept.groupBy("event_type", "day")
        .agg(F.max("open_now").cast("long").alias("peak_concurrent"))
        .orderBy("event_type", "day")
    )
