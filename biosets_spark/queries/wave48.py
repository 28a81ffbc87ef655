"""Forty-eighth-wave query inventory: supply-chain segmentation and
count-process diagnostics — the ABC/XYZ matrix (parts classified by
revenue importance x demand variability: the 9-cell segmentation that
decides which SKUs get safety stock, which get forecasting effort,
and which get dropped) and the INDEX OF DISPERSION (Fano factor,
variance-to-mean of daily event counts: the overdispersion check that
says whether a Poisson rate model is usable — q_burstiness' twin for
counts instead of gaps).

Determinism discipline: revenue and quantity are exact integers; the
ABC cumulative share is a ratio of exact integer cents evaluated
identically on both engines; CV and VMR are closed-form doubles from
DECIMAL(38,0) moment sums, and class boundaries compare those
identical doubles — no rounding sits on a decision boundary.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_abc_xyz",
    oracle="""
    WITH part_rev AS (
      SELECT l.l_partkey, p.p_brand,
             SUM(CAST(FLOOR((l.l_extendedprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), abc AS (
      SELECT l_partkey, p_brand, cents,
             CAST(SUM(cents) OVER (PARTITION BY p_brand
                                   ORDER BY cents DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / SUM(cents) OVER (PARTITION BY p_brand) AS cum_share
      FROM part_rev
    ), monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
             SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2
    ), cv AS (
      SELECT l_partkey, COUNT(*) AS nm,
             CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DOUBLE) AS s2
      FROM monthly GROUP BY 1
    ), classed AS (
      SELECT a.l_partkey, a.cents,
             CASE WHEN a.cum_share <= 0.80 THEN 'A'
                  WHEN a.cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
             CASE WHEN SQRT(GREATEST(c.s2 / c.nm
                                     - POWER(c.s1 / c.nm, 2), 0))
                       / (c.s1 / c.nm) < 0.5 THEN 'X'
                  WHEN SQRT(GREATEST(c.s2 / c.nm
                                     - POWER(c.s1 / c.nm, 2), 0))
                       / (c.s1 / c.nm) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM abc a JOIN cv c ON a.l_partkey = c.l_partkey
    ), tot AS (SELECT SUM(cents) AS all_cents FROM classed)
    SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
           (CAST(SUM(classed.cents) AS DOUBLE) / MAX(t.all_cents))
             AS revenue_share
    FROM classed, tot t
    GROUP BY abc, xyz ORDER BY abc, xyz
    """,
    desc="ABC/XYZ segmentation matrix: parts classed A/B/C by "
         "cumulative revenue share WITHIN BRAND (80/95 cuts; "
         "brand-partitioned windows, so no global single-task sort "
         "exists — per-brand ABC is also the planner's actual view) "
         "and X/Y/Z by coefficient of variation of monthly demand "
         "(0.5/1.0 cuts) — the 9-cell matrix that routes SKUs to "
         "safety-stock / forecast-effort / discontinue decisions. "
         "AZ cells (high revenue, erratic demand) are the planner's "
         "fire alarm. Cumulative shares are ratios of exact integer "
         "cents; CV is a closed-form double from DECIMAL(38,0) "
         "moment sums; both engines compare identical doubles at "
         "the class cuts. Two combinable fact aggs + windows over "
         "the parts dimension (tagged cross for the 1-row total).",
    tags=["stats", "join", "window", "agg", "cross"],
)
def q_abc_xyz(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part")
    part_rev = (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .groupBy("l_partkey", "p_brand")
        .agg(
            F.sum(dfloor((col("l_extendedprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    w_cum = (
        Window.partitionBy("p_brand").orderBy(col("cents").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("p_brand")
    abc = part_rev.select(
        "l_partkey", "cents",
        (F.sum("cents").over(w_cum).cast("double")
         / F.sum("cents").over(w_tot)).alias("cum_share"),
    )
    d38 = "decimal(38,0)"
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", col("l_shipdate")).alias("m")
    ).agg(F.sum(col("l_quantity").cast("long")).alias("q"))
    cv = monthly.groupBy("l_partkey").agg(
        F.count("*").alias("nm"),
        F.sum(col("q").cast(d38)).cast("double").alias("s1"),
        F.sum(col("q").cast(d38) * col("q")).cast("double").alias("s2"),
    )
    mean = col("s1") / col("nm")
    cv_val = F.sqrt(
        F.greatest(col("s2") / col("nm") - mean * mean, F.lit(0.0))
    ) / mean
    classed = abc.join(cv, "l_partkey").select(
        "cents",
        F.when(col("cum_share") <= 0.80, "A")
        .when(col("cum_share") <= 0.95, "B").otherwise("C").alias("abc"),
        F.when(cv_val < 0.5, "X").when(cv_val < 1.0, "Y")
        .otherwise("Z").alias("xyz"),
    )
    tot = classed.agg(F.sum("cents").alias("all_cents"))
    return (
        classed.groupBy("abc", "xyz")
        .agg(F.count("*").alias("n_parts"), F.sum("cents").alias("cents"))
        .crossJoin(broadcast(tot))
        .select(
            "abc", "xyz",
            col("n_parts").cast("long").alias("n_parts"),
            (col("cents").cast("double") / col("all_cents"))
            .alias("revenue_share"),
        )
        .orderBy("abc", "xyz")
    )


@q(
    "q_dispersion_index",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), mom AS (
      SELECT event_type, COUNT(*) AS nd,
             CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(n AS DECIMAL(38,0)) * n) AS DOUBLE) AS s2
      FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(nd AS BIGINT) AS n_days,
           (s1 / nd) AS mean_daily,
           ((s2 / nd - POWER(s1 / nd, 2)) / (s1 / nd))
             AS dispersion_index,
           (s2 / nd - POWER(s1 / nd, 2)) / (s1 / nd) > 1.5
             AS overdispersed
    FROM mom ORDER BY event_type
    """,
    desc="Index of dispersion (Fano factor) of daily event counts per "
         "type: variance-to-mean ratio, ~1 for a Poisson process, "
         ">1 overdispersed (bursts/contagion — a rate model will "
         "underestimate tails), <1 underdispersed (throttling) — "
         "q_burstiness' twin measured on COUNTS instead of gaps, and "
         "the check that decides whether q_events_anomaly's "
         "threshold math is even valid. Daily counts are integers; "
         "moments accumulate as DECIMAL(38,0); VMR is one closed- "
         "form double (both engines compare the identical double at "
         "the 1.5 flag cut). Two stacked combinable aggs, scan "
         "speed at any scale.",
    tags=["events", "stats", "agg"],
)
def q_dispersion_index(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    daily = ev.groupBy(
        "event_type", col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    mom = daily.groupBy("event_type").agg(
        F.count("*").alias("nd"),
        F.sum(col("n").cast(d38)).cast("double").alias("s1"),
        F.sum(col("n").cast(d38) * col("n")).cast("double").alias("s2"),
    )
    mean = col("s1") / col("nd")
    vmr = (col("s2") / col("nd") - mean * mean) / mean
    return mom.select(
        "event_type",
        col("nd").cast("long").alias("n_days"),
        (mean).alias("mean_daily"),
        (vmr).alias("dispersion_index"),
        (vmr > 1.5).alias("overdispersed"),
    ).orderBy("event_type")
