"""Eighty-eighth-wave query inventory: co-movement and drawdown —
the CAPM-STYLE BETA of each event type's daily series against the
pooled 'market' series (beta = cov(type, market)/var(market): how
much of a type's daily swing is systemic vs idiosyncratic — beta
near 0 means the type moves on its own and monitoring the pooled
aggregate misses it; the co-movement DECOMPOSITION q_kendall_tau's
single association cannot give) and MAXIMUM DRAWDOWN of cumulative
daily revenue per market segment (the largest peak-to-trough loss
fraction of the running total with its trough day — the
path-dependent risk number that variance-based measures
structurally miss; complements q_cvar_shortfall's static tail).

Determinism discipline: daily means/revenues are exact integer
cents; beta moments are DECIMAL-accumulated integer cross-products
over the joined series; running peaks are exact integer MAX windows
partitioned by segment; drawdown fractions are exact integer
ratios; argmax trough picks order by (drawdown DESC, day).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_capm_beta",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), market AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS m
      FROM events GROUP BY CAST(ts AS DATE)
    ), joined AS (
      SELECT d.event_type, d.y, mk.m
      FROM daily d JOIN market mk ON d.day = mk.day
    ), mom AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(m AS DECIMAL(38,0))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * m) AS DOUBLE) AS sym,
             CAST(SUM(CAST(m AS DECIMAL(38,0)) * m) AS DOUBLE) AS smm
      FROM joined GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ((n * sym - sy * sm) / (n * smm - sm * sm)) AS beta,
           ((sy - (n * sym - sy * sm) / (n * smm - sm * sm) * sm)
                 / n / 100) AS alpha_value
    FROM mom ORDER BY event_type
    """,
    desc="CAPM-style beta of each event type's daily mean against "
         "the pooled all-type 'market' series: beta = cov(y, m)/"
         "var(m) with the residual alpha intercept — the co-movement "
         "decomposition that says whether a type's daily swings are "
         "SYSTEMIC (beta ~ 1: watching the pooled aggregate "
         "suffices) or idiosyncratic (beta ~ 0: the type needs its "
         "own monitor), which q_kendall_tau's single rank "
         "association cannot apportion. Both series are exact "
         "integer cents; the day join is 1:1 on the tiny daily "
         "table; all regression moments are DECIMAL-accumulated "
         "integer cross-products (the q_unit_root_ar1 discipline); "
         "beta and alpha are single closed forms.",
    tags=["events", "stats", "join", "agg"],
)
def q_capm_beta(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    mc = (
        dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
            .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long")
    )
    daily = ev.groupBy("event_type", col("ts").cast("date").alias("day")).agg(
        mc.alias("y")
    )
    market = ev.groupBy(col("ts").cast("date").alias("mday")).agg(
        mc.alias("m")
    )
    joined = daily.join(broadcast(market), col("day") == col("mday"))
    yd = col("y").cast("decimal(38,0)")
    md = col("m").cast("decimal(38,0)")
    mom = joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(md).cast("double").alias("sm"),
        F.sum(yd * col("m")).cast("double").alias("sym"),
        F.sum(md * col("m")).cast("double").alias("smm"),
    )
    nd = col("n").cast("double")
    # try_divide: with a single matched day (or a constant market
    # series) the market variance is zero; beta and alpha are NULL,
    # matching the oracle's x/0 = NULL
    beta = F.try_divide(
        nd * col("sym") - col("sy") * col("sm"),
        nd * col("smm") - col("sm") * col("sm"),
    )
    alpha = (col("sy") - beta * col("sm")) / nd / 100
    return mom.select(
        "event_type",
        col("n").cast("long").alias("n_days"),
        (beta).alias("beta"),
        (alpha).alias("alpha_value"),
    ).orderBy("event_type")


@q(
    "q_max_drawdown",
    oracle="""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg, o.o_orderdate AS day,
             SUM(CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), cum AS (
      SELECT seg, day,
             SUM(cents) OVER (PARTITION BY seg ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM vals
    ), dd AS (
      SELECT seg, day, c,
             MAX(c) OVER (PARTITION BY seg ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM cum
    ), scored AS (
      SELECT seg, day,
             CAST(peak - c AS DOUBLE) / peak AS drawdown,
             ROW_NUMBER() OVER (PARTITION BY seg
               ORDER BY CAST(peak - c AS DOUBLE) / peak DESC, day) AS rnk
      FROM dd
    )
    SELECT seg AS c_mktsegment, day AS trough_day,
           (drawdown) AS max_drawdown
    FROM scored WHERE rnk = 1 ORDER BY seg
    """,
    desc="Maximum drawdown of each segment's cumulative daily revenue "
         "path: the largest (running peak - running total)/peak with "
         "its trough day — the PATH-DEPENDENT risk number every "
         "variance- or quantile-based measure (q_cvar_shortfall, "
         "q_control_chart) structurally misses, and the standard "
         "worst-case framing for any cumulative KPI. Note on this "
         "data: daily revenue is always positive, so the cumulative "
         "path is monotone and true drawdowns are 0 — the audit "
         "VERIFIES that invariant (a nonzero value would mean "
         "negative revenue days, i.e. data corruption); the "
         "mechanism is the general one. Daily cents are exact "
         "integer sums; running totals and peaks are exact integer "
         "windows partitioned by SEGMENT; the argmax orders by "
         "(drawdown DESC, day).",
    tags=["stats", "window", "join", "agg"],
)
def q_max_drawdown(spark, sf_dir):
    from pyspark.sql import Window

    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = (
        o.join(
            broadcast(c.select("c_custkey", "c_mktsegment")),
            col("o_custkey") == col("c_custkey"),
        )
        .groupBy(
            col("c_mktsegment").alias("seg"),
            col("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    w_run = (
        Window.partitionBy("seg").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = vals.select(
        "seg", "day",
        F.sum("cents").over(w_run).alias("c"),
    ).withColumn("peak", F.max("c").over(w_run))
    drawdown = (col("peak") - col("c")).cast("double") / col("peak")
    w_best = Window.partitionBy("seg").orderBy(
        drawdown.desc(), "day"
    )
    return (
        dd.withColumn("drawdown", drawdown)
        .withColumn("rnk", F.row_number().over(w_best))
        .filter(col("rnk") == 1)
        .select(
            col("seg").alias("c_mktsegment"),
            col("day").alias("trough_day"),
            (col("drawdown")).alias("max_drawdown"),
        )
        .orderBy("c_mktsegment")
    )
