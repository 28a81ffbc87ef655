"""Eighty-sixth-wave query inventory: ordered proportions and median
homogeneity — the COCHRAN-ARMITAGE trend test (does the return rate
rise monotonically across the FIVE ordered priority levels? The
dose-response test for proportions that concentrates its single
degree of freedom on the ordering, where q_chi2_assoc's omnibus
chi-square spreads over 4 df and misses gentle monotone trends) and
MOOD'S MEDIAN TEST (do the event types share one median daily mean?
Counts above the pooled median per group -> chi-square: the blunt
but assumption-free k-sample location test that stays valid when
q_anova_oneway's variance assumptions fail and q_mann_whitney only
compares two groups).

Determinism discipline: all counts are exact integers and both
statistics single closed forms over them; the pooled median is an
exact percentile of identical integers; priority scores are the
fixed literals 1..5; chi-square terms quantize ROUND->DECIMAL
before the cross-group sum.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_cochran_armitage",
    oracle="""
    WITH cells AS (
      SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS w,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS k
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT SUM(n) AS nt, SUM(k) AS kt,
             CAST(SUM(k) AS DOUBLE) / SUM(n) AS p
      FROM cells
    ), stat AS (
      SELECT t.nt, t.p,
             CAST(SUM(c.w * (c.k - c.n * t.p)) AS DOUBLE) AS num,
             CAST(SUM(c.n * c.w * c.w) AS DOUBLE)
               - POWER(CAST(SUM(c.n * c.w) AS DOUBLE), 2) / t.nt AS wvar
      FROM cells c, tot t GROUP BY t.nt, t.p
    )
    SELECT CAST(nt AS BIGINT) AS n_orders,
           (p) AS pooled_rate,
           (num / SQRT(p * (1 - p) * wvar)) AS z_trend,
           ABS(num / SQRT(p * (1 - p) * wvar)) > 1.959964
             AS trend_5pct
    FROM stat
    """,
    desc="Cochran-Armitage trend test: does the 'finished' rate rise "
         "monotonically across the five ORDERED priority levels "
         "(scores 1..5 from the priority prefix)? z = sum w(k - np) "
         "/ sqrt(p(1-p)(sum n w^2 - (sum n w)^2/N)) — the 1-df "
         "dose-response test for proportions that beats "
         "q_chi2_assoc's omnibus 4-df chi-square whenever the "
         "alternative is a monotone trend (the usual case for "
         "ordered severity/priority factors). Scores are fixed "
         "literals parsed from the priority label; every moment is "
         "an exact integer sum over a 5-row cell table; z is one "
         "closed form against the shared 1.959964 quantile.",
    tags=["stats", "agg", "cross"],
)
def q_cochran_armitage(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.substring(col("o_orderpriority"), 1, 1).cast("long").alias("w")
    ).agg(
        F.count("*").alias("n"),
        F.count(F.when(col("o_orderstatus") == "F", 1)).alias("k"),
    )
    tot = cells.agg(
        F.sum("n").alias("nt"),
        (F.sum("k").cast("double") / F.sum("n")).alias("p"),
    )
    stat = cells.crossJoin(broadcast(tot)).groupBy("nt", "p").agg(
        F.sum(col("w") * (col("k") - col("n") * col("p"))).cast("double")
        .alias("num"),
        (
            F.sum(col("n") * col("w") * col("w")).cast("double")
            - F.pow(F.sum(col("n") * col("w")).cast("double"), 2)
            / F.max("nt")
        ).alias("wvar"),
    )
    z = col("num") / F.sqrt(col("p") * (1 - col("p")) * col("wvar"))
    return stat.select(
        col("nt").cast("long").alias("n_orders"),
        (col("p")).alias("pooled_rate"),
        (z).alias("z_trend"),
        (F.abs(z) > 1.959964).alias("trend_5pct"),
    )


@q(
    "q_moods_median",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), med AS (
      SELECT quantile_cont(mc, 0.5) AS md FROM daily
    ), cells AS (
      SELECT d.event_type,
             COUNT(*) FILTER (WHERE d.mc > m.md) AS a,
             COUNT(*) FILTER (WHERE d.mc <= m.md) AS b
      FROM daily d, med m GROUP BY d.event_type
    ), tot AS (
      SELECT SUM(a) AS at_, SUM(b) AS bt, SUM(a + b) AS nt FROM cells
    ), chi AS (
      SELECT t.nt,
             CAST(SUM(CAST(FLOOR((POWER(c.a - (c.a + c.b) * (CAST(t.at_ AS DOUBLE) / t.nt), 2)
                 / ((c.a + c.b) * (CAST(t.at_ AS DOUBLE) / t.nt))
               + POWER(c.b - (c.a + c.b) * (CAST(t.bt AS DOUBLE) / t.nt), 2)
                 / ((c.a + c.b) * (CAST(t.bt AS DOUBLE) / t.nt))) * 1e8 + 0.5) / 1e8
               AS DECIMAL(28,8))) AS DOUBLE) AS chi2,
             COUNT(*) AS k
      FROM cells c, tot t GROUP BY t.nt
    )
    SELECT CAST(nt AS BIGINT) AS n_days,
           CAST(k AS BIGINT) AS n_groups,
           (chi2) AS chi2,
           chi2 > 9.487729 AS reject_equal_medians_5pct
    FROM chi
    """,
    desc="Mood's median test: do the five event types share one "
         "median daily-mean level? Each type's days split above vs "
         "at-or-below the POOLED median; the 2xk chi-square against "
         "independence (df = 4, 5% critical 9.487729) — the "
         "assumption-free k-sample location test that works when "
         "q_anova_oneway's normal/equal-variance premises fail "
         "(q_levene_bf checks them) and q_mann_whitney handles only "
         "two groups. The pooled median is an exact percentile of "
         "identical integers; all cells are exact counts; each "
         "group's chi-square contribution quantizes the 1e-8 grid ->"
         "DECIMAL before the cross-group sum.",
    tags=["events", "stats", "agg", "cross"],
)
def q_moods_median(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    med = daily.agg(F.expr("percentile(mc, 0.5)").alias("md"))
    cells = (
        daily.crossJoin(broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.when(col("mc") > col("md"), 1)).alias("a"),
            F.count(F.when(col("mc") <= col("md"), 1)).alias("b"),
        )
    )
    tot = cells.agg(
        F.sum("a").alias("at_"), F.sum("b").alias("bt"),
        F.sum(col("a") + col("b")).alias("nt"),
    )
    pa = col("at_").cast("double") / col("nt")
    pb = col("bt").cast("double") / col("nt")
    nr = col("a") + col("b")
    term = (dfloor((F.pow(col("a") - nr * pa, 2) / (nr * pa)
        + F.pow(col("b") - nr * pb, 2) / (nr * pb)) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    chi = cells.crossJoin(broadcast(tot)).groupBy("nt").agg(
        F.sum(term).cast("double").alias("chi2"),
        F.count("*").alias("k"),
    )
    return chi.select(
        col("nt").cast("long").alias("n_days"),
        col("k").cast("long").alias("n_groups"),
        (col("chi2")).alias("chi2"),
        (col("chi2") > 9.487729).alias("reject_equal_medians_5pct"),
    )
