"""Eighty-third-wave query inventory: ordered alternatives and tail
risk — PAGE'S L TEST for a monotone weekday trend (within each week
the seven weekdays are ranked by pooled daily mean; L = sum j * R_j
detects an ORDERED alternative Mon < ... < Sun that q_friedman_test,
which treats treatments as exchangeable, dilutes across its k-1
degrees of freedom) and CVAR / EXPECTED SHORTFALL of order value per
segment (the mean of the worst 5% tail beyond the exact 95th-
percentile VaR cut — the coherent risk measure capacity planning
should budget, where a quantile alone says nothing about HOW bad the
tail is; computed by the same exact CDF-clipping as q_trimmed_mean,
no per-segment sort).

Determinism discipline: daily means are exact integer cents; ranks
within each (week) block are exact midranks over 7 identical
integers; L and its z are closed forms over integer rank sums; the
tail cut k = ceil(0.05 n) is an exact integer and every tail
contribution an exact integer product from cumulative counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_TAIL = 0.05


@q(
    "q_page_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY CAST(ts AS DATE)
    ), tagged AS (
      SELECT day, mc, isodow(day) AS dow,
             CAST(FLOOR((CAST(day - DATE '2024-01-01' AS BIGINT)) / 7.0)
                  AS BIGINT) AS wk
      FROM daily
    ), full_weeks AS (
      SELECT wk FROM tagged GROUP BY wk HAVING COUNT(*) = 7
    ), ranked AS (
      SELECT t.wk, t.dow,
             RANK() OVER (PARTITION BY t.wk ORDER BY t.mc) AS r_lo,
             COUNT(*) OVER (PARTITION BY t.wk, t.mc) AS ties
      FROM tagged t JOIN full_weeks f ON t.wk = f.wk
    ), sums AS (
      SELECT dow, COUNT(*) AS n_weeks,
             CAST(SUM(CAST((r_lo * 2 + ties - 1) AS BIGINT)) AS DOUBLE) / 2
               AS rsum
      FROM ranked GROUP BY dow
    ), stat AS (
      SELECT MAX(n_weeks) AS n, COUNT(*) AS k,
             CAST(SUM(CAST(dow AS DOUBLE) * rsum) AS DOUBLE) AS l_stat
      FROM sums
    )
    SELECT CAST(n AS BIGINT) AS n_weeks, CAST(k AS BIGINT) AS k_weekdays,
           (l_stat) AS page_l,
           (n * k * POWER(k + 1, 2) / 4.0) AS expected_l,
           ((l_stat - n * k * POWER(k + 1, 2) / 4.0)
                 / SQRT(n * POWER(CAST(k AS DOUBLE), 2)
                        * (k + 1) * (POWER(k, 2) - 1) / 144)) AS z_page
    FROM stat
    """,
    desc="Page's L test for a monotone weekday trend: within each "
         "FULL week (blocks), the seven weekdays are midranked by "
         "the pooled daily mean; L = sum over weekdays of "
         "weekday_index * rank_sum, with E[L] = n k (k+1)^2 / 4 and "
         "the normal z — the ordered-alternative test that "
         "concentrates all its power on Mon <= ... <= Sun where "
         "q_friedman_test spreads over any permutation (detects a "
         "weekly ramp Friedman calls noise). Daily means are exact "
         "integer cents; week blocks are exact epoch-day FLOOR "
         "arithmetic; midranks double to integers (RANK + ties); L "
         "and z are closed forms; rank windows partition by WEEK "
         "(7 rows each).",
    tags=["events", "stats", "window", "agg"],
)
def q_page_trend(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    epoch = F.datediff(col("day"), F.lit("2024-01-01").cast("date"))
    tagged = daily.select(
        "day", "mc",
        (F.weekday(col("day")) + 1).alias("dow"),
        F.floor(epoch / 7).cast("long").alias("wk"),
    )
    full_weeks = (
        tagged.groupBy(col("wk").alias("fw")).agg(F.count("*").alias("c"))
        .filter(col("c") == 7)
        .select("fw")
    )
    w_rank = Window.partitionBy("wk").orderBy("mc")
    w_tie = Window.partitionBy("wk", "mc")
    ranked = (
        tagged.join(broadcast(full_weeks), col("wk") == col("fw"))
        .select(
            "wk", "dow",
            (
                (F.rank().over(w_rank) * 2 + F.count("*").over(w_tie) - 1)
                .cast("long")
            ).alias("r2"),
        )
    )
    sums = ranked.groupBy("dow").agg(
        F.count("*").alias("n_weeks"),
        (F.sum("r2").cast("double") / 2).alias("rsum"),
    )
    stat = sums.agg(
        F.max("n_weeks").alias("n"),
        F.count("*").alias("k"),
        F.sum(col("dow").cast("double") * col("rsum")).alias("l_stat"),
    )
    nd = col("n").cast("double")
    kd = col("k").cast("double")
    el = nd * kd * F.pow(kd + 1, 2) / 4
    sigma = F.sqrt(nd * F.pow(kd, 2) * (kd + 1) * (F.pow(kd, 2) - 1) / 144)
    return stat.select(
        col("n").cast("long").alias("n_weeks"),
        col("k").cast("long").alias("k_weekdays"),
        (col("l_stat")).alias("page_l"),
        (el).alias("expected_l"),
        ((col("l_stat") - el) / sigma).alias("z_page"),
    )


@q(
    "q_cvar_shortfall",
    oracle=f"""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), hist AS (
      SELECT seg, cents, COUNT(*) AS cnt FROM vals GROUP BY seg, cents
    ), tot AS (
      SELECT seg, SUM(cnt) AS n,
             CAST(CEIL({_TAIL} * SUM(cnt)) AS BIGINT) AS k
      FROM hist GROUP BY seg
    ), cdf AS (
      SELECT h.seg, h.cents, h.cnt, t.n, t.k,
             SUM(h.cnt) OVER (PARTITION BY h.seg ORDER BY h.cents DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ge,
             COALESCE(SUM(h.cnt) OVER (PARTITION BY h.seg
               ORDER BY h.cents DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_gt
      FROM hist h JOIN tot t ON h.seg = t.seg
    ), tail AS (
      SELECT seg, n, k, cents,
             GREATEST(LEAST(cum_ge, k) - cum_gt, 0) AS kept
      FROM cdf
    )
    SELECT seg AS c_mktsegment,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(k) AS BIGINT) AS n_tail,
           (CAST(MIN(CASE WHEN kept > 0 THEN cents END) AS DOUBLE)
                 / 100) AS var_95,
           (CAST(SUM(cents * kept) AS DOUBLE) / SUM(kept) / 100)
             AS cvar_95
    FROM tail GROUP BY seg ORDER BY seg
    """,
    desc="Value-at-Risk and CVaR (expected shortfall) of order value "
         "per segment at the 95% level: the exact k = ceil(0.05 n) "
         "largest orders' minimum (VaR) and mean (CVaR) — the "
         "coherent tail-risk measure that says HOW bad the worst 5% "
         "is, which the quantile alone (q_quantiles) cannot "
         "(q_hill_tail says how fast it decays; CVaR prices it). "
         "Computed by descending CDF clipping over the distinct-"
         "cents histogram — each value contributes clamp(min("
         "cum_ge, k) - cum_gt, >=0) tail copies, the upper-tail "
         "twin of q_trimmed_mean's construction; no per-segment "
         "sort, parallelism = distinct values, all contributions "
         "exact integer products.",
    tags=["stats", "window", "join", "agg"],
)
def q_cvar_shortfall(spark, sf_dir):
    from pyspark.sql import Window

    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        col("o_custkey") == col("c_custkey"),
    ).select(
        col("c_mktsegment").alias("seg"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
    )
    hist = vals.groupBy("seg", "cents").agg(F.count("*").alias("cnt"))
    tot = hist.groupBy(col("seg").alias("seg_t")).agg(
        F.sum("cnt").alias("n"),
        F.ceil(_TAIL * F.sum("cnt")).cast("long").alias("k"),
    )
    w_ge = (
        Window.partitionBy("seg").orderBy(col("cents").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_gt = (
        Window.partitionBy("seg").orderBy(col("cents").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdf = (
        hist.withColumn("cum_ge", F.sum("cnt").over(w_ge))
        .withColumn("cum_gt", F.coalesce(F.sum("cnt").over(w_gt), F.lit(0)))
        .join(broadcast(tot), col("seg") == col("seg_t"))
    )
    kept = F.greatest(
        F.least(col("cum_ge"), col("k")) - col("cum_gt"),
        F.lit(0).cast("long"),
    )
    tail = cdf.select("seg", "n", "k", "cents", kept.alias("kept"))
    return (
        tail.groupBy("seg")
        .agg(
            F.max("n").alias("n"),
            F.max("k").alias("kk"),
            F.min(F.when(col("kept") > 0, col("cents"))).alias("var_c"),
            F.sum(col("cents") * col("kept")).alias("tsum"),
            F.sum("kept").alias("tcnt"),
        )
        .select(
            col("seg").alias("c_mktsegment"),
            col("n").cast("long").alias("n_orders"),
            col("kk").cast("long").alias("n_tail"),
            (col("var_c").cast("double") / 100).alias("var_95"),
            (col("tsum").cast("double") / col("tcnt") / 100)
            .alias("cvar_95"),
        )
        .orderBy("c_mktsegment")
    )
