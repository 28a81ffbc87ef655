"""Eighty-second-wave query inventory: assumption policing — the
BROWN-FORSYTHE / LEVENE test (are the five event types' daily-mean
VARIANCES equal? ANOVA on absolute deviations from group medians —
the robust homogeneity check that is itself a PRECONDITION of
q_anova_oneway's pooled F: heteroscedastic groups demand
q_welch_ttest-style corrections instead) and GRUBBS' OUTLIER TEST
(the maximum studentized deviation per event type against its
critical value: unlike q_mad_outliers' per-point filter, Grubbs is
a TEST — it answers 'is the single worst day statistically
surprising for a normal series', with q_jarque_bera guarding the
normality premise).

Determinism discipline: daily means are exact integer cents; group
medians are exact percentiles of identical integers; absolute
deviations and their squared terms quantize ROUND->DECIMAL before
every cross-row sum; F and G are single closed forms; the Grubbs
critical value for ~30 observations (2.9085) is a shared literal.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_G_CRIT_30 = 2.9085  # Grubbs two-sided 5%, n = 30

_DAILY_MC_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
"""


@q(
    "q_levene_bf",
    oracle=_DAILY_MC_SQL + """
    , med AS (
      SELECT event_type, quantile_cont(mc, 0.5) AS md
      FROM daily GROUP BY event_type
    ), devs AS (
      SELECT d.event_type,
             CAST(FLOOR((ABS(d.mc - m.md)) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6)) AS z
      FROM daily d JOIN med m ON d.event_type = m.event_type
    ), grp AS (
      SELECT event_type, COUNT(*) AS n, SUM(z) AS sz,
             SUM(CAST(FLOOR((CAST(z AS DOUBLE) * CAST(z AS DOUBLE)) * 1e6 + 0.5) / 1e6
                      AS DECIMAL(38,6))) AS szz
      FROM devs GROUP BY event_type
    ), tot AS (
      SELECT SUM(n) AS nt, COUNT(*) AS k,
             CAST(SUM(sz) AS DOUBLE) AS szt
      FROM grp
    ), parts AS (
      SELECT t.nt, t.k,
             CAST(SUM(CAST(FLOOR((POWER(CAST(g.sz AS DOUBLE) / g.n - t.szt / t.nt, 2) * g.n) * 1e6 + 0.5) / 1e6
               AS DECIMAL(38,6))) AS DOUBLE) AS ssb,
             CAST(SUM(CAST(FLOOR((CAST(g.szz AS DOUBLE)
               - CAST(g.sz AS DOUBLE) * CAST(g.sz AS DOUBLE) / g.n) * 1e6 + 0.5) / 1e6
               AS DECIMAL(38,6))) AS DOUBLE) AS ssw
      FROM grp g, tot t GROUP BY t.nt, t.k
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(nt AS BIGINT) AS n_days_total,
           (ssb / (k - 1)) AS ms_between,
           (ssw / (nt - k)) AS ms_within,
           ((ssb / (k - 1)) / (ssw / (nt - k))) AS f_stat,
           (ssb / (k - 1)) / (ssw / (nt - k)) > 2.45 AS reject_equal_var_5pct
    FROM parts
    """,
    desc="Brown-Forsythe (median-based Levene) test for equal daily-"
         "mean variances across event types: one-way ANOVA on "
         "|mc - group median|, F against the ~2.45 critical value "
         "(df 4, ~145) — the robust homogeneity check that decides "
         "whether q_anova_oneway's pooled error term is even valid "
         "(heteroscedastic groups need Welch corrections), using "
         "the MEDIAN anchor so heavy tails don't masquerade as "
         "unequal variances. Medians are exact percentiles of "
         "identical integers; absolute deviations quantize to "
         "DECIMAL(28,6); between/within sums of squares quantize "
         "per group before the cross-group sums; F is one closed "
         "form over a 5-row group table.",
    tags=["events", "stats", "agg", "cross"],
)
def q_levene_bf(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    med = daily.groupBy(col("event_type").alias("et_m")).agg(
        F.expr("percentile(mc, 0.5)").alias("md")
    )
    devs = daily.join(broadcast(med), col("event_type") == col("et_m")).select(
        "event_type",
        (dfloor((F.abs(col("mc") - col("md"))) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(28,6)")
        .alias("z"),
    )
    zd = col("z").cast("double")
    grp = devs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("z").alias("sz"),
        F.sum((dfloor((zd * zd) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)")).alias("szz"),
    )
    tot = grp.agg(
        F.sum("n").alias("nt"),
        F.count("*").alias("k"),
        F.sum("sz").cast("double").alias("szt"),
    )
    szd = col("sz").cast("double")
    parts = (
        grp.crossJoin(broadcast(tot))
        .agg(
            F.max("nt").alias("nt"),
            F.max("k").alias("k"),
            F.sum(
                (dfloor((F.pow(szd / col("n") - col("szt") / col("nt"), 2)
                    * col("n")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)")
            ).cast("double").alias("ssb"),
            F.sum(
                (dfloor((col("szz").cast("double") - szd * szd / col("n")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)")
            ).cast("double").alias("ssw"),
        )
    )
    # try_divide: one group (k-1 = 0), saturated groups (nt = k), or
    # zero within-deviation all make the F pieces NULL, matching the
    # oracle's x/0 = NULL
    msb = F.try_divide(col("ssb"), col("k") - 1)
    msw = F.try_divide(col("ssw"), col("nt") - col("k"))
    f_stat = F.try_divide(msb, msw)
    return parts.select(
        col("k").cast("long").alias("n_groups"),
        col("nt").cast("long").alias("n_days_total"),
        (msb).alias("ms_between"),
        (msw).alias("ms_within"),
        (f_stat).alias("f_stat"),
        (f_stat > 2.45).alias("reject_equal_var_5pct"),
    )


@q(
    "q_grubbs_test",
    oracle=_DAILY_MC_SQL + f"""
    , means AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(mc AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS mu
      FROM daily GROUP BY event_type
    ), sig AS (
      SELECT d.event_type, m.n, m.mu,
             SQRT(CAST(SUM(CAST(FLOOR((POWER(d.mc - m.mu, 2)) * 1e6 + 0.5) / 1e6
                                AS DECIMAL(38,6))) AS DOUBLE) / (m.n - 1))
               AS sd
      FROM daily d JOIN means m ON d.event_type = m.event_type
      GROUP BY d.event_type, m.n, m.mu
    ), scored AS (
      SELECT d.event_type, d.day, s.n,
             ABS(d.mc - s.mu) / s.sd AS g
      FROM daily d JOIN sig s ON d.event_type = s.event_type
    ), ranked AS (
      SELECT event_type, day, n, g,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY g DESC, day) AS rnk
      FROM scored
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           day AS worst_day,
           (g) AS grubbs_g,
           g > {_G_CRIT_30} AS outlier_5pct
    FROM ranked WHERE rnk = 1 ORDER BY event_type
    """,
    desc="Grubbs' maximum-studentized-deviation test per event type: "
         "G = max |mc - mean| / sd over the daily series, the worst "
         "day, and the 5% flag against the n=30 critical value "
         "2.9085 — a proper outlier TEST (is the single worst day "
         "surprising under normality, which q_jarque_bera checks) "
         "where q_mad_outliers and q_events_anomaly are per-point "
         "screens with no error-rate calibration. Means and sds "
         "use the exact-decimal + centered-quantized discipline; "
         "the argmax orders by (G DESC, day) so ties are "
         "deterministic; windows partition by type over the tiny "
         "daily table.",
    tags=["events", "stats", "window", "agg"],
)
def q_grubbs_test(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    means = daily.groupBy(col("event_type").alias("et_m")).agg(
        F.count("*").alias("n"),
        (F.sum(col("mc").cast("decimal(38,0)")).cast("double") / F.count("*"))
        .alias("mu"),
    )
    dev = col("mc") - col("mu")
    sig = (
        daily.join(broadcast(means), col("event_type") == col("et_m"))
        .groupBy("event_type", "n", "mu")
        .agg(
            # try_divide: a 1-day type (n-1 = 0) or constant series
            # (sd = 0) yields NULL G scores, matching the oracle
            F.sqrt(
                F.try_divide(
                    F.sum((dfloor((F.pow(dev, 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)"))
                    .cast("double"), col("n") - 1)
            ).alias("sd")
        )
    )
    scored = daily.join(
        broadcast(sig.select(col("event_type").alias("et_s"), "n", "mu", "sd")),
        col("event_type") == col("et_s"),
    ).select(
        "event_type", "day", "n",
        F.try_divide(F.abs(col("mc") - col("mu")), col("sd")).alias("g"),
    )
    w = Window.partitionBy("event_type").orderBy(col("g").desc(), "day")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(col("rnk") == 1)
        .select(
            "event_type",
            col("n").cast("long").alias("n_days"),
            col("day").alias("worst_day"),
            (col("g")).alias("grubbs_g"),
            (col("g") > _G_CRIT_30).alias("outlier_5pct"),
        )
        .orderBy("event_type")
    )
