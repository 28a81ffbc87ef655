"""Eighty-seventh-wave query inventory: correlation comparison and
heteroscedastic ANOVA — the FISHER-Z TEST for a difference between
two correlations (is the daily volume<->value correlation different
on weekends vs weekdays? atanh-transform each r, difference over
sqrt(1/(n1-3)+1/(n2-3)) — the correct way to compare correlations,
which naive CI-overlap eyeballing gets wrong) and WELCH'S ANOVA
(the k-group location test with NO equal-variance assumption: the
test q_levene_bf's rejection demands in place of q_anova_oneway —
group-weighted means with Welch-Satterthwaite degrees of freedom).

Determinism discipline: daily counts and integer-cent means are
exact; all correlation moments are DECIMAL-accumulated integer
cross-products (the q_corr_exact discipline); atanh is the closed
form 0.5 ln((1+r)/(1-r)); Welch terms quantize ROUND->DECIMAL
before cross-group sums; every statistic is one closing closed
form.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_DAILY2_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS x,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
"""


@q(
    "q_fisher_z_diff",
    oracle=_DAILY2_SQL + """
    , tagged AS (
      SELECT x, y, (isodow(day) >= 6) AS weekend FROM daily
    ), mom AS (
      SELECT weekend, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
      FROM tagged GROUP BY weekend
    ), corr_ AS (
      SELECT weekend, n,
             (n * sxy - sx * sy)
               / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r
      FROM mom
    )
    SELECT CAST(wd.n AS BIGINT) AS n_weekday,
           CAST(we.n AS BIGINT) AS n_weekend,
           (wd.r) AS r_weekday,
           (we.r) AS r_weekend,
           ((0.5 * LN((1 + wd.r) / (1 - wd.r))
                  - 0.5 * LN((1 + we.r) / (1 - we.r)))
                 / SQRT(1.0 / (wd.n - 3) + 1.0 / (we.n - 3)))
             AS z_fisher,
           ABS((0.5 * LN((1 + wd.r) / (1 - wd.r))
                - 0.5 * LN((1 + we.r) / (1 - we.r)))
               / SQRT(1.0 / (wd.n - 3) + 1.0 / (we.n - 3))) > 1.959964
             AS differ_5pct
    FROM corr_ wd, corr_ we
    WHERE NOT wd.weekend AND we.weekend
    """,
    desc="Fisher-z test for a correlation difference: the pooled "
         "daily volume<->mean-value Pearson r on weekdays vs "
         "weekends (day pooled across event types), each r atanh-"
         "transformed and differenced over sqrt(1/(n1-3)+1/(n2-3)) "
         "— the correct comparison of two correlations (naive "
         "CI-overlap is conservative and ad hoc); answers whether "
         "the busy-days-run-hot coupling q_kendall_tau measures is "
         "a weekday phenomenon. Correlation moments are exact "
         "DECIMAL cross-products of integers per stratum (the "
         "q_corr_exact discipline); atanh is one closed form; the "
         "two 1-row strata cross-join to a single closing z.",
    tags=["events", "stats", "agg", "cross"],
)
def q_fisher_z_diff(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("x"),
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("y"),
        )
    )
    tagged = daily.select(
        "x", "y", (F.weekday(col("day")) >= 5).alias("weekend")
    )
    xd = col("x").cast("decimal(38,0)")
    yd = col("y").cast("decimal(38,0)")
    mom = tagged.groupBy("weekend").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * col("y")).cast("double").alias("sxy"),
        F.sum(xd * col("x")).cast("double").alias("sxx"),
        F.sum(yd * col("y")).cast("double").alias("syy"),
    )
    nd = col("n").cast("double")
    r = (nd * col("sxy") - col("sx") * col("sy")) / F.sqrt(
        (nd * col("sxx") - col("sx") * col("sx"))
        * (nd * col("syy") - col("sy") * col("sy"))
    )
    corr = mom.select("weekend", "n", r.alias("r"))
    wd = corr.filter(~col("weekend")).select(
        col("n").alias("n1"), col("r").alias("r1")
    )
    we = corr.filter(col("weekend")).select(
        col("n").alias("n2"), col("r").alias("r2")
    )
    j = wd.crossJoin(broadcast(we))
    z1 = 0.5 * F.log((1 + col("r1")) / (1 - col("r1")))
    z2 = 0.5 * F.log((1 + col("r2")) / (1 - col("r2")))
    zf = (z1 - z2) / F.sqrt(
        1.0 / (col("n1") - 3) + 1.0 / (col("n2") - 3)
    )
    return j.select(
        col("n1").cast("long").alias("n_weekday"),
        col("n2").cast("long").alias("n_weekend"),
        (col("r1")).alias("r_weekday"),
        (col("r2")).alias("r_weekend"),
        (zf).alias("z_fisher"),
        (F.abs(zf) > 1.959964).alias("differ_5pct"),
    )


@q(
    "q_welch_anova",
    oracle=_DAILY2_SQL + """
    , grp AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS s2
      FROM daily GROUP BY event_type
    ), stats AS (
      SELECT event_type, n, s1 / n AS m,
             (s2 - s1 * s1 / n) / (n - 1) AS v,
             n / ((s2 - s1 * s1 / n) / (n - 1)) AS w
      FROM grp
    ), tot AS (
      SELECT COUNT(*) AS k, SUM(w) AS sw,
             SUM(w * m) / SUM(w) AS mbar
      FROM stats
    ), parts AS (
      SELECT t.k, t.sw,
             CAST(SUM(CAST(FLOOR((s.w * POWER(s.m - t.mbar, 2)) * 1e8 + 0.5) / 1e8
                           AS DECIMAL(38,8))) AS DOUBLE) / (t.k - 1) AS num,
             CAST(SUM(CAST(FLOOR((POWER(1 - s.w / t.sw, 2) / (s.n - 1)) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(28,10))) AS DOUBLE) AS hsum
      FROM stats s, tot t GROUP BY t.k, t.sw
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           (num / (1 + 2.0 * (k - 2) / (k * k - 1) * hsum))
             AS welch_f,
           FLOOR(((k * k - 1.0) / (3 * hsum)) * 1e6 + 0.5) / 1e6 AS df2,
           num / (1 + 2.0 * (k - 2) / (k * k - 1) * hsum) > 2.65
             AS reject_equal_means_5pct
    FROM parts
    """,
    desc="Welch's heteroscedastic ANOVA on daily mean-value levels "
         "across event types: variance-weighted group means (w = "
         "n/s^2), F* = sum w(m - mbar)^2/(k-1) over the Welch "
         "correction term, with the Welch-Satterthwaite df2 — the "
         "k-group location test q_levene_bf's variance-homogeneity "
         "REJECTION demands in place of q_anova_oneway's pooled "
         "error (and the k-group extension of q_welch_ttest). Group "
         "moments are exact DECIMAL sums of integer cents; the "
         "weighted-deviation and df terms quantize ROUND->DECIMAL "
         "before cross-group sums; F* and df2 are single closed "
         "forms against the ~2.65 critical value (df 4, ~60).",
    tags=["events", "stats", "agg", "cross"],
)
def q_welch_anova(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("y")
        )
    )
    yd = col("y").cast("decimal(38,0)")
    grp = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(yd).cast("double").alias("s1"),
        F.sum(yd * col("y")).cast("double").alias("s2"),
    )
    nd = col("n").cast("double")
    # try_divide throughout: 1-day groups (n-1 = 0), zero-variance
    # groups (w = n/v undefined), and a single surviving group
    # (k^2-1 = 0) all degrade to NULL, matching the oracle's
    # x/0 = NULL at every one of the same sites
    m = col("s1") / nd
    v = F.try_divide(col("s2") - col("s1") * col("s1") / nd, nd - 1)
    stats = grp.select(
        "event_type", "n", m.alias("m"), v.alias("v"),
    ).withColumn("w", F.try_divide(col("n").cast("double"), col("v")))
    tot = stats.agg(
        F.count("*").alias("k"),
        F.sum("w").alias("sw"),
        F.try_divide(F.sum(col("w") * col("m")), F.sum("w")).alias("mbar"),
    )
    parts = stats.crossJoin(broadcast(tot)).groupBy("k", "sw").agg(
        F.try_divide(
            F.sum(
                (dfloor((col("w") * F.pow(col("m") - col("mbar"), 2)) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8))
                .cast("decimal(38,8)")
            ).cast("double"), F.max("k") - 1
        ).alias("num"),
        F.sum(
            (dfloor((F.try_divide(
                    F.pow(1 - F.try_divide(col("w"), col("sw")), 2),
                    col("n") - 1)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")
        ).cast("double").alias("hsum"),
    )
    kd = col("k").cast("double")
    f_star = F.try_divide(
        col("num"),
        1 + 2 * F.try_divide(kd - 2, kd * kd - 1) * col("hsum"),
    )
    return parts.select(
        col("k").cast("long").alias("n_groups"),
        (f_star).alias("welch_f"),
        (dfloor((F.try_divide(kd * kd - 1, 3 * col("hsum"))) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("df2"),
        (f_star > 2.65).alias("reject_equal_means_5pct"),
    )
