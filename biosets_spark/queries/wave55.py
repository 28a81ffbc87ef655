"""Fifty-fifth-wave query inventory: confounding-aware estimation —
a STRATIFIED treatment-effect estimate (the promo-discount effect on
quantity, adjusted for brand mix via precision-weighted per-stratum
differences: reporting the unadjusted and adjusted effects side by
side is the operational Simpson's-paradox detector) and one-way
ANOVA (eta-squared + F for value-by-weekday per event type: the
k-group generalization of q_welch_ttest that says what share of
variance the grouping actually explains before anyone ships a
'weekday effect' claim).

Determinism discipline: all group moments are DECIMAL(38,0) sums of
exact integer units; per-stratum differences and weights are closed-
form doubles quantized the 1e-12 grid ->DECIMAL before the cross-stratum
weighted sums (the q_jackknife_variance discipline); eta-squared and
F are single closed-form doubles, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_stratified_effect",
    oracle="""
    WITH units AS (
      SELECT p.p_brand AS stratum,
             (l.l_discount > 0.05) AS treated,
             CAST(l.l_quantity AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), per AS (
      SELECT stratum,
             COUNT(*) FILTER (WHERE treated) AS n1,
             COUNT(*) FILTER (WHERE NOT treated) AS n0,
             SUM(CAST(y AS DECIMAL(38,0))) FILTER (WHERE treated) AS s1,
             SUM(CAST(y AS DECIMAL(38,0))) FILTER (WHERE NOT treated) AS s0
      FROM units GROUP BY stratum
    ), terms AS (
      SELECT CAST(FLOOR((CAST(s1 AS DOUBLE) / n1
                         - CAST(s0 AS DOUBLE) / n0)
                        * (CAST(n1 AS DOUBLE) * n0 / (n1 + n0))
                        * 1e12 + 0.5)
                  AS DECIMAL(38,0)) AS wd,
             CAST(FLOOR(CAST(n1 AS DOUBLE) * n0 / (n1 + n0)
                        * 1e6 + 0.5) AS DECIMAL(38,0)) AS w,
             n1, n0, s1, s0
      FROM per WHERE n1 > 0 AND n0 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(n1) AS BIGINT) AS n_treated,
           CAST(SUM(n0) AS BIGINT) AS n_control,
           (CAST(SUM(s1) AS DOUBLE) / SUM(n1)
                 - CAST(SUM(s0) AS DOUBLE) / SUM(n0))
             AS unadjusted_effect,
           (CAST(SUM(wd) AS DOUBLE) / 1e12 / (CAST(SUM(w) AS DOUBLE) / 1e6))
             AS stratified_effect
    FROM terms
    """,
    desc="Stratified treatment effect of deep discounts (> 5%) on "
         "quantity, adjusted for BRAND mix: per-brand mean "
         "differences combined with Mantel-Haenszel precision "
         "weights n1*n0/(n1+n0), reported NEXT TO the unadjusted "
         "pooled difference — when the two disagree in sign or "
         "magnitude, brand mix is confounding the pooled number "
         "(the operational Simpson's-paradox detector; "
         "q_partial_correlation's grouped-data sibling). Strata "
         "missing either arm drop out per standard practice. One "
         "combinable conditional agg per stratum over the broadcast-"
         "dim join; per-stratum weighted differences quantize "
         "the 1e-12 grid ->DECIMAL before the cross-stratum sums, so no "
         "float accumulation order exists.",
    tags=["stats", "join", "agg"],
)
def q_stratified_effect(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part")
    d38 = "decimal(38,0)"
    units = li.join(
        broadcast(part), col("l_partkey") == col("p_partkey")
    ).select(
        col("p_brand").alias("stratum"),
        (col("l_discount") > 0.05).alias("treated"),
        col("l_quantity").cast("long").alias("y"),
    )
    per = units.groupBy("stratum").agg(
        F.count(F.when(col("treated"), 1)).alias("n1"),
        F.count(F.when(~col("treated"), 1)).alias("n0"),
        F.sum(F.when(col("treated"), col("y")).cast(d38)).alias("s1"),
        F.sum(F.when(~col("treated"), col("y")).cast(d38)).alias("s0"),
    )
    diff = col("s1").cast("double") / col("n1") - col("s0").cast("double") / col("n0")
    w = col("n1").cast("double") * col("n0") / (col("n1") + col("n0"))
    terms = per.filter((col("n1") > 0) & (col("n0") > 0)).select(
        # portable quantizer: FLOOR(x*1e12 + 0.5) is the SAME IEEE op
        # sequence in both engines (ROUND-then-DECIMAL double-rounds
        # differently in DuckDB vs Spark's BigDecimal HALF_UP)
        F.floor(diff * w * F.lit(1e12) + F.lit(0.5)).cast(d38).alias("wd"),
        # w is a repeating-decimal quotient: decimal division rounds at
        # different scales across engines, so quantize via the same
        # engine-identical FLOOR(x*1e6 + 0.5) before the exact sum
        F.floor(w * F.lit(1e6) + F.lit(0.5)).cast(d38).alias("w"),
        "n1", "n0", "s1", "s0",
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("n1").cast("long").alias("n_treated"),
        F.sum("n0").cast("long").alias("n_control"),
        (F.sum("s1").cast("double") / F.sum("n1")
            - F.sum("s0").cast("double") / F.sum("n0")).alias("unadjusted_effect"),
        (F.sum("wd").cast("double") / F.lit(1e12)
            / (F.sum("w").cast("double") / F.lit(1e6))).alias("stratified_effect"),
    )


@q(
    "q_anova_oneway",
    oracle="""
    WITH units AS (
      SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
             CAST(FLOOR((value * 100) + 0.5) AS BIGINT) AS c
      FROM events
    ), per AS (
      SELECT event_type, dow, COUNT(*) AS n,
             SUM(CAST(c AS DECIMAL(38,0))) AS s1,
             SUM(CAST(c AS DECIMAL(38,0)) * c) AS s2
      FROM units GROUP BY 1, 2
    ), grand AS (
      SELECT event_type,
             CAST(SUM(s1) AS DOUBLE) / SUM(n) AS gm,
             SUM(n) AS n_tot, COUNT(*) AS k
      FROM per GROUP BY event_type
    ), terms AS (
      SELECT p.event_type, g.k, g.n_tot,
             CAST(FLOOR((p.n * POWER(CAST(p.s1 AS DOUBLE) / p.n - g.gm, 2)) * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6)) AS ssb_t,
             CAST(FLOOR((CAST(p.s2 AS DOUBLE)
                        - CAST(p.s1 AS DOUBLE) * p.s1 / p.n) * 1e6 + 0.5) / 1e6
                  AS DECIMAL(38,6)) AS ssw_t
      FROM per p JOIN grand g ON p.event_type = g.event_type
    )
    SELECT event_type,
           CAST(MAX(k) AS BIGINT) AS n_groups,
           CAST(MAX(n_tot) AS BIGINT) AS n_rows,
           (CAST(SUM(ssb_t) AS DOUBLE)
                 / (CAST(SUM(ssb_t) AS DOUBLE)
                    + CAST(SUM(ssw_t) AS DOUBLE))) AS eta_squared,
           ((CAST(SUM(ssb_t) AS DOUBLE) / (MAX(k) - 1))
                 / (CAST(SUM(ssw_t) AS DOUBLE) / (MAX(n_tot) - MAX(k)))) AS f_stat
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    desc="One-way ANOVA of event value by weekday (isodow, Monday-"
         "anchored on both engines) per event type: eta-squared (the "
         "share of total variance the weekday grouping explains — "
         "the effect SIZE a significant F alone hides) and the F "
         "statistic (between-group over within-group mean square) — "
         "the k-group generalization of q_welch_ttest, and with "
         "q_seasonal_index the full weekday-effect panel (index says "
         "how days differ, ANOVA says whether it matters). All three "
         "sums of squares come from per-(type, dow) DECIMAL(38,0) "
         "moments in ONE combinable agg; eta^2 and F are closed-form "
         "doubles. The between-SS uses sum(s1^2/n) - grand^2/N over "
         "GROUP sums (7 groups), not raw rows — no cancellation "
         "regime at these magnitudes.",
    tags=["events", "stats", "agg"],
)
def q_anova_oneway(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    units = ev.select(
        "event_type",
        (F.weekday(col("ts").cast("date")) + 1).alias("dow"),
        dfloor((col("value") * 100) + F.lit(0.5)).cast("long").alias("c"),
    )
    per = units.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"),
        F.sum(col("c").cast(d38)).alias("s1"),
        F.sum(col("c").cast(d38) * col("c")).alias("s2"),
    )
    grand = per.groupBy(col("event_type").alias("et")).agg(
        (F.sum("s1").cast("double") / F.sum("n")).alias("gm"),
        F.sum("n").alias("n_tot"),
        F.count("*").alias("k"),
    )
    # every per-group term is one closed-form double over exact sums
    # (identical on both engines), quantized BEFORE the only
    # cross-group sums — the cancellation in ssb (group mean vs grand
    # mean) happens inside identical doubles, never across engines
    terms = per.join(broadcast(grand), col("event_type") == col("et")).select(
        "event_type", "k", "n_tot",
        (dfloor((col("n") * F.pow(col("s1").cast("double") / col("n") - col("gm"), 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)").alias("ssb_t"),
        (dfloor((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)").alias("ssw_t"),
    )
    ssb = F.sum("ssb_t").cast("double")
    ssw = F.sum("ssw_t").cast("double")
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("k").cast("long").alias("n_groups"),
            F.max("n_tot").cast("long").alias("n_rows"),
            # try_divide: constant values (ssb+ssw = 0), a single dow
            # group (k-1 = 0), or saturated groups (n_tot = k) all
            # degrade to NULL, matching the oracle's x/0 = NULL
            (F.try_divide(ssb, ssb + ssw)).alias("eta_squared"),
            (F.try_divide(
                    F.try_divide(ssb, F.max("k") - 1),
                    F.try_divide(ssw, F.max("n_tot") - F.max("k")))).alias("f_stat"),
        )
        .orderBy("event_type")
    )
