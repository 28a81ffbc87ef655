"""Seventy-fourth-wave query inventory: decomposable inequality and
normality — the THEIL-T DECOMPOSITION of order-value inequality
(T_total = sum_g s_g T_g + sum_g s_g ln(xbar_g/mu): the inequality
index that splits EXACTLY into within-segment and between-segment
parts — the property q_gini_revenue's Gini famously lacks, and the
number that says whether revenue concentration lives inside
segments or between them) and the JARQUE-BERA normality test on
each event type's daily means (JB = n/6 (S^2 + K^2/4): the
moment-based gate that decides whether q_control_chart's 3-sigma
limits and q_welch_ttest's t inference are even applicable).

Determinism discipline: order cents are exact integers; x ln x
terms quantize the 1e-4 grid ->DECIMAL(38,4) before their segment sums;
central moments use the two-pass center-then-power discipline
(exact decimal mean, the 1e-6 grid ->DECIMAL(38,6) quantized centered
powers — no cancellation of large raw power sums); every statistic
is one closing closed-form double; chi-square critical value
5.991465 is a shared literal.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_CHI2_2_95 = 5.991465


@q(
    "q_theil_decomposition",
    oracle="""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), segs AS (
      SELECT seg, COUNT(*) AS n, SUM(cents) AS s,
             CAST(SUM(CAST(FLOOR((CAST(cents AS DOUBLE)
                                 * LN(CAST(cents AS DOUBLE))) * 1e4 + 0.5) / 1e4
                           AS DECIMAL(38,4))) AS DOUBLE) AS sxlx
      FROM vals GROUP BY seg
    ), tot AS (
      SELECT SUM(n) AS nt, SUM(s) AS st FROM segs
    )
    SELECT g.seg AS c_mktsegment,
           CAST(g.n AS BIGINT) AS n_orders,
           (CAST(g.s AS DOUBLE) / t.st) AS value_share,
           (g.sxlx / g.s - LN(CAST(g.s AS DOUBLE) / g.n))
             AS theil_within,
           ((CAST(g.s AS DOUBLE) / t.st)
                 * LN((CAST(g.s AS DOUBLE) / g.n)
                      / (CAST(t.st AS DOUBLE) / t.nt)))
             AS between_term
    FROM segs g, tot t ORDER BY g.seg
    """,
    desc="Theil-T inequality decomposition of order value by market "
         "segment: per segment the within-segment Theil index "
         "T_g = sum(x ln x)/sum(x) - ln(mean_g) and the between "
         "term s_g ln(mean_g/mu), whose value-share-weighted sums "
         "reassemble the corpus Theil EXACTLY — the additive "
         "decomposability q_gini_revenue's Gini lacks, answering "
         "'does revenue inequality live inside segments or between "
         "them' in one pass (the test pins the decomposition "
         "identity against a brute-force global T). Cents are exact "
         "integers; each x ln x term quantizes the 1e-4 grid ->"
         "DECIMAL(38,4) before the only cross-row sums; one "
         "broadcast-dim join + one combinable segment agg + a 1-row "
         "total (tagged cross).",
    tags=["stats", "join", "agg", "cross"],
)
def q_theil_decomposition(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        col("o_custkey") == col("c_custkey"),
    ).select(
        col("c_mktsegment").alias("seg"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
    )
    cd = col("cents").cast("double")
    segs = vals.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum((dfloor((cd * F.log(cd)) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).cast("decimal(38,4)"))
        .cast("double").alias("sxlx"),
    )
    tot = segs.agg(F.sum("n").alias("nt"), F.sum("s").alias("st"))
    j = segs.crossJoin(broadcast(tot))
    sd = col("s").cast("double")
    mean_g = sd / col("n")
    mu = col("st").cast("double") / col("nt")
    return j.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("n_orders"),
        (sd / col("st")).alias("value_share"),
        (col("sxlx") / col("s") - F.log(mean_g))
        .alias("theil_within"),
        ((sd / col("st")) * F.log(mean_g / mu))
        .alias("between_term"),
    ).orderBy("c_mktsegment")


@q(
    "q_jarque_bera",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), means AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(mc AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS m1
      FROM daily GROUP BY event_type
    ), cm AS (
      SELECT d.event_type, m.n,
             CAST(SUM(CAST(FLOOR((POWER(d.mc - m.m1, 2)) * 1e6 + 0.5) / 1e6
                           AS DECIMAL(38,6))) AS DOUBLE) / m.n AS m2,
             CAST(SUM(CAST(FLOOR((POWER(d.mc - m.m1, 3)) * 1e6 + 0.5) / 1e6
                           AS DECIMAL(38,6))) AS DOUBLE) / m.n AS m3,
             CAST(SUM(CAST(FLOOR((POWER(d.mc - m.m1, 4)) * 1e6 + 0.5) / 1e6
                           AS DECIMAL(38,6))) AS DOUBLE) / m.n AS m4
      FROM daily d JOIN means m ON d.event_type = m.event_type
      GROUP BY d.event_type, m.n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           FLOOR((m3 / POWER(m2, 1.5)) * 1e6 + 0.5) / 1e6 AS skewness,
           (m4 / POWER(m2, 2) - 3) AS excess_kurtosis,
           (n / 6.0 * (POWER(m3 / POWER(m2, 1.5), 2)
                 + POWER(m4 / POWER(m2, 2) - 3, 2) / 4)) AS jarque_bera,
           n / 6.0 * (POWER(m3 / POWER(m2, 1.5), 2)
                 + POWER(m4 / POWER(m2, 2) - 3, 2) / 4) > {_CHI2_2_95}
             AS reject_normal_5pct
    FROM cm ORDER BY event_type
    """,
    desc="Jarque-Bera normality test on each event type's daily-mean "
         "series: skewness and excess kurtosis from exact integer-"
         "cent central moments, JB = n/6 (S^2 + K^2/4), and the 5% "
         "chi-square(2) rejection flag — the moment-based gate that "
         "decides whether normal-theory machinery downstream "
         "(q_control_chart's 3-sigma limits, q_welch_ttest's t) is "
         "even applicable to these series. Daily means are "
         "integerized to exact cents; the two-pass "
         "center-then-power discipline (exact decimal mean, then "
         "the 1e-6 grid ->DECIMAL(38,6) quantized centered powers) keeps "
         "the cancellation-free moments order-free; JB is one closed "
         "form per type; 5.991465 is a shared literal.",
    tags=["events", "stats", "agg"],
)
def q_jarque_bera(spark, sf_dir):
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
        .alias("m1"),
    )
    dev = col("mc") - col("m1")
    cm = (
        daily.join(broadcast(means), col("event_type") == col("et_m"))
        .groupBy("event_type", "n")
        .agg(
            (F.sum((dfloor((F.pow(dev, 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)"))
             .cast("double") / F.max("n")).alias("m2"),
            (F.sum((dfloor((F.pow(dev, 3)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)"))
             .cast("double") / F.max("n")).alias("m3"),
            (F.sum((dfloor((F.pow(dev, 4)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)"))
             .cast("double") / F.max("n")).alias("m4"),
        )
    )
    nd = col("n").cast("double")
    m2, m3, m4 = col("m2"), col("m3"), col("m4")
    # try_divide: a constant daily series has m2 = 0; skew/kurt/JB are
    # then NULL, matching the oracle's x/0 = NULL
    skew = F.try_divide(m3, F.pow(m2, 1.5))
    kurt = F.try_divide(m4, F.pow(m2, 2)) - 3
    jb = nd / 6 * (F.pow(skew, 2) + F.pow(kurt, 2) / 4)
    return cm.select(
        "event_type",
        col("n").cast("long").alias("n_days"),
        (dfloor((skew) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("skewness"),
        (kurt).alias("excess_kurtosis"),
        (jb).alias("jarque_bera"),
        (jb > _CHI2_2_95).alias("reject_normal_5pct"),
    ).orderBy("event_type")
