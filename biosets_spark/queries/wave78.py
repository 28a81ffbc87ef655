"""Seventy-eighth-wave query inventory: welfare inequality and
model adequacy — the ATKINSON INDEX (eps = 1) of order value per
segment (1 - geometric/arithmetic mean: the welfare-grounded
inequality measure whose value IS the fraction of total value a
perfectly equal distribution could discard for equal welfare —
completing the inequality family next to q_gini_revenue's rank
measure and q_theil_decomposition's additive one) and BINOMIAL
OVERDISPERSION of daily high-value rates (the chi-square dispersion
factor phi: phi >> 1 means day-to-day rate clumping that the
binomial models behind q_sprt_monitor and q_ab_test_z assume away,
and their nominal error rates are fiction until corrected by phi).

Determinism discipline: cents are exact integers; ln x terms
quantize the 1e-8 grid ->DECIMAL(28,8) before segment sums; daily counts
are exact integers, the pooled rate an exact ratio, and each day's
chi-square term one closed-form double quantized the 1e-8 grid ->DECIMAL
before the cross-day sum.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_HIGH = 20.0


@q(
    "q_atkinson_index",
    oracle="""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), segs AS (
      SELECT seg, COUNT(*) AS n, SUM(cents) AS s,
             CAST(SUM(CAST(FLOOR((LN(CAST(cents AS DOUBLE))) * 1e8 + 0.5) / 1e8
                           AS DECIMAL(28,8))) AS DOUBLE) AS slx
      FROM vals GROUP BY seg
    )
    SELECT seg AS c_mktsegment,
           CAST(n AS BIGINT) AS n_orders,
           (CAST(s AS DOUBLE) / n / 100) AS mean_value,
           (EXP(slx / n) / 100) AS geo_mean_value,
           (1 - EXP(slx / n) / (CAST(s AS DOUBLE) / n))
             AS atkinson_eps1
    FROM segs ORDER BY seg
    """,
    desc="Atkinson inequality index (epsilon = 1) of order value per "
         "market segment: 1 - geometric mean / arithmetic mean — the "
         "welfare-grounded inequality measure whose VALUE has a "
         "direct reading (the fraction of total order value society "
         "could discard if it were equally distributed, at log "
         "utility), completing the inequality family: Gini "
         "(q_gini_revenue) ranks, Theil (q_theil_decomposition) "
         "decomposes, Atkinson prices. Cents are exact integers; "
         "each ln(x) term quantizes the 1e-8 grid ->DECIMAL(28,8) before "
         "the per-segment sum so the geometric mean is order-free; "
         "one broadcast-dim join and one combinable agg.",
    tags=["stats", "join", "agg"],
)
def q_atkinson_index(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        col("o_custkey") == col("c_custkey"),
    ).select(
        col("c_mktsegment").alias("seg"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
    )
    segs = vals.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(
            (dfloor((F.log(col("cents").cast("double"))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8))
            .cast("decimal(28,8)")
        ).cast("double").alias("slx"),
    )
    mean = col("s").cast("double") / col("n")
    geo = F.exp(col("slx") / col("n"))
    return segs.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("n_orders"),
        (mean / 100).alias("mean_value"),
        (geo / 100).alias("geo_mean_value"),
        (1 - geo / mean).alias("atkinson_eps1"),
    ).orderBy("c_mktsegment")


@q(
    "q_overdispersion",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE value >= {_HIGH}) AS k
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), pooled AS (
      SELECT event_type, SUM(n) AS nt, SUM(k) AS kt,
             COUNT(*) AS d
      FROM daily GROUP BY event_type
    ), terms AS (
      SELECT d.event_type, p.d,
             CAST(FLOOR((POWER(d.k - d.n * (CAST(p.kt AS DOUBLE) / p.nt), 2)
               / (d.n * (CAST(p.kt AS DOUBLE) / p.nt)
                  * (1 - CAST(p.kt AS DOUBLE) / p.nt))) * 1e8 + 0.5) / 1e8
               AS DECIMAL(28,8)) AS t
      FROM daily d JOIN pooled p ON d.event_type = p.event_type
    )
    SELECT t.event_type,
           CAST(MAX(t.d) AS BIGINT) AS n_days,
           FLOOR((CAST(SUM(t.t) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS chi2,
           (CAST(SUM(t.t) AS DOUBLE) / (MAX(t.d) - 1))
             AS dispersion_phi,
           CAST(SUM(t.t) AS DOUBLE) / (MAX(t.d) - 1) > 1.5
             AS overdispersed
    FROM terms t GROUP BY t.event_type ORDER BY t.event_type
    """,
    desc="Binomial overdispersion of each event type's daily "
         "high-value rate: the chi-square dispersion factor phi = "
         "sum_days (k_d - n_d p)^2 / (n_d p (1-p)) / (days-1) "
         "against the pooled rate — phi near 1 means day-to-day "
         "variation is binomial sampling noise; phi >> 1 means rate "
         "CLUMPING, and every binomial-model error rate downstream "
         "(q_sprt_monitor's boundaries, q_ab_test_z's z, "
         "q_power_analysis's n) is optimistic until divided by phi "
         "— the adequacy check for the model family itself. Counts "
         "are exact integers, the pooled rate an exact ratio; each "
         "day's term is one closed form quantized the 1e-8 grid ->"
         "DECIMAL before the cross-day sum.",
    tags=["events", "stats", "agg"],
)
def q_overdispersion(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(col("value") >= _HIGH, 1)).alias("k"),
        )
    )
    pooled = daily.groupBy(col("event_type").alias("et_p")).agg(
        F.sum("n").alias("nt"), F.sum("k").alias("kt"),
        F.count("*").alias("d"),
    )
    p = col("kt").cast("double") / col("nt")
    # try_divide: a pooled rate of exactly 0 or 1 makes the binomial
    # variance zero; those terms (and phi for a 1-day type below) are
    # NULL, matching the oracle's x/0 = NULL (SUM skips NULLs in both
    # engines)
    term = (dfloor((F.try_divide(F.pow(col("k") - col("n") * p, 2),
                     col("n") * p * (1 - p))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    terms = daily.join(broadcast(pooled), col("event_type") == col("et_p"))
    agg = terms.groupBy("event_type").agg(
        F.max("d").alias("d"),
        F.sum(term).cast("double").alias("chi2"),
    )
    phi = F.try_divide(col("chi2"), col("d") - 1)
    return agg.select(
        "event_type",
        col("d").cast("long").alias("n_days"),
        (dfloor((col("chi2")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("chi2"),
        (phi).alias("dispersion_phi"),
        (phi > 1.5).alias("overdispersed"),
    ).orderBy("event_type")
