"""Ninety-second-wave query inventory: stratified pooling and
heterogeneity — the MANTEL-HAENSZEL common odds ratio (the
epidemiology-standard pooled discount->return association across
order-priority strata: OR_MH = sum(a d / n) / sum(b c / n), the
estimator that stays valid under sparse strata where the simple
pooled OR (q_odds_ratio) is confounded — the numerical answer to
the confounding q_simpson_paradox only detects) and META-ANALYTIC
HETEROGENEITY (each stratum's log odds ratio treated as a study:
inverse-variance fixed-effect pooling, Cochran's Q and the I^2
share of between-stratum variance — the meta-analysis triple that
says whether ONE common effect even exists before anyone quotes
the pooled number).

Determinism discipline: all 2x2 cells are exact integers; MH
numerator/denominator terms and inverse-variance weights quantize
ROUND->DECIMAL before cross-stratum sums; log ORs use add-0.5
continuity correction uniformly; Q and I^2 are single closing
closed forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_CELLS_SQL = """
    WITH cells AS (
      SELECT o.o_orderpriority AS stratum,
             COUNT(*) FILTER (WHERE l.l_discount >= 0.05
                              AND l.l_returnflag = 'R') AS a,
             COUNT(*) FILTER (WHERE l.l_discount >= 0.05
                              AND l.l_returnflag <> 'R') AS b,
             COUNT(*) FILTER (WHERE l.l_discount < 0.05
                              AND l.l_returnflag = 'R') AS c,
             COUNT(*) FILTER (WHERE l.l_discount < 0.05
                              AND l.l_returnflag <> 'R') AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
"""


@q(
    "q_mantel_haenszel",
    oracle=_CELLS_SQL + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           ((CAST(SUM(CAST(FLOOR(CAST(a AS DOUBLE) * d
                                     / (a + b + c + d) * 1e8 + 0.5)
                               AS DECIMAL(28,0))) AS DOUBLE) / 1e8)
                 / (CAST(SUM(CAST(FLOOR(CAST(b AS DOUBLE) * c
                                       / (a + b + c + d) * 1e8 + 0.5)
                                 AS DECIMAL(28,0))) AS DOUBLE) / 1e8))
             AS or_mh,
           (CAST(SUM(a) AS DOUBLE) * SUM(d)
                 / (CAST(SUM(b) AS DOUBLE) * SUM(c))) AS or_pooled_naive
    FROM cells
    """,
    desc="Mantel-Haenszel common odds ratio for discount->return "
         "across order-priority strata: OR_MH = sum(a_i d_i / n_i) "
         "/ sum(b_i c_i / n_i), next to the naive pooled OR from "
         "the collapsed table — the stratification-adjusted "
         "estimator that remains consistent under sparse strata "
         "and is THE number to quote when q_simpson_paradox flags "
         "confounding (q_odds_ratio reports per-group ORs; MH "
         "pools them correctly). One combinable (stratum, 2x2) "
         "cell agg over the fact join; each stratum's ad/n and "
         "bc/n terms quantize the 1e-8 grid ->DECIMAL before the "
         "cross-stratum sums; both ORs are single closed forms.",
    tags=["stats", "join", "agg"],
)
def q_mantel_haenszel(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    exposed = col("l_discount") >= 0.05
    ret = col("l_returnflag") == "R"
    cells = (
        li.join(o, col("l_orderkey") == col("o_orderkey"))
        .groupBy(col("o_orderpriority").alias("stratum"))
        .agg(
            F.count(F.when(exposed & ret, 1)).alias("a"),
            F.count(F.when(exposed & ~ret, 1)).alias("b"),
            F.count(F.when(~exposed & ret, 1)).alias("c"),
            F.count(F.when(~exposed & ~ret, 1)).alias("d"),
        )
    )
    n = col("a") + col("b") + col("c") + col("d")
    num = F.floor(
        col("a").cast("double") * col("d") / n * F.lit(1e8) + F.lit(0.5)
    ).cast("decimal(28,0)")
    den = F.floor(
        col("b").cast("double") * col("c") / n * F.lit(1e8) + F.lit(0.5)
    ).cast("decimal(28,0)")
    return cells.agg(
        F.count("*").cast("long").alias("n_strata"),
        ((F.sum(num).cast("double") / F.lit(1e8))
            / (F.sum(den).cast("double") / F.lit(1e8))).alias("or_mh"),
        (F.sum("a").cast("double") * F.sum("d")
            / (F.sum("b").cast("double") * F.sum("c"))).alias("or_pooled_naive"),
    )


@q(
    "q_meta_heterogeneity",
    oracle=_CELLS_SQL + """
    , studies AS (
      SELECT stratum,
             LN((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))) AS lor,
             1.0 / (1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                    + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)) AS w
      FROM cells
    ), pooled AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(CAST(FLOOR((w * lor) * 1e10 + 0.5) / 1e10 AS DECIMAL(28,10)))
                  AS DOUBLE)
               / CAST(SUM(CAST(FLOOR((w) * 1e10 + 0.5) / 1e10 AS DECIMAL(28,10)))
                      AS DOUBLE) AS mu
      FROM studies
    ), qstat AS (
      SELECT p.k, p.mu,
             CAST(SUM(CAST(FLOOR((s.w * POWER(s.lor - p.mu, 2)) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(28,10))) AS DOUBLE) AS q
      FROM studies s, pooled p GROUP BY p.k, p.mu
    )
    SELECT CAST(k AS BIGINT) AS n_strata,
           (EXP(mu)) AS pooled_or_fixed,
           (q) AS cochran_q,
           (GREATEST((q - (k - 1)) / q, 0)) AS i_squared,
           q > 9.487729 AS heterogeneous_5pct
    FROM qstat
    """,
    desc="Meta-analytic heterogeneity over the stratum odds ratios: "
         "each priority stratum's log OR (add-0.5 continuity "
         "correction) is a 'study' with inverse-variance weight; "
         "the fixed-effect pooled OR, Cochran's Q = sum w(lor - "
         "mu)^2 against chi-square(k-1) (5% critical 9.487729), and "
         "I^2 = max((Q-(k-1))/Q, 0) — the meta-analysis triple that "
         "decides whether ONE common effect exists before anyone "
         "quotes q_mantel_haenszel's pooled number (high I^2 means "
         "report strata separately). Cells are exact integers; "
         "weights, weighted log ORs and Q terms quantize "
         "the 1e-10 grid ->DECIMAL before every cross-stratum sum; all "
         "outputs are single closed forms.",
    tags=["stats", "join", "agg", "cross"],
)
def q_meta_heterogeneity(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    exposed = col("l_discount") >= 0.05
    ret = col("l_returnflag") == "R"
    cells = (
        li.join(o, col("l_orderkey") == col("o_orderkey"))
        .groupBy(col("o_orderpriority").alias("stratum"))
        .agg(
            F.count(F.when(exposed & ret, 1)).alias("a"),
            F.count(F.when(exposed & ~ret, 1)).alias("b"),
            F.count(F.when(~exposed & ret, 1)).alias("c"),
            F.count(F.when(~exposed & ~ret, 1)).alias("d"),
        )
    )
    a5 = col("a") + 0.5
    b5 = col("b") + 0.5
    c5 = col("c") + 0.5
    d5 = col("d") + 0.5
    lor = F.log(a5 * d5 / (b5 * c5))
    w = 1.0 / (1.0 / a5 + 1.0 / b5 + 1.0 / c5 + 1.0 / d5)
    studies = cells.select("stratum", lor.alias("lor"), w.alias("w"))
    pooled = studies.agg(
        F.count("*").alias("k"),
        (
            F.sum((dfloor((col("w") * col("lor")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)"))
            .cast("double")
            / F.sum((dfloor((col("w")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)"))
            .cast("double")
        ).alias("mu"),
    )
    qstat = studies.crossJoin(broadcast(pooled)).groupBy("k", "mu").agg(
        F.sum(
            (dfloor((col("w") * F.pow(col("lor") - col("mu"), 2)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
            .cast("decimal(28,10)")
        ).cast("double").alias("q")
    )
    i2 = F.greatest((col("q") - (col("k") - 1)) / col("q"), F.lit(0.0))
    return qstat.select(
        col("k").cast("long").alias("n_strata"),
        (F.exp(col("mu"))).alias("pooled_or_fixed"),
        (col("q")).alias("cochran_q"),
        (i2).alias("i_squared"),
        (col("q") > 9.487729).alias("heterogeneous_5pct"),
    )
