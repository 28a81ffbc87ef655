"""Ninety-seventh-wave query inventory: causal robustness — the
COVARIATE BALANCE table (standardized mean differences of quantity
and tax between high- and low-discount line items: |SMD| < 0.1 is
the conventional 'balanced' bar — the diagnostic every observational
comparison must pass BEFORE q_stratified_effect's adjusted estimate
or q_mantel_haenszel's pooled OR deserve belief) and the E-VALUE
(VanderWeele's sensitivity bound E = RR + sqrt(RR(RR-1)): how
strong an UNMEASURED confounder would have to be, on the risk-ratio
scale with both exposure and outcome, to explain the observed
discount->return association away entirely — the modern one-number
answer to 'but what about confounding you didn't adjust for').

Determinism discipline: all counts are exact integers; covariate
moments are DECIMAL-accumulated integer products (quantity as
integer units, tax as integer basis points); SMD and the E-value
are single closing closed forms; the risk ratio and its CI bound
use exact count ratios with the shared 1.959964 quantile.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_covariate_balance",
    oracle="""
    WITH feats AS (
      SELECT (l_discount >= 0.05) AS exposed, f.name,
             CAST(f.v AS BIGINT) AS v
      FROM lineitem, LATERAL (VALUES
        ('quantity', CAST(l_quantity AS BIGINT)),
        ('tax_bp',   CAST(FLOOR((l_tax * 10000) + 0.5) AS BIGINT))
      ) AS f(name, v)
    ), mom AS (
      SELECT name, exposed, COUNT(*) AS n,
             CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DOUBLE) AS s2
      FROM feats GROUP BY name, exposed
    ), stats AS (
      SELECT name, exposed, n, s1 / n AS m,
             (s2 - s1 * s1 / n) / (n - 1) AS var_
      FROM mom
    )
    SELECT e.name AS covariate,
           (e.m) AS mean_exposed,
           (u.m) AS mean_unexposed,
           ((e.m - u.m) / SQRT((e.var_ + u.var_) / 2)) AS smd,
           ABS((e.m - u.m) / SQRT((e.var_ + u.var_) / 2)) < 0.1
             AS balanced
    FROM stats e JOIN stats u
      ON e.name = u.name AND e.exposed AND NOT u.exposed
    ORDER BY e.name
    """,
    desc="Covariate balance between high- and low-discount line "
         "items: the standardized mean difference (m1 - m0) / "
         "sqrt((v1 + v0)/2) for quantity and tax, with the "
         "conventional |SMD| < 0.1 balanced flag — the diagnostic "
         "table every observational contrast must pass before "
         "q_stratified_effect's adjustment or q_mantel_haenszel's "
         "pooled OR deserve causal reading (imbalanced covariates "
         "mean the groups differ in MORE than the exposure). "
         "Covariates integerize exactly (units; tax in basis "
         "points); per-group moments are DECIMAL cross-products; "
         "SMD is one closed form per covariate over a 4-row "
         "moment table.",
    tags=["stats", "agg", "join"],
)
def q_covariate_balance(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    feats = li.select(
        (col("l_discount") >= 0.05).alias("exposed"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity").alias("name"),
                    col("l_quantity").cast("long").alias("v"),
                ),
                F.struct(
                    F.lit("tax_bp").alias("name"),
                    dfloor((col("l_tax") * 10000) + F.lit(0.5)).cast("long").alias("v"),
                ),
            )
        ).alias("f"),
    ).select("exposed", col("f.name").alias("name"), col("f.v").alias("v"))
    vd = col("v").cast("decimal(38,0)")
    mom = feats.groupBy("name", "exposed").agg(
        F.count("*").alias("n"),
        F.sum(vd).cast("double").alias("s1"),
        F.sum(vd * col("v")).cast("double").alias("s2"),
    )
    nd = col("n").cast("double")
    stats = mom.select(
        "name", "exposed",
        (col("s1") / nd).alias("m"),
        ((col("s2") - col("s1") * col("s1") / nd) / (nd - 1)).alias("var_"),
    )
    e = stats.filter(col("exposed")).select(
        col("name").alias("ne"), col("m").alias("m1"), col("var_").alias("v1")
    )
    u = stats.filter(~col("exposed")).select(
        col("name").alias("nu"), col("m").alias("m0"), col("var_").alias("v0")
    )
    j = e.join(u, col("ne") == col("nu"))
    smd = (col("m1") - col("m0")) / F.sqrt((col("v1") + col("v0")) / 2)
    return j.select(
        col("ne").alias("covariate"),
        (col("m1")).alias("mean_exposed"),
        (col("m0")).alias("mean_unexposed"),
        (smd).alias("smd"),
        (F.abs(smd) < 0.1).alias("balanced"),
    ).orderBy("covariate")


@q(
    "q_e_value",
    oracle="""
    WITH cells AS (
      SELECT COUNT(*) FILTER (WHERE l_discount >= 0.05
                              AND l_returnflag = 'R') AS a,
             COUNT(*) FILTER (WHERE l_discount >= 0.05
                              AND l_returnflag <> 'R') AS b,
             COUNT(*) FILTER (WHERE l_discount < 0.05
                              AND l_returnflag = 'R') AS c,
             COUNT(*) FILTER (WHERE l_discount < 0.05
                              AND l_returnflag <> 'R') AS d
      FROM lineitem
    ), rr AS (
      SELECT a, b, c, d,
             (CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d))
               AS rr,
             EXP(LN((CAST(a AS DOUBLE) / (a + b))
                    / (CAST(c AS DOUBLE) / (c + d)))
                 - 1.959964 * SQRT(1.0 / a - 1.0 / (a + b)
                                   + 1.0 / c - 1.0 / (c + d))) AS rr_lo
      FROM cells
    )
    SELECT (rr) AS risk_ratio,
           (rr_lo) AS rr_ci_lower,
           (CASE WHEN rr >= 1
                      THEN rr + SQRT(rr * (rr - 1))
                      ELSE 1 / rr + SQRT((1 / rr) * (1 / rr - 1)) END)
             AS e_value_point,
           (CASE WHEN rr_lo >= 1
                      THEN rr_lo + SQRT(rr_lo * (rr_lo - 1))
                      ELSE 1 END) AS e_value_ci
    FROM rr
    """,
    desc="VanderWeele's E-value for the discount->return risk ratio: "
         "E = RR + sqrt(RR(RR-1)) (inverted below 1) for the point "
         "estimate and its 95% lower bound — the minimum strength, "
         "on the risk-ratio scale with BOTH exposure and outcome, "
         "an unmeasured confounder would need to explain the "
         "association away entirely; an E-value CI bound of 1 means "
         "no sensitivity claim survives. The modern one-number "
         "answer to 'what about confounding you did not adjust "
         "for', completing the causal chain: q_covariate_balance "
         "checks the measured covariates, the E-value bounds the "
         "unmeasured ones. All cells exact integers; RR, its "
         "log-scale CI (shared 1.959964) and both E-values are "
         "single closed forms.",
    tags=["stats", "agg"],
)
def q_e_value(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    exposed = col("l_discount") >= 0.05
    ret = col("l_returnflag") == "R"
    cells = li.agg(
        F.count(F.when(exposed & ret, 1)).alias("a"),
        F.count(F.when(exposed & ~ret, 1)).alias("b"),
        F.count(F.when(~exposed & ret, 1)).alias("c"),
        F.count(F.when(~exposed & ~ret, 1)).alias("d"),
    )
    p1 = col("a").cast("double") / (col("a") + col("b"))
    p0 = col("c").cast("double") / (col("c") + col("d"))
    rr = p1 / p0
    se = F.sqrt(
        1.0 / col("a") - 1.0 / (col("a") + col("b"))
        + 1.0 / col("c") - 1.0 / (col("c") + col("d"))
    )
    rr_lo = F.exp(F.log(rr) - 1.959964 * se)
    ev_point = F.when(
        rr >= 1, rr + F.sqrt(rr * (rr - 1))
    ).otherwise(1 / rr + F.sqrt((1 / rr) * (1 / rr - 1)))
    ev_ci = F.when(
        rr_lo >= 1, rr_lo + F.sqrt(rr_lo * (rr_lo - 1))
    ).otherwise(F.lit(1.0))
    return cells.select(
        (rr).alias("risk_ratio"),
        (rr_lo).alias("rr_ci_lower"),
        (ev_point).alias("e_value_point"),
        (ev_ci).alias("e_value_ci"),
    )
