"""Forty-sixth-wave query inventory: confounder-aware dependence and
market structure — PARTIAL correlation (the correlation between
quantity and line revenue with the discount's influence removed: the
first confounder check before any causal claim, and the step
q_corr_exact/q_spearman_corr can't do alone) and the
HERFINDAHL-HIRSCHMAN concentration index of supplier revenue per
nation (the antitrust-grade market-structure scalar, with its
1/HHI effective-competitor count — q_gini_revenue's inequality twin
from the competition side).

Determinism discipline: all moment sums are DECIMAL(38,0) over exact
integer units (quantity units, price cents, discount basis points);
HHI is computed as sum(s_i^2)/S^2 from exact integer revenue cents —
no per-share division ever happens, so no quantization is needed at
all; each final statistic is one closed-form double, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_partial_correlation",
    oracle="""
    WITH units AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(FLOOR((l_extendedprice * 100) + 0.5) AS BIGINT) AS y,
             CAST(FLOOR((l_discount * 10000) + 0.5) AS BIGINT) AS z
      FROM lineitem
    ), mom AS (
      SELECT g, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DOUBLE) AS sz,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
             CAST(SUM(CAST(z AS DECIMAL(38,0)) * z) AS DOUBLE) AS szz,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * z) AS DOUBLE) AS sxz,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * z) AS DOUBLE) AS syz
      FROM units GROUP BY g
    ), r AS (
      SELECT g, n,
             (n * sxy - sx * sy)
               / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
             (n * sxz - sx * sz)
               / SQRT((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
             (n * syz - sy * sz)
               / SQRT((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz
      FROM mom
    )
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
           (rxy) AS r_qty_price,
           ((rxy - rxz * ryz)
                 / SQRT((1 - rxz * rxz) * (1 - ryz * ryz)))
             AS r_partial_given_discount
    FROM r ORDER BY g
    """,
    desc="Partial correlation of quantity and line revenue "
         "CONTROLLING FOR discount, per return flag: r_xy.z = "
         "(r_xy - r_xz*r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)) — the "
         "confounder check that says how much of the raw correlation "
         "(also reported) survives once the discount channel is "
         "removed, the first step from correlation toward any causal "
         "reading. All nine moment sums accumulate as DECIMAL(38,0) "
         "over exact integer units (quantity, cents, basis points) "
         "in ONE combinable agg per flag; the three Pearson r's and "
         "the partial formula are closed-form doubles at the end "
         "(r magnitudes are O(1), so no cancellation regime "
         "exists here, unlike q_jackknife_variance's).",
    tags=["stats", "agg"],
)
def q_partial_correlation(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    units = li.select(
        col("l_returnflag").alias("g"),
        col("l_quantity").cast("long").alias("x"),
        dfloor((col("l_extendedprice") * 100) + F.lit(0.5)).cast("long").alias("y"),
        dfloor((col("l_discount") * 10000) + F.lit(0.5)).cast("long").alias("z"),
    )

    def ds(a, b=None):
        c = col(a).cast(d38)
        return F.sum(c if b is None else c * col(b)).cast("double")

    mom = units.groupBy("g").agg(
        F.count("*").alias("n"),
        ds("x").alias("sx"), ds("y").alias("sy"), ds("z").alias("sz"),
        ds("x", "x").alias("sxx"), ds("y", "y").alias("syy"),
        ds("z", "z").alias("szz"), ds("x", "y").alias("sxy"),
        ds("x", "z").alias("sxz"), ds("y", "z").alias("syz"),
    )
    n = col("n").cast("double")

    def corr(sab, sa, sb, saa, sbb):
        # try_divide: a constant column in a group zeroes its variance
        # -> NULL correlation, matching the oracle's x/0 = NULL
        return F.try_divide(
            n * col(sab) - col(sa) * col(sb),
            F.sqrt(
                (n * col(saa) - col(sa) * col(sa))
                * (n * col(sbb) - col(sb) * col(sb))
            ),
        )

    r = mom.select(
        "g", "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return r.select(
        col("g").alias("l_returnflag"),
        col("n").cast("long").alias("n_rows"),
        (col("rxy")).alias("r_qty_price"),
        (F.try_divide(
                col("rxy") - col("rxz") * col("ryz"),
                F.sqrt((1 - col("rxz") * col("rxz"))
                       * (1 - col("ryz") * col("ryz"))))).alias("r_partial_given_discount"),
    ).orderBy("l_returnflag")


@q(
    "q_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT n.n_name,
             l.l_suppkey,
             SUM(CAST(FLOOR((l.l_extendedprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           (CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE)
                 / (CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                    * CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE))) AS hhi,
           ((CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                  * CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE))
                 / CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE)) AS effective_suppliers,
           (CAST(MAX(cents) AS DOUBLE)
                 / CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE))
             AS top_share
    FROM rev GROUP BY n_name ORDER BY n_name
    """,
    desc="Herfindahl-Hirschman concentration of supplier revenue per "
         "nation: HHI = sum of squared revenue shares (1/N = perfect "
         "competition, 1 = monopoly; antitrust flags ~0.25), its "
         "reciprocal as the EFFECTIVE number of same-size suppliers, "
         "and the largest single share — the market-structure panel, "
         "q_gini_revenue's competition-side twin. HHI is computed as "
         "sum(cents_i^2)/S^2 from exact integer revenue cents, so NO "
         "per-share division or quantization exists anywhere — the "
         "entire statistic is a ratio of two exact decimal sums. Two "
         "combinable aggs over the broadcast-dim star join; scan "
         "speed at any scale.",
    tags=["stats", "join", "agg"],
)
def q_hhi_concentration(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    sup = tables.load(spark, sf_dir, "supplier")
    nat = tables.load(spark, sf_dir, "nation")
    d38 = "decimal(38,0)"
    rev = (
        li.join(broadcast(sup), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") == col("n_nationkey"))
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(dfloor((col("l_extendedprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    s1 = F.sum(col("cents").cast(d38)).cast("double")
    s2 = F.sum(col("cents").cast(d38) * col("cents")).cast("double")
    return (
        rev.groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            (s2 / (s1 * s1)).alias("hhi"),
            ((s1 * s1) / s2).alias("effective_suppliers"),
            (F.max("cents").cast("double") / s1).alias("top_share"),
        )
        .orderBy("n_name")
    )
