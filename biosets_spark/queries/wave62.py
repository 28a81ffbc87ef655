"""Sixty-second-wave query inventory: aggregation-bias and recency —
the SIMPSON'S-PARADOX detector (does the pooled discount->return
association reverse inside every order-priority stratum? The
aggregation-bias audit that q_stratified_effect's adjusted estimate
silently corrects — this query makes the reversal itself visible,
which is what a reviewer needs to distrust any pooled number) and
RECENCY-WEIGHTED customer value (exponential half-life decay of
order value per market segment — the 'current book of business'
number that plain lifetime totals overstate for segments whose
activity is old; complements q_cohort_ltv's forward curves with a
backward-looking decayed stock).

Determinism discipline: all rates are exact integer-count ratios;
per-order decay terms exp(-age*ln2/half_life)*price are one
closed-form double each, quantized the 1e-6 grid ->DECIMAL(28,6) before
the only cross-row sums; ln 2 is a shared literal; ages are exact
integer day diffs from the corpus max date.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

_LN2 = 0.6931471805599453
_HALF_LIFE_DAYS = 180


@q(
    "q_simpson_paradox",
    oracle="""
    WITH cells AS (
      SELECT o.o_orderpriority AS stratum,
             (l.l_discount >= 0.05) AS exposed,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE l.l_returnflag = 'R') AS k
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), strata AS (
      SELECT stratum,
             CAST(SUM(k) FILTER (WHERE exposed) AS DOUBLE)
               / SUM(n) FILTER (WHERE exposed)
             - CAST(SUM(k) FILTER (WHERE NOT exposed) AS DOUBLE)
               / SUM(n) FILTER (WHERE NOT exposed) AS diff
      FROM cells GROUP BY stratum
    ), pooled AS (
      SELECT CAST(SUM(k) FILTER (WHERE exposed) AS DOUBLE)
               / SUM(n) FILTER (WHERE exposed)
             - CAST(SUM(k) FILTER (WHERE NOT exposed) AS DOUBLE)
               / SUM(n) FILTER (WHERE NOT exposed) AS pooled_diff
      FROM cells
    )
    SELECT FLOOR((p.pooled_diff) * 1e6 + 0.5) / 1e6 AS pooled_diff,
           CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(COUNT(*) FILTER (WHERE SIGN(s.diff) = -SIGN(p.pooled_diff)
                                 AND s.diff <> 0) AS BIGINT) AS n_reversed,
           (MIN(s.diff)) AS min_stratum_diff,
           (MAX(s.diff)) AS max_stratum_diff,
           COUNT(*) FILTER (WHERE SIGN(s.diff) = -SIGN(p.pooled_diff)
                            AND s.diff <> 0) = COUNT(*) AS full_reversal
    FROM strata s, pooled p
    GROUP BY p.pooled_diff
    """,
    desc="Simpson's-paradox audit of the discount->return association: "
         "the pooled return-rate difference (high vs low discount) "
         "next to the same difference inside every order-priority "
         "stratum, counting strata whose sign OPPOSES the pooled sign "
         "and flagging full reversal — the aggregation bias that "
         "makes any pooled rate comparison untrustworthy when "
         "exposure correlates with stratum mix (q_stratified_effect "
         "reports the corrected estimate; this query shows whether "
         "the correction changes the story). Every rate is an exact "
         "integer-count ratio from ONE combinable (stratum, exposed) "
         "cell agg over the fact join; the paradox logic runs on a "
         "10-row cell table.",
    tags=["stats", "join", "agg", "cross"],
)
def q_simpson_paradox(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    cells = (
        li.join(o, col("l_orderkey") == col("o_orderkey"))
        .groupBy(
            col("o_orderpriority").alias("stratum"),
            (col("l_discount") >= 0.05).alias("exposed"),
        )
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(col("l_returnflag") == "R", 1)).alias("k"),
        )
    )

    def rate_diff(g):
        ek = F.sum(F.when(col("exposed"), col("k")))
        en = F.sum(F.when(col("exposed"), col("n")))
        uk = F.sum(F.when(~col("exposed"), col("k")))
        un = F.sum(F.when(~col("exposed"), col("n")))
        return (ek.cast("double") / en - uk.cast("double") / un)

    strata = cells.groupBy("stratum").agg(rate_diff(None).alias("diff"))
    pooled = cells.agg(rate_diff(None).alias("pooled_diff"))
    j = strata.crossJoin(broadcast(pooled))
    reversed_ = (F.signum(col("diff")) == -F.signum(col("pooled_diff"))) & (
        col("diff") != 0
    )
    return j.groupBy("pooled_diff").agg(
        (dfloor((F.first("pooled_diff")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("pd"),
        F.count("*").cast("long").alias("n_strata"),
        F.count(F.when(reversed_, 1)).cast("long").alias("n_reversed"),
        (F.min("diff")).alias("min_stratum_diff"),
        (F.max("diff")).alias("max_stratum_diff"),
        (F.count(F.when(reversed_, 1)) == F.count("*")).alias("full_reversal"),
    ).select(
        col("pd").alias("pooled_diff"), "n_strata", "n_reversed",
        "min_stratum_diff", "max_stratum_diff", "full_reversal",
    )


@q(
    "q_recency_value",
    oracle=f"""
    WITH ref AS (SELECT MAX(o_orderdate) AS d0 FROM orders),
    terms AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents,
             CAST(FLOOR((EXP(-date_diff('day', o.o_orderdate, r.d0)
                            * {_LN2} / {_HALF_LIFE_DAYS})
                        * o.o_totalprice) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6)) AS dv
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      CROSS JOIN ref r
    )
    SELECT seg AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(cents) AS DOUBLE) / 100 AS DOUBLE) AS lifetime_value,
           CAST(SUM(dv) AS DOUBLE) AS decayed_value,
           (CAST(SUM(dv) AS DOUBLE)
                 / (CAST(SUM(cents) AS DOUBLE) / 100)) AS recency_ratio
    FROM terms GROUP BY seg ORDER BY seg
    """,
    desc="Recency-weighted order value per market segment: each "
         "order's value decayed by exp(-age * ln2 / 180d) from the "
         "corpus max date (half-life 180 days), against the plain "
         "lifetime total — recency_ratio near 1 means the segment's "
         "book of business is current, near 0 means its value is "
         "historical; the backward-looking stock complement to "
         "q_cohort_ltv's forward curves and q_rfm_segments' discrete "
         "recency bins. Ages are exact integer day diffs; each decay "
         "term is ONE closed-form double quantized the 1e-6 grid ->"
         "DECIMAL(28,6) before the per-segment sum (order-free); "
         "lifetime totals stay exact integer cents. One fact scan, "
         "broadcast customer-dim join, 1-row ref-date broadcast "
         "(tagged cross).",
    tags=["stats", "join", "agg", "cross"],
)
def q_recency_value(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    ref = o.agg(F.max("o_orderdate").alias("d0"))
    age = F.datediff(col("d0"), col("o_orderdate"))
    dv = (dfloor((F.exp(-age * lit(_LN2) / lit(_HALF_LIFE_DAYS)) * col("o_totalprice")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(28,6)")
    terms = (
        o.join(broadcast(c.select("c_custkey", "c_mktsegment")),
               col("o_custkey") == col("c_custkey"))
        .crossJoin(broadcast(ref))
        .select(
            col("c_mktsegment").alias("seg"),
            dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
            dv.alias("dv"),
        )
    )
    return (
        terms.groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.sum("cents").cast("double") / 100).alias("lifetime_value"),
            F.sum("dv").cast("double").alias("decayed_value"),
            (F.sum("dv").cast("double")
                / (F.sum("cents").cast("double") / 100)).alias("recency_ratio"),
        )
        .select(
            col("seg").alias("c_mktsegment"), "n_orders",
            "lifetime_value", "decayed_value", "recency_ratio",
        )
        .orderBy("c_mktsegment")
    )
