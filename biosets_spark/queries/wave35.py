"""Thirty-fifth-wave query inventory: information-theoretic data
audits — a Benford first-digit conformance test (the classic
fabricated-data / corrupted-feed detector for financial columns) and
exact mutual information between two categorical columns (the
dependence measure feature-selection pipelines rank columns by, the
continuous-strength companion to q_chi2_assoc's significance test).

Determinism discipline (queries.py header): digit extraction goes
through exact integer cents (no log10 on doubles near power-of-ten
boundaries); all counts are integers; doubles appear only in the final
closed-form log terms, rounded to 6 decimals on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ), tot AS (SELECT SUM(n) AS big_n FROM digits)
    SELECT digit, CAST(n AS BIGINT) AS n_orders,
           (CAST(n AS DOUBLE) / big_n) AS obs_share,
           (LOG10(1 + 1.0 / digit)) AS benford_share,
           (POWER(n - big_n * LOG10(1 + 1.0 / digit), 2)
                 / (big_n * LOG10(1 + 1.0 / digit))) AS chi2_term
    FROM digits, tot ORDER BY digit
    """,
    desc="Benford's-law first-digit audit of order totals — the "
         "fabricated-data / broken-feed detector auditors run on any "
         "financial column (a corrupted upstream join or synthetic "
         "padding shows up as a flat digit histogram long before "
         "row-level checks fire). The leading digit comes from EXACT "
         "integer cents rendered as a string — no log10/pow on "
         "doubles, so power-of-ten boundary values cannot flip digits "
         "between engines. One combinable 9-group count, a 1-row "
         "total broadcast back (deliberate 1-row nested-loop, tagged),"
         " and closed-form per-digit chi-square terms: scan-speed at "
         "any scale.",
    tags=["stats", "agg", "cross"],
)
def q_benford_digits(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    digits = (
        orders.select(
            F.substring(
                dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").cast("string"),
                1, 1,
            ).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = digits.agg(F.sum("n").alias("big_n"))
    exp_share = F.log10(1 + 1.0 / col("digit"))
    return (
        digits.crossJoin(broadcast(tot))
        .select(
            "digit",
            col("n").cast("long").alias("n_orders"),
            (col("n").cast("double") / col("big_n")).alias("obs_share"),
            (exp_share).alias("benford_share"),
            (F.pow(col("n") - col("big_n") * exp_share, 2)
                / (col("big_n") * exp_share)).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@q(
    "q_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS seg, n_name AS nat, COUNT(*) AS nij
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ), marg AS (
      SELECT seg, nat, nij,
             SUM(nij) OVER (PARTITION BY seg) AS ni,
             SUM(nij) OVER (PARTITION BY nat) AS nj,
             SUM(nij) OVER () AS big_n
      FROM cells
    )
    SELECT seg AS c_mktsegment,
           CAST(SUM(nij) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           (SUM(CAST(nij AS DOUBLE) / big_n
                     * LN(CAST(nij AS DOUBLE) * big_n
                          / (CAST(ni AS DOUBLE) * nj)))) AS mi_contrib
    FROM marg GROUP BY seg ORDER BY seg
    """,
    desc="Exact mutual information between market segment and nation "
         "over the customer table, reported as per-segment "
         "contributions (their sum is I(seg; nation) in nats) — the "
         "dependence-strength measure feature selection ranks "
         "categorical columns by, complementing q_chi2_assoc's "
         "significance test. The fact table collapses in ONE "
         "combinable (segment x nation) count agg (125 cells); all "
         "margins are window sums over that tiny cell table plus a "
         "deliberate 1-row grand-total broadcast (tagged cross); "
         "each term is a closed-form double over exact integer "
         "counts, rounded 6.",
    tags=["stats", "agg", "join", "cross"],
)
def q_mutual_information(spark, sf_dir):
    cust = tables.load(spark, sf_dir, "customer")
    nation = tables.load(spark, sf_dir, "nation")
    cells = (
        cust.join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .groupBy(col("c_mktsegment").alias("seg"), col("n_name").alias("nat"))
        .agg(F.count("*").alias("nij"))
    )
    tot = cells.agg(F.sum("nij").alias("big_n"))
    marg = cells.select(
        "seg", "nat", "nij",
        F.sum("nij").over(Window.partitionBy("seg")).alias("ni"),
        F.sum("nij").over(Window.partitionBy("nat")).alias("nj"),
    ).crossJoin(broadcast(tot))
    term = (
        col("nij").cast("double") / col("big_n")
        * F.log(col("nij").cast("double") * col("big_n")
                / (col("ni").cast("double") * col("nj")))
    )
    return (
        marg.groupBy("seg")
        .agg(
            F.sum("nij").cast("long").alias("n_customers"),
            F.count("*").cast("long").alias("n_nations"),
            (F.sum(term)).alias("mi_contrib"),
        )
        .withColumnRenamed("seg", "c_mktsegment")
        .orderBy("c_mktsegment")
    )
