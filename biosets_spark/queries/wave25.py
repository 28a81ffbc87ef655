"""Twenty-fifth-wave query inventory: ecology/omics diversity metrics
over composition-shaped data — per-sample alpha diversity (Shannon
entropy, Simpson index, Pielou evenness) and Bray-Curtis
dissimilarity between paired samples. The reference's metagenomics/
otu/asv experiment types (packaged_modules/metagenomics; features/
omics.py Abundance) exist exactly to feed these computations.

Determinism discipline (queries.py header): proportions are exact
integer ratios -> one double division each; entropy terms are 12-dec
rounded then decimal-summed; Bray-Curtis is ALL-INTEGER arithmetic
(sum |q1-q2| / sum (q1+q2)) with a single final division.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import dfloor, q


@q(
    "q_alpha_diversity",
    oracle="""
    WITH items AS (
      SELECT l_orderkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem WHERE l_orderkey <= 2000
      GROUP BY l_orderkey, l_partkey
    ), tot AS (
      SELECT l_orderkey, SUM(q) AS n, COUNT(*) AS richness
      FROM items GROUP BY l_orderkey
    ), terms AS (
      SELECT i.l_orderkey, t.richness,
             FLOOR((-(CAST(i.q AS DOUBLE) / t.n) * LN(CAST(i.q AS DOUBLE) / t.n)) * 1e12 + 0.5) / 1e12
               AS h_term,
             FLOOR((POWER(CAST(i.q AS DOUBLE) / t.n, 2)) * 1e12 + 0.5) / 1e12 AS d_term
      FROM items i JOIN tot t ON i.l_orderkey = t.l_orderkey
    )
    SELECT l_orderkey,
           CAST(MAX(richness) AS BIGINT) AS richness,
           (CAST(SUM(CAST(h_term AS DECIMAL(38,12))) AS DOUBLE)) AS shannon,
           (1.0 - CAST(SUM(CAST(d_term AS DECIMAL(38,12))) AS DOUBLE))
             AS simpson,
           (CASE WHEN MAX(richness) > 1
                      THEN CAST(SUM(CAST(h_term AS DECIMAL(38,12))) AS DOUBLE)
                           / LN(MAX(richness))
                      ELSE 0.0 END) AS evenness
    FROM terms GROUP BY l_orderkey HAVING MAX(richness) >= 3
    ORDER BY l_orderkey
    """,
    desc="Alpha diversity per composition (each order's part "
         "quantities stand in for one sample's OTU counts — the "
         "reference's metagenomics/otu/asv experiment types feed "
         "exactly this): Shannon entropy H = -sum p ln p, Simpson "
         "index 1 - sum p^2, and Pielou evenness H / ln(richness). "
         "Proportions are exact integer ratios; each per-feature term "
         "is 12-dec rounded then decimal-summed so the per-sample "
         "reduction is order-independent across engines. Two "
         "combinable aggs on the sample key and a join back — the "
         "whole metric sweep is one shuffle wide at any corpus size.",
    tags=["agg", "join", "omics"],
)
def q_alpha_diversity(spark, sf_dir):
    items = (
        tables.load(spark, sf_dir, "lineitem")
        .filter(col("l_orderkey") <= 2000)
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum(col("l_quantity").cast("long")).alias("q"))
    )
    tot = items.groupBy("l_orderkey").agg(
        F.sum("q").alias("n"), F.count("*").alias("richness")
    )
    p = col("q").cast("double") / col("n")
    terms = items.join(
        tot.select(col("l_orderkey").alias("tk"), "n", "richness"),
        col("l_orderkey") == col("tk"),
    ).select(
        "l_orderkey", "richness",
        (dfloor((-p * F.log(p)) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("h_term"),
        (dfloor((F.pow(p, 2)) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("d_term"),
    )
    h = F.sum("h_term").cast("double")
    return (
        terms.groupBy("l_orderkey")
        .agg(
            F.max("richness").alias("richness"),
            (h).alias("shannon"),
            (1.0 - F.sum("d_term").cast("double")).alias("simpson"),
            (F.when(F.max("richness") > 1, h / F.log(F.max("richness")))
                .otherwise(0.0)).alias("evenness"),
        )
        .filter(col("richness") >= 3)
        .orderBy("l_orderkey")
    )


@q(
    "q_bray_curtis",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_key
      FROM orders WHERE o_custkey <= 500
    ), pairs AS (
      SELECT o_custkey, prev_key AS k1, o_orderkey AS k2 FROM o
      WHERE prev_key IS NOT NULL
    ), q1 AS (
      SELECT p.o_custkey, p.k1, p.k2, l.l_partkey,
             SUM(CAST(l.l_quantity AS BIGINT)) AS q
      FROM pairs p JOIN lineitem l ON l.l_orderkey = p.k1
      GROUP BY p.o_custkey, p.k1, p.k2, l.l_partkey
    ), q2 AS (
      SELECT p.o_custkey, p.k1, p.k2, l.l_partkey,
             SUM(CAST(l.l_quantity AS BIGINT)) AS q
      FROM pairs p JOIN lineitem l ON l.l_orderkey = p.k2
      GROUP BY p.o_custkey, p.k1, p.k2, l.l_partkey
    ), merged AS (
      SELECT COALESCE(q1.k1, q2.k1) AS k1, COALESCE(q1.k2, q2.k2) AS k2,
             COALESCE(q1.o_custkey, q2.o_custkey) AS o_custkey,
             COALESCE(q1.q, 0) AS qa, COALESCE(q2.q, 0) AS qb
      FROM q1 FULL OUTER JOIN q2
        ON q1.k1 = q2.k1 AND q1.k2 = q2.k2 AND q1.l_partkey = q2.l_partkey
    )
    SELECT o_custkey, k1 AS order_a, k2 AS order_b,
           (CAST(SUM(ABS(qa - qb)) AS DOUBLE) / SUM(qa + qb)) AS bray_curtis
    FROM merged GROUP BY o_custkey, k1, k2
    ORDER BY o_custkey, order_a, order_b
    """,
    desc="Bray-Curtis dissimilarity between consecutive samples of "
         "the same subject (each customer's date-adjacent orders "
         "paired by a lag window — the longitudinal microbiome "
         "comparison shape): BC = sum|q_a - q_b| / sum(q_a + q_b) "
         "over the union of the two compositions' features, absent "
         "features as zero via the full-outer merge. ALL-integer "
         "arithmetic until one final division, so there is nothing "
         "to round across engines but the output itself. Pairing by "
         "lag keeps the pair count linear in samples (vs all-pairs "
         "quadratic); the per-pair merge is keyed on (pair, feature) "
         "and combinable.",
    tags=["window", "join", "agg", "omics"],
)
def q_bray_curtis(spark, sf_dir):
    o = (
        tables.load(spark, sf_dir, "orders")
        .filter(col("o_custkey") <= 500)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    pairs = (
        o.withColumn("prev_key", F.lag("o_orderkey").over(w))
        .filter(col("prev_key").isNotNull())
        .select("o_custkey", col("prev_key").alias("k1"), col("o_orderkey").alias("k2"))
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", col("l_quantity").cast("long").alias("lq")
    )

    def side(key):
        return (
            pairs.join(li, col(key) == col("l_orderkey"))
            .groupBy("o_custkey", "k1", "k2", "l_partkey")
            .agg(F.sum("lq").alias("q"))
        )

    q1 = side("k1").select(
        col("o_custkey").alias("c1"), col("k1").alias("a1"), col("k2").alias("b1"),
        col("l_partkey").alias("p1"), col("q").alias("qa"),
    )
    q2 = side("k2").select(
        col("o_custkey").alias("c2"), col("k1").alias("a2"), col("k2").alias("b2"),
        col("l_partkey").alias("p2"), col("q").alias("qb"),
    )
    merged = q1.join(
        q2,
        (col("a1") == col("a2")) & (col("b1") == col("b2")) & (col("p1") == col("p2")),
        "full_outer",
    ).select(
        F.coalesce("a1", "a2").alias("order_a"),
        F.coalesce("b1", "b2").alias("order_b"),
        F.coalesce("c1", "c2").alias("o_custkey"),
        F.coalesce("qa", F.lit(0)).alias("qa"),
        F.coalesce("qb", F.lit(0)).alias("qb"),
    )
    return (
        merged.groupBy("o_custkey", "order_a", "order_b")
        .agg(
            (F.sum(F.abs(col("qa") - col("qb"))).cast("double")
                / F.sum(col("qa") + col("qb"))).alias("bray_curtis")
        )
        .orderBy("o_custkey", "order_a", "order_b")
    )
