"""Fifty-seventh-wave query inventory: association effect size and
pricing forensics — bias-corrected CRAMER'S V (the 0-to-1 strength
scalar for a categorical association: q_chi2_assoc says 'not random',
q_mutual_information gives nats, V gives the normalized magnitude
reviewers actually compare across tables, with the Bergsma-Wicher
small-sample correction) and the ROUND-PRICE BIAS audit (are order
totals clustered on .00/.50/.99 cent endings beyond chance? — the
pricing-psychology / fabricated-data forensic that complements
q_benford_digits' leading-digit test with a trailing-digit test).

Determinism discipline: all cell counts are exact integers; each
chi-square term is one closed-form double over exact integers,
quantized the 1e-10 grid ->DECIMAL before the cross-cell sum; cent endings
come from integer modulus, never float rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_cramers_v",
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
    ), terms AS (
      SELECT big_n,
             CAST(FLOOR((POWER(nij - CAST(ni AS DOUBLE) * nj / big_n, 2)
                        / (CAST(ni AS DOUBLE) * nj / big_n)) * 1e10 + 0.5) / 1e10
                  AS DECIMAL(38,10)) AS t
      FROM marg
    ), dims AS (
      SELECT COUNT(DISTINCT seg) AS r, COUNT(DISTINCT nat) AS c FROM cells
    ), agg AS (
      SELECT MAX(big_n) AS n, CAST(SUM(t) AS DOUBLE) AS chi2,
             MAX(d.r) AS r, MAX(d.c) AS c
      FROM terms, dims d
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(r AS BIGINT) AS n_segments, CAST(c AS BIGINT) AS n_nations,
           (chi2) AS chi2,
           (SQRT(chi2 / (n * LEAST(r - 1, c - 1)))) AS cramers_v,
           (SQRT(
             GREATEST(chi2 / n - (CAST(r AS DOUBLE) - 1) * (c - 1) / (n - 1),
                      0)
             / LEAST(r - (CAST(r AS DOUBLE) - 1) * (r - 1) / (n - 1) - 1,
                     c - (CAST(c AS DOUBLE) - 1) * (c - 1) / (n - 1) - 1)
           )) AS cramers_v_corrected
    FROM agg
    """,
    desc="Bias-corrected Cramer's V for market segment x nation over "
         "customers: the 0-1 association-strength scalar "
         "(q_chi2_assoc's significance and q_mutual_information's "
         "nats, normalized so tables of different shapes compare), "
         "with the Bergsma-Wicher correction that removes the "
         "positive bias plain V shows on finite samples (plain V "
         "also reported; corrected <= plain always). The fact table "
         "collapses in one 125-cell count agg; margins are window "
         "sums over that tiny cell table; each chi-square term "
         "quantizes the 1e-10 grid ->DECIMAL before the cross-cell sum "
         "so no accumulation order exists.",
    tags=["stats", "join", "agg", "cross"],
)
def q_cramers_v(spark, sf_dir):
    from pyspark.sql import Window

    cust = tables.load(spark, sf_dir, "customer")
    nation = tables.load(spark, sf_dir, "nation")
    cells = (
        cust.join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .groupBy(col("c_mktsegment").alias("seg"), col("n_name").alias("nat"))
        .agg(F.count("*").alias("nij"))
    )
    tot = cells.agg(
        F.sum("nij").alias("big_n"),
        F.countDistinct("seg").alias("r"),
        F.countDistinct("nat").alias("c"),
    )
    marg = cells.select(
        "nij",
        F.sum("nij").over(Window.partitionBy("seg")).alias("ni"),
        F.sum("nij").over(Window.partitionBy("nat")).alias("nj"),
    ).crossJoin(broadcast(tot))
    e = col("ni").cast("double") * col("nj") / col("big_n")
    terms = marg.select(
        "big_n", "r", "c",
        (dfloor((F.pow(col("nij") - e, 2) / e) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
        .cast("decimal(38,10)").alias("t"),
    )
    agg = terms.groupBy("big_n", "r", "c").agg(
        F.sum("t").cast("double").alias("chi2")
    )
    nd = col("big_n").cast("double")
    rd = col("r").cast("double")
    cd = col("c").cast("double")
    phi2 = col("chi2") / nd
    phi2c = F.greatest(
        phi2 - (rd - 1) * (cd - 1) / (nd - 1), F.lit(0.0)
    )
    rc = rd - (rd - 1) * (rd - 1) / (nd - 1)
    cc = cd - (cd - 1) * (cd - 1) / (nd - 1)
    return agg.select(
        col("big_n").cast("long").alias("n_rows"),
        col("r").cast("long").alias("n_segments"),
        col("c").cast("long").alias("n_nations"),
        (col("chi2")).alias("chi2"),
        (F.sqrt(col("chi2") / (nd * F.least(rd - 1, cd - 1))))
        .alias("cramers_v"),
        (F.sqrt(phi2c / F.least(rc - 1, cc - 1)))
        .alias("cramers_v_corrected"),
    )


@q(
    "q_round_price_bias",
    oracle="""
    WITH endings AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) % 100 AS cents_end
      FROM orders
    ), classed AS (
      SELECT CASE WHEN cents_end = 0 THEN '.00'
                  WHEN cents_end = 50 THEN '.50'
                  WHEN cents_end = 99 THEN '.99'
                  ELSE 'other' END AS ending,
             CASE WHEN cents_end IN (0, 50, 99) THEN 1 ELSE 97 END
               AS n_slots,
             COUNT(*) AS n
      FROM endings GROUP BY 1, 2
    ), tot AS (SELECT SUM(n) AS big_n FROM classed)
    SELECT ending, CAST(SUM(n) AS BIGINT) AS n_orders,
           (CAST(SUM(n) AS DOUBLE) / MAX(t.big_n)) AS share,
           ((CAST(SUM(n) AS DOUBLE) / MAX(t.big_n))
                 / (CAST(MAX(n_slots) AS DOUBLE) / 100))
             AS bias_vs_uniform
    FROM classed, tot t
    GROUP BY ending ORDER BY ending
    """,
    desc="Round-price trailing-digit forensic: the share of order "
         "totals ending in .00, .50, .99 cents vs everything else, "
         "each with its bias factor against the uniform baseline "
         "(its slot count / 100) — psychological pricing shows up "
         "as .99/.00 spikes, fabricated or unit-converted data as "
         "a flat or wrongly-spiked profile; the trailing-digit "
         "complement to q_benford_digits' leading-digit test "
         "(fraudsters who learn Benford usually forget the "
         "endings). Integer modulus on exact cents, one combinable "
         "4-group agg + a 1-row total broadcast (tagged cross).",
    tags=["stats", "agg", "cross"],
)
def q_round_price_bias(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    cents_end = (
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long") % 100
    ).alias("cents_end")
    classed = (
        orders.select(cents_end)
        .select(
            F.when(col("cents_end") == 0, ".00")
            .when(col("cents_end") == 50, ".50")
            .when(col("cents_end") == 99, ".99")
            .otherwise("other").alias("ending"),
            F.when(col("cents_end").isin(0, 50, 99), 1)
            .otherwise(97).alias("n_slots"),
        )
        .groupBy("ending", "n_slots")
        .agg(F.count("*").alias("n"))
    )
    tot = classed.agg(F.sum("n").alias("big_n"))
    return (
        classed.crossJoin(broadcast(tot))
        .groupBy("ending")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            (F.sum("n").cast("double") / F.max("big_n"))
            .alias("share"),
            ((F.sum("n").cast("double") / F.max("big_n"))
                / (F.max("n_slots").cast("double") / 100)).alias("bias_vs_uniform"),
        )
        .orderBy("ending")
    )
