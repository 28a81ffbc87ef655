"""Ninety-sixth-wave query inventory: partial pooling and design
effects — EMPIRICAL-BAYES SHRINKAGE of segment mean order values
(method-of-moments between-group variance tau^2, per-group weight
w = tau^2/(tau^2 + s^2/n), shrunk mean = w*raw + (1-w)*grand: the
partial-pooling estimator that beats every raw per-group mean in
aggregate MSE — small noisy segments borrow strength, big segments
keep their data; the principled version of the ad-hoc flooring
dashboards do to small-cell numbers) and KISH'S EFFECTIVE SAMPLE
SIZE of the temperature-weighted corpus mix (ESS = (sum w)^2 /
sum w^2 over per-document mixture weights: the design-effect number
that says how many EFFECTIVE documents a weighted corpus is worth —
q_mix_temperature picks the weights, Kish prices them).

Determinism discipline: all cents are exact integers with DECIMAL
moment sums; per-group variance terms and weights quantize
ROUND->DECIMAL before cross-group sums; mixture weights are the
exact q_mix_temperature construction (n^0.7 quantized) spread to
documents; every output is one closing closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_eb_shrinkage",
    oracle="""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), grp AS (
      SELECT seg, COUNT(*) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) AS s2
      FROM vals GROUP BY seg
    ), stats AS (
      SELECT seg, n, s1 / n AS m,
             (s2 - s1 * s1 / n) / (n - 1) / n AS se2
      FROM grp
    ), tot AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(CAST(FLOOR((m) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*) AS grand,
             CAST(SUM(CAST(FLOOR((se2) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*) AS mean_se2
      FROM stats
    ), tau AS (
      SELECT t.k, t.grand, t.mean_se2,
             GREATEST(
               CAST(SUM(CAST(FLOOR((POWER(s.m - t.grand, 2)) * 1e6 + 0.5) / 1e6
                             AS DECIMAL(38,6))) AS DOUBLE) / (t.k - 1)
               - t.mean_se2, 0) AS tau2
      FROM stats s, tot t GROUP BY t.k, t.grand, t.mean_se2
    )
    SELECT s.seg AS c_mktsegment,
           CAST(s.n AS BIGINT) AS n_orders,
           (s.m / 100) AS raw_mean,
           (t.tau2 / (t.tau2 + s.se2)) AS shrink_weight,
           ((t.tau2 / (t.tau2 + s.se2) * s.m
                  + (1 - t.tau2 / (t.tau2 + s.se2)) * t.grand) / 100)
             AS shrunk_mean
    FROM stats s, tau t ORDER BY s.seg
    """,
    desc="Empirical-Bayes shrinkage of segment mean order values: "
         "method-of-moments between-group variance tau^2 = "
         "max(var of group means - mean within-group se^2, 0), "
         "per-group weight w = tau^2/(tau^2 + se_g^2), shrunk mean "
         "= w*raw + (1-w)*grand — the partial-pooling estimator "
         "that dominates raw per-group means in total MSE (Stein): "
         "noisy small segments borrow strength from the ensemble "
         "while precise big ones keep their own data, and the "
         "weight column SHOWS how much each borrowed. With five "
         "large segments the weights sit near 1 (the audit's "
         "honest reading: shrinkage matters when cells are small). "
         "Exact decimal moments per group; group means, se^2 and "
         "squared deviations quantize the 1e-6 grid ->DECIMAL before "
         "cross-group sums; every output is one closed form.",
    tags=["stats", "join", "agg", "cross"],
)
def q_eb_shrinkage(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        col("o_custkey") == col("c_custkey"),
    ).select(
        col("c_mktsegment").alias("seg"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
    )
    cd = col("cents").cast("decimal(38,0)")
    grp = vals.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(cd).cast("double").alias("s1"),
        F.sum(cd * col("cents")).cast("double").alias("s2"),
    )
    nd = col("n").cast("double")
    m = col("s1") / nd
    # try_divide: a 1-order segment has no sample variance (n-1 = 0);
    # its se2, weight, and shrunk mean degrade to NULL, matching the
    # oracle's x/0 = NULL (both engines' greatest() skips NULLs, so
    # tau2 still clamps at 0)
    se2 = F.try_divide(col("s2") - col("s1") * col("s1") / nd, nd - 1) / nd
    stats = grp.select("seg", "n", m.alias("m"), se2.alias("se2"))
    tot = stats.agg(
        F.count("*").alias("k"),
        (F.sum((dfloor((col("m")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(28,6)")).cast("double")
         / F.count("*")).alias("grand"),
        (F.sum((dfloor((col("se2")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(28,6)")).cast("double")
         / F.count("*")).alias("mean_se2"),
    )
    tau = stats.crossJoin(broadcast(tot)).groupBy(
        "k", "grand", "mean_se2"
    ).agg(
        F.greatest(
            F.try_divide(
                F.sum(
                    (dfloor((F.pow(col("m") - col("grand"), 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                    .cast("decimal(38,6)")
                ).cast("double"), F.max("k") - 1) - F.max("mean_se2"),
            F.lit(0.0),
        ).alias("tau2")
    )
    j = stats.crossJoin(broadcast(tau))
    w = F.try_divide(col("tau2"), col("tau2") + col("se2"))
    return j.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("n_orders"),
        (col("m") / 100).alias("raw_mean"),
        (w).alias("shrink_weight"),
        ((w * col("m") + (1 - w) * col("grand")) / 100)
        .alias("shrunk_mean"),
    ).orderBy("c_mktsegment")


@q(
    "q_kish_ess",
    oracle="""
    WITH src AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), wq AS (
      SELECT source, n,
             CAST(FLOOR((POWER(CAST(n AS DOUBLE), 0.7)) * 1e8 + 0.5) / 1e8
                  AS DECIMAL(24,8)) AS w
      FROM src
    ), per_doc AS (
      SELECT source, n, CAST(w AS DOUBLE) / n AS wd FROM wq
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           (POWER(CAST(SUM(CAST(FLOOR((wd * n) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)))
                            AS DOUBLE), 2)
                 / CAST(SUM(CAST(FLOOR((wd * wd * n) * 1e10 + 0.5) / 1e10
                                 AS DECIMAL(28,10))) AS DOUBLE))
             AS kish_ess,
           (POWER(CAST(SUM(CAST(FLOOR((wd * n) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)))
                            AS DOUBLE), 2)
                 / CAST(SUM(CAST(FLOOR((wd * wd * n) * 1e10 + 0.5) / 1e10
                                 AS DECIMAL(28,10))) AS DOUBLE)
                 / SUM(n)) AS ess_fraction
    FROM per_doc
    """,
    desc="Kish's effective sample size of the temperature-weighted "
         "corpus (per-document weight = source n^0.7 / n, the "
         "q_mix_temperature construction): ESS = (sum w)^2 / "
         "sum w^2 over documents — the design-effect number that "
         "says how many EFFECTIVE documents the weighted corpus is "
         "worth (ess_fraction < 1 is the statistical price of "
         "up-weighting rare sources; q_mix_temperature picks the "
         "weights, Kish prices them — the same identity family as "
         "q_jain_fairness, applied to sampling weights). Source "
         "counts are exact; the n^0.7 weight quantizes to "
         "DECIMAL(24,8) exactly as q_mix_temperature does; per-"
         "source w and w^2 masses quantize ROUND->DECIMAL before "
         "the corpus sums; both outputs are closed forms.",
    tags=["text", "stats", "agg"],
)
def q_kish_ess(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("source")
    src = docs.groupBy("source").agg(F.count("*").alias("n"))
    w = (
        (dfloor((F.pow(col("n").cast("double"), F.lit(0.7))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8))
        .cast("decimal(24,8)")
    )
    per_src = src.select(
        "n", (w.cast("double") / col("n")).alias("wd")
    )
    sw = F.sum(
        (dfloor((col("wd") * col("n")) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    ).cast("double")
    sw2 = F.sum(
        (dfloor((col("wd") * col("wd") * col("n")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")
    ).cast("double")
    return per_src.agg(
        F.sum("n").cast("long").alias("n_docs"),
        (F.pow(sw, 2) / sw2).alias("kish_ess"),
        (F.pow(sw, 2) / sw2 / F.sum("n")).alias("ess_fraction"),
    )
