"""Fortieth-wave query inventory: model-evaluation and coverage
statistics — exact ROC AUC (the ranking-quality metric every binary
classifier ships with, computed exactly rather than by trapezoid
approximation over sampled thresholds) and Good-Turing frequency-of-
frequencies (the unseen-mass estimate that tells a corpus builder how
much vocabulary the next shard will introduce).

AUC is U/(n1*n2) of the Mann-Whitney statistic, so it reuses wave-34's
scalable ranking: distinct-value histogram, two-level prefix sum
(in-bucket partitioned window + broadcast bucket offsets), exact odd
integer midranks. No sampled thresholds, no trapezoid error — the
exact probability a random positive outscores a random negative, ties
at half credit.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from ..operators import ranking
from . import dfloor, q


@q(
    "q_auc_roc",
    oracle="""
    WITH hist AS (
      SELECT o_orderstatus AS st,
             CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS v,
             CAST(FLOOR(o_totalprice / 20000) AS BIGINT) AS bkt,
             COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS np,
             COUNT(*) AS nt
      FROM orders GROUP BY 1, 2, 3
    ), in_bkt AS (
      SELECT *, COALESCE(SUM(nt) OVER (
               PARTITION BY st, bkt ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_in
      FROM hist
    ), bkt_off AS (
      SELECT st, bkt, COALESCE(SUM(bn) OVER (
               PARTITION BY st ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM (SELECT st, bkt, SUM(nt) AS bn FROM hist GROUP BY st, bkt)
    ), agg AS (
      SELECT i.st, SUM(i.np) AS n_pos, SUM(i.nt - i.np) AS n_neg,
             CAST(SUM(CAST(i.np AS DECIMAL(38,0))
                      * (2 * (i.cum_in + o.off) + i.nt + 1))
                  AS DECIMAL(38,0)) AS r2p
      FROM in_bkt i JOIN bkt_off o ON i.st = o.st AND i.bkt = o.bkt
      GROUP BY i.st
    )
    SELECT st AS o_orderstatus,
           CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           ((CAST(r2p - n_pos * (n_pos + 1) AS DOUBLE) / 2)
                 / (CAST(n_pos AS DOUBLE) * n_neg)) AS auc
    FROM agg ORDER BY st
    """,
    desc="Exact ROC AUC per order status for 'does total price "
         "predict urgent priority': the probability a random positive "
         "outscores a random negative, ties at half credit — computed "
         "EXACTLY as U/(n1*n2) via wave-34's scalable ranking "
         "(distinct-cent histogram, two-level prefix sum with "
         "partitioned windows + broadcast bucket offsets, exact odd "
         "integer midranks, DECIMAL(38,0) rank sums) rather than the "
         "usual sampled-threshold trapezoid whose error depends on "
         "the grid. AUC ~ 0.5 exposes a useless feature before "
         "anyone trains on it. Same 100 TB plan as q_mann_whitney: "
         "combinable histogram agg, no empty-partition window.",
    tags=["stats", "window", "agg"],
)
def q_auc_roc(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    hist = (
        orders.groupBy(
            col("o_orderstatus").alias("st"),
            dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("v"),
            F.floor(col("o_totalprice") / 20000).cast("long").alias("bkt"),
        )
        .agg(
            F.count(F.when(col("o_orderpriority") == "1-URGENT", 1)).alias("np"),
            F.count("*").alias("nt"),
        )
    )
    agg = (
        ranking.doubled_midranks(hist, ["st"])
        .groupBy("st")
        .agg(
            F.sum("np").alias("n_pos"),
            F.sum(col("nt") - col("np")).alias("n_neg"),
            F.sum(col("np").cast("decimal(38,0)") * col("mr2"))
            .cast("decimal(38,0)").alias("r2p"),
        )
    )
    u = (col("r2p") - col("n_pos") * (col("n_pos") + 1)).cast("double") / 2
    return agg.select(
        col("st").alias("o_orderstatus"),
        col("n_pos").cast("long").alias("n_pos"),
        col("n_neg").cast("long").alias("n_neg"),
        # try_divide: a status with no positives (or no negatives) has
        # an undefined AUC -> NULL, matching the oracle's x/0 = NULL
        (F.try_divide(u, col("n_pos").cast("double") * col("n_neg")))
        .alias("auc"),
    ).orderBy("o_orderstatus")


from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_good_turing",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS_SQL}) AS t FROM documents
    ), freq AS (
      SELECT t, COUNT(*) AS c FROM tok GROUP BY t
    ), fof AS (
      SELECT c, COUNT(*) AS n_types FROM freq GROUP BY c
    ), tot AS (
      SELECT SUM(c * n_types) AS n_tokens,
             SUM(n_types) AS vocab,
             COALESCE(SUM(n_types) FILTER (WHERE c = 1), 0) AS n1,
             COALESCE(SUM(n_types) FILTER (WHERE c = 2), 0) AS n2
      FROM fof
    )
    SELECT f.c AS freq, CAST(f.n_types AS BIGINT) AS n_types,
           (CAST(f.n_types AS DOUBLE) * f.c / t.n_tokens)
             AS mass_share,
           (CAST(t.n1 AS DOUBLE) / t.n_tokens) AS p_unseen_gt,
           (CASE WHEN t.n1 > 0
                      THEN 2.0 * t.n2 / t.n1 ELSE 0 END) AS r1_star
    FROM fof f, tot t
    ORDER BY f.c
    LIMIT 20
    """,
    desc="Good-Turing frequency-of-frequencies over the corpus "
         "vocabulary: for each observed frequency c, how many types "
         "occur exactly c times and what token-mass share they hold, "
         "plus the Good-Turing unseen-probability estimate N1/N (the "
         "mass the NEXT shard's novel vocabulary will claim — the "
         "number a corpus builder checks before deciding more "
         "crawling is worth it) and the smoothed count r1* = 2*N2/N1 "
         "for singletons. Two stacked combinable aggs (token counts, "
         "then count-of-counts: the second input is the VOCABULARY, "
         "already orders of magnitude smaller) + a 1-row total "
         "broadcast (tagged cross). Low-frequency rows only "
         "(LIMIT 20 with c ordered): the head of the FoF table is "
         "where all smoothing decisions live.",
    tags=["text", "agg", "cross"],
)
def q_good_turing(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("text")
    freq = (
        docs.select(F.explode(tokens(col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    fof = freq.groupBy("c").agg(F.count("*").alias("n_types"))
    tot = fof.agg(
        F.sum(col("c") * col("n_types")).alias("n_tokens"),
        F.sum("n_types").alias("vocab"),
        F.coalesce(
            F.sum(F.when(col("c") == 1, col("n_types"))), F.lit(0)
        ).alias("n1"),
        F.coalesce(
            F.sum(F.when(col("c") == 2, col("n_types"))), F.lit(0)
        ).alias("n2"),
    )
    return (
        fof.crossJoin(broadcast(tot))
        .select(
            col("c").alias("freq"),
            col("n_types").cast("long").alias("n_types"),
            (col("n_types").cast("double") * col("c") / col("n_tokens")).alias("mass_share"),
            (col("n1").cast("double") / col("n_tokens"))
            .alias("p_unseen_gt"),
            (F.when(col("n1") > 0,
                       2.0 * col("n2").cast("double") / col("n1"))
                .otherwise(F.lit(0.0))).alias("r1_star"),
        )
        .orderBy("freq")
        .limit(20)
    )
