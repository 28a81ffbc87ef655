"""Eighty-first-wave query inventory: classifier quality closure —
the MATTHEWS CORRELATION COEFFICIENT of the stopword English
detector (the single confusion-matrix scalar that stays honest
under class imbalance, where accuracy (q_mcnemar_paired reports it)
and F1 (q_threshold_sweep) both mislead; MCC = 0 for any trivial
constant classifier BY CONSTRUCTION) and the BRIER SCORE with
Murphy decomposition (for a price-derived pseudo-probability of
urgency: Brier = reliability - resolution + uncertainty over score
deciles — the PROPER-score split that says whether a score is bad
because it is MIScalibrated (fixable by remapping, see
q_calibration_bins) or because it cannot DISCRIMINATE (not
fixable); the decomposition identity is pinned by the test).

Determinism discipline: confusion cells are exact integers and MCC
one closed form; pseudo-probabilities are exact integer-cent ratios
against the broadcast max; per-row squared errors and per-bin terms
quantize ROUND->DECIMAL before their sums; bin assignment uses
FLOOR on identical doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_matthews_mcc",
    oracle="""
    WITH scored AS (
      SELECT (lang = 'en') AS y,
             (length(regexp_replace(text,
                '\\b(the|a|of|and|to|in|is|it|that|for)\\b', '', 'g'))
              < length(text)) AS p
      FROM documents
    ), cells AS (
      SELECT COUNT(*) FILTER (WHERE p AND y) AS tp,
             COUNT(*) FILTER (WHERE p AND NOT y) AS fp,
             COUNT(*) FILTER (WHERE NOT p AND y) AS fn,
             COUNT(*) FILTER (WHERE NOT p AND NOT y) AS tn
      FROM scored
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           ((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / SQRT((CAST(tp AS DOUBLE) + fp) * (tp + CAST(fn AS DOUBLE))
                        * (CAST(tn AS DOUBLE) + fp)
                        * (tn + CAST(fn AS DOUBLE)))) AS mcc,
           (CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn))
             AS accuracy
    FROM cells
    """,
    desc="Matthews correlation coefficient of the stopword English "
         "detector: (tp*tn - fp*fn)/sqrt((tp+fp)(tp+fn)(tn+fp)"
         "(tn+fn)) next to raw accuracy — the confusion scalar that "
         "stays honest under class imbalance (a constant 'not "
         "English' classifier scores high accuracy on a mostly-"
         "non-English corpus but MCC exactly 0), completing the "
         "eval family: q_cohens_kappa corrects agreement for "
         "chance, q_auc_roc ranks, MCC correlates. One combinable "
         "4-cell aggregate over pure JVM regex predicates; MCC is "
         "one closed form over exact integers.",
    tags=["text", "stats", "agg"],
)
def q_matthews_mcc(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("lang", "text")
    stop_re = r"\b(the|a|of|and|to|in|is|it|that|for)\b"
    p = F.length(F.regexp_replace(col("text"), stop_re, "")) < F.length("text")
    y = col("lang") == "en"
    cells = docs.agg(
        F.count(F.when(p & y, 1)).alias("tp"),
        F.count(F.when(p & ~y, 1)).alias("fp"),
        F.count(F.when(~p & y, 1)).alias("fn"),
        F.count(F.when(~p & ~y, 1)).alias("tn"),
    )
    tp = col("tp").cast("double")
    fp = col("fp").cast("double")
    fn = col("fn").cast("double")
    tn = col("tn").cast("double")
    mcc = (tp * tn - fp * fn) / F.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    return cells.select(
        col("tp").cast("long").alias("tp"),
        col("fp").cast("long").alias("fp"),
        col("fn").cast("long").alias("fn"),
        col("tn").cast("long").alias("tn"),
        (mcc).alias("mcc"),
        ((tp + tn) / (tp + fp + fn + tn)).alias("accuracy"),
    )


@q(
    "q_brier_decomposition",
    oracle="""
    WITH scored AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c,
             CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS y
      FROM orders
    ), mx AS (
      SELECT MAX(c) AS mc FROM scored
    ), probs AS (
      SELECT CAST(s.c AS DOUBLE) / m.mc AS p, s.y,
             LEAST(CAST(FLOOR(CAST(s.c AS DOUBLE) / m.mc * 10)
                        AS BIGINT), 9) AS bin
      FROM scored s, mx m
    ), bins AS (
      SELECT bin, COUNT(*) AS nb, SUM(y) AS yb,
             CAST(SUM(CAST(FLOOR((p) * 1e10 + 0.5) / 1e10 AS DECIMAL(28,10))) AS DOUBLE)
               / COUNT(*) AS pbar,
             CAST(SUM(y) AS DOUBLE) / COUNT(*) AS ybar
      FROM probs GROUP BY bin
    ), tot AS (
      SELECT SUM(nb) AS n,
             CAST(SUM(yb) AS DOUBLE) / SUM(nb) AS ybar_all
      FROM bins
    ), brier AS (
      SELECT CAST(SUM(CAST(FLOOR((POWER(p - y, 2)) * 1e10 + 0.5) / 1e10 AS DECIMAL(28,10)))
                  AS DOUBLE) / COUNT(*) AS bs
      FROM probs
    ), parts AS (
      SELECT CAST(SUM(CAST(FLOOR((nb * POWER(b.pbar - b.ybar, 2)) * 1e8 + 0.5) / 1e8
                           AS DECIMAL(38,8))) AS DOUBLE) / MAX(t.n) AS rel,
             CAST(SUM(CAST(FLOOR((nb * POWER(b.ybar - t.ybar_all, 2)) * 1e8 + 0.5) / 1e8
                           AS DECIMAL(38,8))) AS DOUBLE) / MAX(t.n) AS res,
             MAX(t.ybar_all) * (1 - MAX(t.ybar_all)) AS unc
      FROM bins b, tot t
    )
    SELECT (br.bs) AS brier_score,
           (p.rel) AS reliability,
           (p.res) AS resolution,
           (p.unc) AS uncertainty,
           (p.rel - p.res + p.unc) AS decomposed_sum
    FROM brier br, parts p
    """,
    desc="Brier score with Murphy decomposition for the price-derived "
         "pseudo-probability of urgency (p = cents / max cents, "
         "decile-binned): Brier = reliability - resolution + "
         "uncertainty — the proper-score split that separates "
         "MIScalibration (rel, fixable by remapping the score; "
         "q_calibration_bins shows the remap) from lack of "
         "DISCRIMINATION (res, not fixable), with the irreducible "
         "base-rate uncertainty. decomposed_sum is reported so the "
         "within-bin-exact identity is visible (binning makes it "
         "exact here because rel/res use the same bins). "
         "Probabilities are exact integer ratios; per-row and "
         "per-bin terms quantize ROUND->DECIMAL before sums; bins "
         "use FLOOR with a LEAST clamp for p = 1.",
    tags=["stats", "agg", "cross"],
)
def q_brier_decomposition(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    scored = orders.select(
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c"),
        (col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )
    mx = scored.agg(F.max("c").alias("mc"))
    p = col("c").cast("double") / col("mc")
    probs = scored.crossJoin(broadcast(mx)).select(
        p.alias("p"), "y",
        F.least(F.floor(p * 10).cast("long"), lit(9)).alias("bin"),
    )
    bins = probs.groupBy("bin").agg(
        F.count("*").alias("nb"),
        F.sum("y").alias("yb"),
        (F.sum((dfloor((col("p")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")).cast("double")
         / F.count("*")).alias("pbar"),
        (F.sum("y").cast("double") / F.count("*")).alias("ybar"),
    )
    tot = bins.agg(
        F.sum("nb").alias("n"),
        (F.sum("yb").cast("double") / F.sum("nb")).alias("ybar_all"),
    )
    brier = probs.agg(
        (F.sum((dfloor((F.pow(col("p") - col("y"), 2)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
               .cast("decimal(28,10)")).cast("double") / F.count("*"))
        .alias("bs")
    )
    parts = (
        bins.crossJoin(broadcast(tot))
        .agg(
            (F.sum((dfloor((col("nb") * F.pow(col("pbar") - col("ybar"), 2)) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8))
                   .cast("decimal(38,8)")).cast("double") / F.max("n"))
            .alias("rel"),
            (F.sum(
                (dfloor((col("nb") * F.pow(col("ybar") - col("ybar_all"), 2)) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8))
                .cast("decimal(38,8)")
            ).cast("double") / F.max("n")).alias("res"),
            (F.max("ybar_all") * (1 - F.max("ybar_all"))).alias("unc"),
        )
    )
    return brier.crossJoin(broadcast(parts)).select(
        (col("bs")).alias("brier_score"),
        (col("rel")).alias("reliability"),
        (col("res")).alias("resolution"),
        (col("unc")).alias("uncertainty"),
        (col("rel") - col("res") + col("unc"))
        .alias("decomposed_sum"),
    )
