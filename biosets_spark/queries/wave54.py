"""Fifty-fourth-wave query inventory: ML-evaluation closure — the
THRESHOLD SWEEP (precision/recall/F1 at each score decile: the
operating-point table that turns q_auc_roc's single ranking number
into a deployable cutoff choice) and the CALIBRATION reliability
curve with honest TRAIN/TEST separation (per-bin predicted-vs-
observed rates where the 'model' is fit on the md5-held 80% and
evaluated on the unseen 20% — the check that a score's probabilities
mean what they say, which AUC cannot see).

Determinism discipline: thresholds are EXACT percentiles of integer
cents (both engines interpolate the same integer-valued doubles);
fold membership is the portable md5 gate; every rate is an exact
integer-count ratio; suffix sums over the 9-row threshold table come
from a range self-join (tagged range), not an empty-partition window.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_threshold_sweep",
    oracle="""
    WITH scored AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c,
             (o_orderpriority = '1-URGENT') AS pos
      FROM orders
    ), cuts AS (
      SELECT unnest(quantile_cont(CAST(c AS DOUBLE),
                                  [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]))
               AS thr,
             unnest([1,2,3,4,5,6,7,8,9]) AS k
      FROM scored
    ), counted AS (
      SELECT k, thr,
             (SELECT COUNT(*) FILTER (WHERE pos AND c > thr)
              FROM scored) AS tp,
             (SELECT COUNT(*) FILTER (WHERE (NOT pos) AND c > thr)
              FROM scored) AS fp,
             (SELECT COUNT(*) FILTER (WHERE pos) FROM scored) AS p
      FROM cuts
    )
    SELECT k AS decile, (thr) AS threshold_cents,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           (CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0)) AS precision,
           (CAST(tp AS DOUBLE) / p) AS recall,
           (2.0 * tp / NULLIF(tp + fp + p, 0)) AS f1
    FROM counted ORDER BY k
    """,
    desc="Threshold sweep for 'total price predicts urgent': at each "
         "score decile, precision, recall and F1 of classifying "
         "orders above the cut as urgent — the operating-point table "
         "that turns q_auc_roc's single ranking scalar into an "
         "actual deployable cutoff (pick the row meeting the recall "
         "SLO, read off its precision). Thresholds are exact "
         "percentiles of integer cents; TP/FP per cut come from "
         "binning every row ONCE against the broadcast 9-cut array "
         "and suffix-summing the bin counts (oracle mirrors with "
         "per-cut filters over the same integers) — one data scan, "
         "not nine. F1 uses the 2TP/(2TP+FP+FN) identity = "
         "2tp/(tp+fp+P). Rates are exact integer ratios.",
    tags=["stats", "agg", "range", "cross"],
)
def q_threshold_sweep(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    scored = orders.select(
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c"),
        (col("o_orderpriority") == "1-URGENT").alias("pos"),
    )
    qs = [i / 10 for i in range(1, 10)]
    cuts = scored.agg(
        F.expr(
            "percentile(cast(c as double), array(0.1,0.2,0.3,0.4,0.5,"
            "0.6,0.7,0.8,0.9))"
        ).alias("thrs"),
        F.count(F.when(col("pos"), 1)).alias("p"),
    ).select(
        F.posexplode("thrs").alias("k0", "thr"), "p"
    ).select((col("k0") + 1).alias("k"), "thr", "p")
    # bin every row once against the broadcast cut list: bin = number
    # of cuts strictly below c = how many thresholds this row clears.
    # A decile whose threshold equals the max score produces NO rows
    # here (nothing clears it), so the 9-row cuts table is the spine
    # and the counts left-join onto it with tp/fp coalesced to 0 —
    # the oracle's scalar-subquery form always emits all 9 deciles.
    binned = (
        scored.crossJoin(broadcast(cuts.select("k", "thr")))
        .filter(col("c") > col("thr"))
        .groupBy("k")
        .agg(
            F.count(F.when(col("pos"), 1)).alias("tp"),
            F.count(F.when(~col("pos"), 1)).alias("fp"),
        )
    )
    out = cuts.join(binned, "k", "left").select(
        "k", "thr", "p",
        F.coalesce(col("tp"), lit(0)).alias("tp"),
        F.coalesce(col("fp"), lit(0)).alias("fp"),
    )
    return out.select(
        col("k").alias("decile"),
        (col("thr")).alias("threshold_cents"),
        col("tp").cast("long").alias("tp"),
        col("fp").cast("long").alias("fp"),
        (col("tp").cast("double")
            / F.nullif((col("tp") + col("fp")).cast("double"), lit(0.0))).alias("precision"),
        (col("tp").cast("double") / col("p")).alias("recall"),
        (2.0 * col("tp")
            / F.nullif((col("tp") + col("fp") + col("p")).cast("double"),
                       lit(0.0))).alias("f1"),
    ).orderBy("decile")


_GATE = "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 5"


@q(
    "q_calibration_bins",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c,
             (o_orderpriority = '1-URGENT') AS pos,
             {_GATE} AS fold
      FROM orders
    ), cuts AS (
      SELECT quantile_cont(CAST(c AS DOUBLE),
                           [0.25, 0.5, 0.75]) AS thrs
      FROM scored WHERE fold <> 0
    ), binned AS (
      SELECT s.fold, s.pos,
             CASE WHEN s.c <= thrs[1] THEN 0
                  WHEN s.c <= thrs[2] THEN 1
                  WHEN s.c <= thrs[3] THEN 2 ELSE 3 END AS bin
      FROM scored s, cuts
    ), train_rate AS (
      SELECT bin, CAST(COUNT(*) FILTER (WHERE pos) AS DOUBLE) / COUNT(*)
               AS p_hat
      FROM binned WHERE fold <> 0 GROUP BY bin
    ), test AS (
      SELECT bin, COUNT(*) AS n_test,
             CAST(COUNT(*) FILTER (WHERE pos) AS DOUBLE) / COUNT(*)
               AS observed
      FROM binned WHERE fold = 0 GROUP BY bin
    )
    SELECT t.bin AS score_bin, CAST(t.n_test AS BIGINT) AS n_test,
           (tr.p_hat) AS predicted_rate,
           (t.observed) AS observed_rate,
           (t.observed - tr.p_hat) AS calibration_gap
    FROM test t JOIN train_rate tr ON t.bin = tr.bin
    ORDER BY t.bin
    """,
    desc="Calibration reliability curve with honest train/test "
         "separation: a histogram 'model' (urgent rate per "
         "price-quartile bin) is FIT on the md5-held 80% and "
         "evaluated on the unseen 20% — per bin, the predicted rate, "
         "the observed test rate, and the calibration gap (near zero "
         "= the probabilities mean what they say; systematic sign = "
         "over/under-confidence). AUC cannot see miscalibration — a "
         "perfectly-ranked score can still lie about probabilities; "
         "this is the companion check. Quartile cuts are exact "
         "train-fold percentiles of integer cents; fold membership "
         "is the portable md5 gate; all rates are exact integer "
         "ratios; the cut array broadcasts (tagged cross).",
    tags=["stats", "agg", "cross"],
)
def q_calibration_bins(spark, sf_dir):
    from ..operators.dedup import portable_hash60

    orders = tables.load(spark, sf_dir, "orders")
    scored = orders.select(
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c"),
        (col("o_orderpriority") == "1-URGENT").alias("pos"),
        F.pmod(portable_hash60(col("o_orderkey").cast("string")), lit(5))
        .alias("fold"),
    )
    cuts = scored.filter(col("fold") != 0).agg(
        F.expr(
            "percentile(cast(c as double), array(0.25, 0.5, 0.75))"
        ).alias("thrs")
    )
    binned = scored.crossJoin(broadcast(cuts)).select(
        "fold", "pos",
        F.when(col("c") <= col("thrs")[0], 0)
        .when(col("c") <= col("thrs")[1], 1)
        .when(col("c") <= col("thrs")[2], 2)
        .otherwise(3).alias("bin"),
    )
    train_rate = (
        binned.filter(col("fold") != 0)
        .groupBy("bin")
        .agg(
            (F.count(F.when(col("pos"), 1)).cast("double") / F.count("*"))
            .alias("p_hat")
        )
    )
    test = (
        binned.filter(col("fold") == 0)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_test"),
            (F.count(F.when(col("pos"), 1)).cast("double") / F.count("*"))
            .alias("observed"),
        )
    )
    return (
        test.join(broadcast(train_rate), "bin")
        .select(
            col("bin").alias("score_bin"),
            col("n_test").cast("long").alias("n_test"),
            (col("p_hat")).alias("predicted_rate"),
            (col("observed")).alias("observed_rate"),
            (col("observed") - col("p_hat"))
            .alias("calibration_gap"),
        )
        .orderBy("score_bin")
    )
