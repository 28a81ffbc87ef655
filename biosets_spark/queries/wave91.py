"""Ninety-first-wave query inventory: operating points and
calibration testing — the YOUDEN-OPTIMAL CUTPOINT (the threshold
maximizing J = TPR - FPR over EVERY distinct score value, which is
simultaneously the two-sample Kolmogorov-Smirnov distance between
the positive and negative score distributions: q_threshold_sweep
prices nine fixed deciles, this finds THE optimal operating point
and the separation scalar in one sweep) and the HOSMER-LEMESHOW
test (the chi-square goodness-of-fit over calibration deciles that
turns q_calibration_bins' reliability TABLE and q_brier_decomposition's
reliability TERM into an actual hypothesis test with a critical
value).

Determinism discipline: scores are exact integer cents; the
threshold sweep uses bucketed cumulative windows + driver-side
bounded bucket offsets (no empty-partition window; the
q_average_precision construction over distinct values); argmax
orders by (J DESC, threshold); HL cell terms are closed forms over
exact counts quantized ROUND->DECIMAL before the 10-bin sum.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_youden_cutpoint",
    oracle="""
    WITH scored AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c,
             CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS y
      FROM orders
    ), tot AS (
      SELECT SUM(y) AS np, COUNT(*) - SUM(y) AS nn FROM scored
    ), dist AS (
      SELECT c, COUNT(*) AS n, SUM(y) AS k FROM scored GROUP BY c
    ), cdf AS (
      SELECT c,
             SUM(k) OVER (ORDER BY c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             SUM(n - k) OVER (ORDER BY c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
      FROM dist
    ), scoredj AS (
      SELECT c, tp, fp, t.np, t.nn,
             CAST(tp AS DOUBLE) / t.np - CAST(fp AS DOUBLE) / t.nn AS j
      FROM cdf, tot t
    ), best AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY j DESC, c) AS rnk FROM scoredj
    )
    SELECT (CAST(c AS DOUBLE) / 100) AS optimal_cut,
           (CAST(tp AS DOUBLE) / np) AS tpr_at_cut,
           (CAST(fp AS DOUBLE) / nn) AS fpr_at_cut,
           (j) AS youden_j,
           (j) AS ks_distance
    FROM best WHERE rnk = 1
    """,
    desc="Youden-optimal cutpoint for 'price predicts urgency': the "
         "threshold (classify >= cut as urgent) maximizing J = "
         "TPR - FPR over EVERY distinct score value — which equals "
         "the two-sample Kolmogorov-Smirnov distance between the "
         "positive and negative score distributions, so one sweep "
         "yields both THE operating point (q_threshold_sweep only "
         "prices nine fixed deciles) and the separation scalar. "
         "The sweep is a cumulative window over the distinct-cents "
         "histogram (descending); counts are exact integers and "
         "rates exact ratios; the argmax orders by (J DESC, "
         "threshold). NOTE the oracle's single window is over the "
         "collapsed distinct-value table; the Spark side uses the "
         "bucketed two-level construction with driver-side bounded "
         "offsets so no empty-partition window exists at any scale.",
    tags=["stats", "window", "agg", "cross"],
)
def q_youden_cutpoint(spark, sf_dir):
    from pyspark.sql import Window

    orders = tables.load(spark, sf_dir, "orders")
    scored = orders.select(
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c"),
        (col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )
    tot = scored.agg(
        F.sum("y").alias("np_"),
        (F.count("*") - F.sum("y")).alias("nn"),
    )
    dist = scored.groupBy("c").agg(
        F.count("*").alias("n"), F.sum("y").alias("k")
    ).withColumn("bkt", F.floor(-col("c") / 20000).cast("long"))
    w_in = (
        Window.partitionBy("bkt").orderBy(col("c").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bkt = dist.select(
        "c", "bkt",
        F.sum("k").over(w_in).alias("tp_in"),
        F.sum(col("n") - col("k")).over(w_in).alias("fp_in"),
    )
    bkt_rows = sorted(
        (r["bkt"], r["bk"], r["bf"])
        for r in dist.groupBy("bkt")
        .agg(F.sum("k").alias("bk"), F.sum(col("n") - col("k")).alias("bf"))
        .collect()
    )
    offs, k_run, f_run = [], 0, 0
    for bkt, bk, bf in bkt_rows:
        offs.append((bkt, k_run, f_run))
        k_run += bk
        f_run += bf
    bkt_off = spark.createDataFrame(
        offs, "bkt_o long, tp_off long, fp_off long"
    )
    cdf = in_bkt.join(broadcast(bkt_off), col("bkt") == col("bkt_o")).select(
        "c",
        (col("tp_in") + col("tp_off")).alias("tp"),
        (col("fp_in") + col("fp_off")).alias("fp"),
    )
    j = (
        cdf.crossJoin(broadcast(tot))
        .withColumn(
            "j",
            col("tp").cast("double") / col("np_")
            - col("fp").cast("double") / col("nn"),
        )
    )
    # the argmax itself: a TakeOrdered(1), not a window
    best = j.orderBy(col("j").desc(), "c").limit(1)
    return best.select(
        (col("c").cast("double") / 100).alias("optimal_cut"),
        (col("tp").cast("double") / col("np_")).alias("tpr_at_cut"),
        (col("fp").cast("double") / col("nn")).alias("fpr_at_cut"),
        (col("j")).alias("youden_j"),
        (col("j")).alias("ks_distance"),
    )


@q(
    "q_hosmer_lemeshow",
    oracle="""
    WITH scored AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c,
             CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS y
      FROM orders
    ), mx AS (SELECT MAX(c) AS mc FROM scored),
    probs AS (
      SELECT CAST(s.c AS DOUBLE) / m.mc AS p, s.y,
             LEAST(CAST(FLOOR(CAST(s.c AS DOUBLE) / m.mc * 10) AS BIGINT), 9)
               AS bin
      FROM scored s, mx m
    ), bins AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS o,
             CAST(SUM(CAST(FLOOR((p) * 1e10 + 0.5) / 1e10 AS DECIMAL(28,10))) AS DOUBLE) AS e
      FROM probs GROUP BY bin
    ), terms AS (
      SELECT CAST(FLOOR((POWER(o - e, 2)
                        / (e * (1 - e / n))) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS t
      FROM bins WHERE e > 0 AND e < n
    )
    SELECT CAST((SELECT COUNT(*) FROM bins) AS BIGINT) AS n_bins,
           (CAST(SUM(t) AS DOUBLE)) AS hl_chi2,
           CAST(SUM(t) AS DOUBLE) > 15.507313 AS reject_calibrated_5pct
    FROM terms
    """,
    desc="Hosmer-Lemeshow calibration test for the price-derived "
         "pseudo-probability of urgency: over the ten score-decile "
         "bins, HL = sum (O - E)^2 / (E (1 - E/n)) with O the "
         "observed urgent count and E the summed predicted "
         "probability — the chi-square(8) TEST (5% critical "
         "15.507313) that q_calibration_bins' reliability table and "
         "q_brier_decomposition's reliability term stop short of: "
         "it answers 'is the miscalibration statistically real or "
         "bin noise'. Probabilities are exact integer ratios; E "
         "sums the 1e-10 grid -quantized terms; each bin's HL term "
         "quantizes the 1e-8 grid ->DECIMAL before the 10-term sum; "
         "degenerate bins (E = 0 or E = n) drop by the standard "
         "convention.",
    tags=["stats", "agg", "cross"],
)
def q_hosmer_lemeshow(spark, sf_dir):
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
        F.count("*").alias("n"),
        F.sum("y").alias("o"),
        F.sum((dfloor((col("p")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")).cast("double")
        .alias("e"),
    )
    term = (dfloor((F.pow(col("o") - col("e"), 2) / (col("e") * (1 - col("e") / col("n")))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    n_bins = bins.agg(F.count("*").alias("n_bins"))
    hl = (
        bins.filter((col("e") > 0) & (col("e") < col("n")))
        .agg(F.sum(term).cast("double").alias("hl"))
    )
    return hl.crossJoin(broadcast(n_bins)).select(
        col("n_bins").cast("long").alias("n_bins"),
        (col("hl")).alias("hl_chi2"),
        (col("hl") > 15.507313).alias("reject_calibrated_5pct"),
    )
