"""Sixty-eighth-wave query inventory: feature screening — the
DECISION-STUMP split finder (per candidate feature, the exact
Gini-optimal single threshold for predicting returns: the 1-node
tree every gradient-boosting / feature-importance pipeline begins
with, computed from distinct-value histograms + cumulative windows
rather than per-cut rescans) and the ETA-SQUARED feature scan
(variance-explained of each leading embedding dimension by the
label: the one-way-ANOVA effect size as a target-leakage /
feature-relevance screen — the multi-class generalization of a
point-biserial correlation scan).

Determinism discipline: all class counts are exact integers and
Gini terms exact integer-ratio closed forms evaluated per distinct
cut; cut selection orders by (impurity, cut) on identical doubles;
eta^2 uses the 1e-8 grid ->DECIMAL component sums per (dim, label) so
between/total sums of squares are order-free; every output rate is
one closing double.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_stump_split",
    oracle="""
    WITH feats AS (
      SELECT f.feature, f.v,
             (l.l_returnflag = 'R') AS pos
      FROM lineitem l, LATERAL (VALUES
        ('discount', CAST(FLOOR((l.l_discount * 100) + 0.5) AS BIGINT)),
        ('quantity', CAST(l.l_quantity AS BIGINT)),
        ('tax',      CAST(FLOOR((l.l_tax * 100) + 0.5) AS BIGINT))
      ) AS f(feature, v)
    ), hist AS (
      SELECT feature, v,
             COUNT(*) AS n, COUNT(*) FILTER (WHERE pos) AS k
      FROM feats GROUP BY feature, v
    ), tot AS (
      SELECT feature, SUM(n) AS nt, SUM(k) AS kt
      FROM hist GROUP BY feature
    ), cum AS (
      SELECT h.feature, h.v,
             SUM(h.n) OVER (PARTITION BY h.feature ORDER BY h.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             SUM(h.k) OVER (PARTITION BY h.feature ORDER BY h.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kl,
             t.nt, t.kt
      FROM hist h JOIN tot t ON h.feature = t.feature
    ), splits AS (
      SELECT feature, v AS cut, nt, kt,
             (CAST(nl AS DOUBLE) / nt)
               * (1 - POWER(CAST(kl AS DOUBLE) / nl, 2)
                    - POWER(1 - CAST(kl AS DOUBLE) / nl, 2))
             + (CAST(nt - nl AS DOUBLE) / nt)
               * (1 - POWER(CAST(kt - kl AS DOUBLE) / (nt - nl), 2)
                    - POWER(1 - CAST(kt - kl AS DOUBLE) / (nt - nl), 2))
               AS gini_after
      FROM cum WHERE nl < nt
    ), best AS (
      SELECT feature, cut, nt, kt, gini_after,
             ROW_NUMBER() OVER (PARTITION BY feature
                                ORDER BY gini_after, cut) AS rnk
      FROM splits
    )
    SELECT feature, CAST(cut AS BIGINT) AS best_cut,
           (1 - POWER(CAST(kt AS DOUBLE) / nt, 2)
                   - POWER(1 - CAST(kt AS DOUBLE) / nt, 2))
             AS gini_before,
           (gini_after) AS gini_after,
           (1 - POWER(CAST(kt AS DOUBLE) / nt, 2)
                   - POWER(1 - CAST(kt AS DOUBLE) / nt, 2)
                 - gini_after) AS gini_gain
    FROM best WHERE rnk = 1 ORDER BY feature
    """,
    desc="Decision-stump split finder for 'is the line item "
         "returned': per candidate feature (discount, quantity, tax "
         "— integerized exactly), the Gini-optimal threshold "
         "x <= cut with before/after impurity and the gain — the "
         "1-node tree that anchors every boosting pipeline and "
         "feature-importance ranking. Each feature collapses to a "
         "distinct-value class histogram (combinable agg); ONE "
         "cumulative window over the tiny histogram prices every "
         "cut simultaneously (no per-cut rescan: left counts are "
         "prefix sums, right counts are complements); the argmin "
         "orders by (impurity, cut) so ties are deterministic. All "
         "counts exact integers; each impurity is one closed-form "
         "double over them.",
    tags=["stats", "window", "agg"],
)
def q_stump_split(spark, sf_dir):
    from pyspark.sql import Window

    li = tables.load(spark, sf_dir, "lineitem")
    feats = li.select(
        F.explode(
            F.array(
                F.struct(
                    lit("discount").alias("feature"),
                    dfloor((col("l_discount") * 100) + F.lit(0.5)).cast("long").alias("v"),
                ),
                F.struct(
                    lit("quantity").alias("feature"),
                    col("l_quantity").cast("long").alias("v"),
                ),
                F.struct(
                    lit("tax").alias("feature"),
                    dfloor((col("l_tax") * 100) + F.lit(0.5)).cast("long").alias("v"),
                ),
            )
        ).alias("f"),
        (col("l_returnflag") == "R").alias("pos"),
    ).select(col("f.feature").alias("feature"), col("f.v").alias("v"), "pos")
    hist = feats.groupBy("feature", "v").agg(
        F.count("*").alias("n"), F.count(F.when(col("pos"), 1)).alias("k")
    )
    tot = hist.groupBy(col("feature").alias("ft")).agg(
        F.sum("n").alias("nt"), F.sum("k").alias("kt")
    )
    w_cum = (
        Window.partitionBy("feature").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        hist.withColumn("nl", F.sum("n").over(w_cum))
        .withColumn("kl", F.sum("k").over(w_cum))
        .join(broadcast(tot), col("feature") == col("ft"))
    )

    def gini(kc, nc):
        p = kc.cast("double") / nc
        return 1 - F.pow(p, 2) - F.pow(1 - p, 2)

    nl, kl, nt, kt = col("nl"), col("kl"), col("nt"), col("kt")
    gini_after = (
        nl.cast("double") / nt * gini(kl, nl)
        + (nt - nl).cast("double") / nt * gini(kt - kl, nt - nl)
    )
    splits = cum.filter(nl < nt).select(
        "feature", col("v").alias("cut"), "nt", "kt",
        gini_after.alias("gini_after"),
    )
    w_best = Window.partitionBy("feature").orderBy("gini_after", "cut")
    best = splits.withColumn("rnk", F.row_number().over(w_best)).filter(
        col("rnk") == 1
    )
    gini_before = gini(col("kt"), col("nt"))
    return best.select(
        "feature",
        col("cut").cast("long").alias("best_cut"),
        (gini_before).alias("gini_before"),
        (col("gini_after")).alias("gini_after"),
        (gini_before - col("gini_after")).alias("gini_gain"),
    ).orderBy("feature")


@q(
    "q_eta2_scan",
    oracle="""
    WITH comps AS (
      SELECT label, generate_subscripts(v, 1) AS dim,
             CAST(FLOOR((unnest(v)) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS x
      FROM (SELECT label,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  y -> FLOOR((y) * 1e6 + 0.5) / 1e6) AS v
            FROM embeddings)
    ), grp AS (
      SELECT dim, label, COUNT(*) AS n,
             SUM(x) AS s,
             SUM(CAST(FLOOR((CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 1e12 + 0.5) / 1e12
                      AS DECIMAL(38,12))) AS ss
      FROM comps WHERE dim <= 8 GROUP BY dim, label
    ), agg AS (
      SELECT dim, SUM(n) AS n,
             CAST(SUM(s) AS DOUBLE) AS s,
             CAST(SUM(ss) AS DOUBLE) AS ss,
             CAST(SUM(CAST(FLOOR((CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(38,10))) AS DOUBLE) AS sb_raw
      FROM grp GROUP BY dim
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           ((sb_raw - s * s / n) / (ss - s * s / n)) AS eta2
    FROM agg ORDER BY dim
    """,
    desc="Eta-squared feature scan: for each of the 8 leading "
         "embedding dimensions, the fraction of its variance "
         "explained by the label (SS_between/SS_total, the one-way "
         "ANOVA effect size) — the target-"
         "leakage / feature-relevance screen run before training: "
         "eta^2 near 1 on a raw feature is leakage, near 0 (as the "
         "synthetic labels produce) means the dimension carries no "
         "class signal — the per-dimension refinement of "
         "q_label_separation's global verdict. Components quantize "
         "the 1e-8 grid ->DECIMAL(28,8); per-(dim,label) moment sums are "
         "exact decimals that ADD exactly into the per-dim totals; "
         "each group's s^2/n term quantizes before the cross-label "
         "sum. One narrow explode + two stacked combinable aggs "
         "over at most 8 x n_labels rows.",
    tags=["vector", "stats", "agg"],
)
def q_eta2_scan(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    comps = emb.select(
        "label",
        F.posexplode(
            F.transform(col("embedding"), lambda y: (dfloor((y.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)))
        ).alias("dim0", "y"),
    ).select(
        "label",
        (col("dim0") + 1).alias("dim"),
        (dfloor((col("y")) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)").alias("x"),
    ).filter(col("dim") <= 8)
    xd = col("x").cast("double")
    grp = comps.groupBy("dim", "label").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum((dfloor((xd * xd) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)")).alias("ss"),
    )
    sd = col("s").cast("double")
    agg = grp.groupBy("dim").agg(
        F.sum("n").alias("n"),
        F.sum("s").cast("double").alias("s"),
        F.sum("ss").cast("double").alias("ss"),
        F.sum(
            (dfloor((sd * sd / col("n")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(38,10)")
        ).cast("double").alias("sb_raw"),
    )
    grand = col("s") * col("s") / col("n")
    eta2 = (col("sb_raw") - grand) / (col("ss") - grand)
    return agg.select(
        col("dim").cast("int").alias("dim"),
        (eta2).alias("eta2"),
    ).orderBy("dim")
