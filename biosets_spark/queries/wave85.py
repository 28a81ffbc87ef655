"""Eighty-fifth-wave query inventory: ranking evaluation — AVERAGE
PRECISION (the exact area under the precision-recall curve for
'price ranks urgency': the imbalance-robust ranking metric where
q_auc_roc's ROC area is inflated by the large negative class; AP is
what retrieval and rare-event detection actually report) and
NDCG@100 (graded-relevance ranking quality of the top of the list
with log-position discounting — urgent orders are worth 2, high
priority 1 — against the ideal reordering; the metric that notices
WHERE in the head the relevant items sit, which AP's uniform
averaging does not).

Both use the two-level prefix-sum construction (price-bucket windows
+ broadcast bucket offsets — never a whole-table empty-partition
window) to get exact strict ranks under the deterministic
(cents DESC, orderkey) total order.

Determinism discipline: ranks are exact integers from bucketed
prefix sums; per-hit precision terms and per-position discount
terms quantize ROUND->DECIMAL before their sums; the ideal DCG
comes from exact grade counts joined to a literal 1..100 position
spine; every output is one closing ratio.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

_RANK_SQL = """
    WITH scored AS (
      SELECT o_orderkey AS k,
             CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c,
             CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS urgent,
             CAST(o_orderpriority = '2-HIGH' AS INTEGER) AS high
      FROM orders
    ), bucketed AS (
      SELECT k, c, urgent, high,
             CAST(FLOOR(-c / 20000.0) AS BIGINT) AS bkt
      FROM scored
    ), in_bkt AS (
      SELECT *,
             SUM(1) OVER (PARTITION BY bkt ORDER BY c DESC, k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_in,
             SUM(urgent) OVER (PARTITION BY bkt ORDER BY c DESC, k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y_in
      FROM bucketed
    ), bkt_off AS (
      SELECT bkt,
             COALESCE(SUM(bn) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_off,
             COALESCE(SUM(by_) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS y_off
      FROM (SELECT bkt, COUNT(*) AS bn, SUM(urgent) AS by_
            FROM bucketed GROUP BY bkt)
    ), ranked AS (
      SELECT i.k, i.c, i.urgent, i.high,
             i.n_in + o.n_off AS rnk,
             i.y_in + o.y_off AS cum_y
      FROM in_bkt i JOIN bkt_off o ON i.bkt = o.bkt
    )
"""


@q(
    "q_average_precision",
    oracle=_RANK_SQL + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(urgent) AS BIGINT) AS n_relevant,
           (CAST(SUM(CASE WHEN urgent = 1
                      THEN CAST(FLOOR((CAST(cum_y AS DOUBLE) / rnk) * 1e10 + 0.5) / 1e10
                                AS DECIMAL(28,10)) END) AS DOUBLE)
                 / SUM(urgent)) AS average_precision,
           (CAST(SUM(urgent) AS DOUBLE) / COUNT(*)) AS base_rate
    FROM ranked
    """,
    desc="Exact average precision of the price ranking for urgency: "
         "AP = mean over relevant items of precision-at-their-rank "
         "under the strict deterministic (cents DESC, orderkey) "
         "order — the PR-curve area that stays honest under class "
         "imbalance where q_auc_roc's ROC area is dominated by the "
         "negative class (AP equals the base rate for a random "
         "ranking, 1.0 for a perfect one). Ranks and cumulative "
         "relevant counts come from the two-level prefix-sum "
         "construction (price-bucket windows + broadcast bucket "
         "offsets — no whole-table window; the q_mann_whitney scale "
         "plan applied to strict ranks); each precision term "
         "quantizes the 1e-10 grid ->DECIMAL before the sum.",
    tags=["stats", "window", "agg"],
)
def q_average_precision(spark, sf_dir):
    from pyspark.sql import Window

    orders = tables.load(spark, sf_dir, "orders")
    scored = orders.select(
        col("o_orderkey").alias("k"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c"),
        (col("o_orderpriority") == "1-URGENT").cast("int").alias("urgent"),
    ).withColumn("bkt", F.floor(-col("c") / 20000).cast("long"))
    w_in = (
        Window.partitionBy("bkt").orderBy(col("c").desc(), "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bkt = scored.select(
        "k", "c", "urgent", "bkt",
        F.count("*").over(w_in).alias("n_in"),
        F.sum("urgent").over(w_in).alias("y_in"),
    )
    # bucket offsets: the per-bucket total table is bounded by the
    # VALUE RANGE (price span / bucket width), not the row count, so
    # the global prefix sum is a driver-side scan of a few thousand
    # rows broadcast back — no empty-partition-spec window anywhere
    bkt_rows = sorted(
        (r["bkt"], r["bn"], r["by_"])
        for r in scored.groupBy("bkt")
        .agg(F.count("*").alias("bn"), F.sum("urgent").alias("by_"))
        .collect()
    )
    offs, n_run, y_run = [], 0, 0
    for bkt, bn, by_ in bkt_rows:
        offs.append((bkt, n_run, y_run))
        n_run += bn
        y_run += by_
    bkt_off = spark.createDataFrame(
        offs, "bkt_o long, n_off long, y_off long"
    )
    ranked = in_bkt.join(broadcast(bkt_off), col("bkt") == col("bkt_o")).select(
        "urgent",
        (col("n_in") + col("n_off")).alias("rnk"),
        (col("y_in") + col("y_off")).alias("cum_y"),
    )
    term = F.when(
        col("urgent") == 1,
        (dfloor((col("cum_y").cast("double") / col("rnk")) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
        .cast("decimal(28,10)"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("urgent").cast("long").alias("n_relevant"),
        (F.sum(term).cast("double") / F.sum("urgent")).alias("average_precision"),
        (F.sum("urgent").cast("double") / F.count("*"))
        .alias("base_rate"),
    )


@q(
    "q_ndcg_at_100",
    oracle=_RANK_SQL + """
    , rel AS (
      SELECT rnk, 2 * urgent + high AS g FROM ranked WHERE rnk <= 100
    ), dcg AS (
      SELECT CAST(SUM(CAST(FLOOR(((POWER(2, g) - 1) / LOG2(rnk + 1)) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(28,10))) AS DOUBLE) AS v
      FROM rel
    ), grades AS (
      SELECT SUM(CAST(urgent AS BIGINT)) AS n2,
             SUM(CAST(high AS BIGINT)) AS n1
      FROM ranked
    ), spine AS (
      SELECT CAST(r.range AS BIGINT) + 1 AS pos FROM range(0, 100) r
    ), ideal AS (
      SELECT CAST(SUM(CAST(FLOOR(((POWER(2, CASE WHEN s.pos <= g.n2 THEN 2
                              WHEN s.pos <= g.n2 + g.n1 THEN 1
                              ELSE 0 END) - 1) / LOG2(s.pos + 1)) * 1e10 + 0.5) / 1e10
               AS DECIMAL(28,10))) AS DOUBLE) AS v
      FROM spine s, grades g
    )
    SELECT (d.v) AS dcg_100,
           (i.v) AS idcg_100,
           (d.v / i.v) AS ndcg_100
    FROM dcg d, ideal i
    """,
    desc="NDCG@100 of the price ranking with graded relevance "
         "(urgent = 2, high = 1, else 0): DCG = sum over the top "
         "100 strict-ranked orders of (2^grade - 1)/log2(rank+1), "
         "normalized by the ideal DCG from exact grade counts laid "
         "onto a literal 1..100 position spine — the head-weighted "
         "ranking metric that notices WHERE relevant items sit "
         "(q_average_precision averages uniformly over all "
         "relevant positions; NDCG discounts by position, the "
         "metric search and recommendation report). Ranks reuse "
         "the two-level prefix-sum construction; discount terms "
         "quantize the 1e-10 grid ->DECIMAL before both sums; the "
         "IDCG needs no sort at all — just grade counts.",
    tags=["stats", "window", "agg", "cross"],
)
def q_ndcg_at_100(spark, sf_dir):
    from pyspark.sql import Window

    orders = tables.load(spark, sf_dir, "orders")
    scored = orders.select(
        col("o_orderkey").alias("k"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c"),
        (col("o_orderpriority") == "1-URGENT").cast("int").alias("urgent"),
        (col("o_orderpriority") == "2-HIGH").cast("int").alias("high"),
    ).withColumn("bkt", F.floor(-col("c") / 20000).cast("long"))
    w_in = (
        Window.partitionBy("bkt").orderBy(col("c").desc(), "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bkt = scored.select(
        "k", "c", "urgent", "high", "bkt",
        F.count("*").over(w_in).alias("n_in"),
    )
    # same driver-side bounded prefix as q_average_precision
    bkt_rows = sorted(
        (r["bkt"], r["bn"])
        for r in scored.groupBy("bkt").agg(F.count("*").alias("bn")).collect()
    )
    offs, n_run = [], 0
    for bkt, bn in bkt_rows:
        offs.append((bkt, n_run))
        n_run += bn
    bkt_off = spark.createDataFrame(offs, "bkt_o long, n_off long")
    ranked = in_bkt.join(broadcast(bkt_off), col("bkt") == col("bkt_o")).select(
        "urgent", "high", (col("n_in") + col("n_off")).alias("rnk")
    )
    g = 2 * col("urgent") + col("high")
    dterm = (dfloor(((F.pow(F.lit(2.0), g) - 1) / (F.log(2.0, col("rnk") + 1))) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")
    dcg = ranked.filter(col("rnk") <= 100).agg(
        F.sum(dterm).cast("double").alias("dcg")
    )
    grades = ranked.agg(
        F.sum("urgent").alias("n2"), F.sum("high").alias("n1")
    )
    spine = spark.range(1, 101).select(col("id").alias("pos"))
    ig = (
        F.when(col("pos") <= col("n2"), 2)
        .when(col("pos") <= col("n2") + col("n1"), 1)
        .otherwise(0)
    )
    iterm = (dfloor(((F.pow(F.lit(2.0), ig) - 1) / F.log(2.0, col("pos") + 1)) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")
    ideal = spine.crossJoin(broadcast(grades)).agg(
        F.sum(iterm).cast("double").alias("idcg")
    )
    return dcg.crossJoin(broadcast(ideal)).select(
        (col("dcg")).alias("dcg_100"),
        (col("idcg")).alias("idcg_100"),
        (col("dcg") / col("idcg")).alias("ndcg_100"),
    )
