"""Seventeenth-wave query inventory: classic BI/data-mining shapes —
market-basket pair support, RFM customer segmentation, a user-journey
transition matrix, share-of-total windows, and year-over-year growth.

Determinism discipline follows queries.py: exact DECIMAL accumulation
for money, integer supports/counts, quantile cuts broadcast from one
row, total orders with unique-key tie-breaks, NULL (not NaN) for the
undefined first YoY ratio on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dsum, pair_expand, q


@q(
    "q_basket_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY support DESC, part_a, part_b LIMIT 20
    """,
    desc="Market-basket pair mining: top-20 part pairs by co-"
         "occurrence support across orders. ONE shuffle on the order "
         "id collects each basket's sorted distinct item set "
         "(collect_set dedups (order, part) in the same agg), then "
         "C(items,2) ordered pairs are generated JVM-side per basket "
         "— no fact-fact self-join, so the fact table is exchanged "
         "once instead of twice. Fan-out per order is C(items,2) "
         "with items bounded by basket size (<= 7 in this schema) — "
         "linear in orders at any scale, never quadratic in parts; "
         "the pair aggregation is map-side combinable and the top-20 "
         "is a TakeOrdered with a full tie-break.",
    tags=["join", "agg"],
)
def q_basket_pairs(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    pairs = pair_expand(baskets, "items", "part_a", "part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .orderBy(col("support").desc(), "part_a", "part_b")
        .limit(20)
    )


@q(
    "q_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS rec,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT quantile_cont(CAST(rec AS DOUBLE), 0.5) AS r50,
             quantile_cont(CAST(freq AS DOUBLE), 0.5) AS f50,
             quantile_cont(CAST(mon AS DOUBLE), 0.5) AS m50
      FROM rfm
    )
    SELECT (CASE WHEN rec <= r50 THEN 'R+' ELSE 'R-' END ||
            CASE WHEN freq > f50 THEN 'F+' ELSE 'F-' END ||
            CASE WHEN CAST(mon AS DOUBLE) > m50 THEN 'M+' ELSE 'M-' END)
             AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           (CAST(SUM(mon) AS DOUBLE)) AS total_monetary
    FROM rfm CROSS JOIN cuts
    GROUP BY segment ORDER BY segment
    """,
    desc="RFM segmentation: per-customer recency / frequency / "
         "monetary rolled up once (combinable MAX/COUNT/DECIMAL-SUM), "
         "median cuts broadcast from one row, customers bucketed into "
         "the eight R±F±M± segments with pure CASE expressions. The "
         "anchor date and the cuts are the only non-per-customer "
         "state, both 1-row broadcasts — the fact table is read once.",
    # "cross" tag: 1-row broadcast anchors (max date, median cuts).
    tags=["agg", "percentile", "cross"],
)
def q_rfm_segments(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (
        o.crossJoin(broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("maxd"), F.max("o_orderdate")).alias("rec"),
            F.count("*").alias("freq"),
            F.sum(col("o_totalprice").cast("decimal(18,2)")).alias("mon"),
        )
    )
    cuts = rfm.agg(
        F.expr("percentile(CAST(rec AS DOUBLE), 0.5)").alias("r50"),
        F.expr("percentile(CAST(freq AS DOUBLE), 0.5)").alias("f50"),
        F.expr("percentile(CAST(mon AS DOUBLE), 0.5)").alias("m50"),
    )
    seg = rfm.crossJoin(broadcast(cuts)).select(
        F.concat(
            F.when(col("rec") <= col("r50"), lit("R+")).otherwise(lit("R-")),
            F.when(col("freq") > col("f50"), lit("F+")).otherwise(lit("F-")),
            F.when(col("mon").cast("double") > col("m50"), lit("M+")).otherwise(lit("M-")),
        ).alias("segment"),
        "mon",
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum("mon").cast("double")).alias("total_monetary"),
        )
        .orderBy("segment")
    )


@q(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type ORDER BY from_type, to_type
    """,
    desc="User-journey transition matrix: count of consecutive "
         "(from, to) event-type pairs per user — the Markov-chain "
         "estimate a funnel model starts from. One lead() window over "
         "the high-cardinality user key (single exchange+sort; the "
         "same total (ts, id) order as the sessionizer) feeding a "
         "combinable 25-cell aggregation.",
    tags=["events", "window", "agg"],
)
def q_event_transitions(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(col("next_type").isNotNull())
    return (
        seq.groupBy(
            col("event_type").alias("from_type"), col("next_type").alias("to_type")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("from_type", "to_type")
    )


@q(
    "q_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT r_name, n_name,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, CAST(revenue AS DOUBLE) AS revenue,
           (CAST(revenue AS DOUBLE)
                 / CAST(SUM(revenue) OVER (PARTITION BY r_name) AS DOUBLE))
             AS region_share
    FROM rev ORDER BY r_name, n_name
    """,
    desc="Share-of-total (ratio_to_report): each nation's fraction of "
         "its region's revenue. The heavy work is the pre-aggregation "
         "to one row per nation (exact DECIMAL revenue); the share "
         "window then runs over 25 rows partitioned by region — "
         "window-after-agg, never a window over the fact table.",
    tags=["join", "agg", "window"],
)
def q_revenue_share(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    rev = (
        li.join(o, col("l_orderkey") == col("o_orderkey"))
        .join(c, col("o_custkey") == col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") == col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") == col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                col("l_extendedprice").cast("decimal(12,2)")
                * (lit(1) - col("l_discount").cast("decimal(12,2)"))
            ).alias("revenue_dec")
        )
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        col("revenue_dec").cast("double").alias("revenue"),
        (col("revenue_dec").cast("double")
            / F.sum("revenue_dec").over(w).cast("double")).alias("region_share"),
    ).orderBy("r_name", "n_name")


@q(
    "q_yoy_growth",
    oracle="""
    WITH yr AS (
      SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS y,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_orderpriority, year(o_orderdate)
    )
    SELECT o_orderpriority, y, CAST(rev AS DOUBLE) AS revenue,
           (CAST(rev AS DOUBLE)
                 / CAST(LAG(rev) OVER (PARTITION BY o_orderpriority ORDER BY y)
                        AS DOUBLE) - 1) AS yoy
    FROM yr ORDER BY o_orderpriority, y
    """,
    desc="Year-over-year revenue growth per order priority: exact "
         "DECIMAL yearly sums (combinable, one shuffle on the tiny "
         "(priority, year) key), then lag() over the handful of "
         "aggregated rows. The first year's ratio is NULL on both "
         "engines (LAG null propagates), not NaN.",
    tags=["agg", "window"],
)
def q_yoy_growth(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    yr = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").cast("long").alias("y")
    ).agg(F.sum(col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.partitionBy("o_orderpriority").orderBy("y")
    return yr.select(
        "o_orderpriority",
        "y",
        col("rev").cast("double").alias("revenue"),
        (col("rev").cast("double") / F.lag("rev").over(w).cast("double") - 1).alias("yoy"),
    ).orderBy("o_orderpriority", "y")
