"""Twelfth-wave query inventory: customer-cohort retention (the
calendar-cohort twin of the event-stream retention query), sequential
self-comparison via lag (orders in quick succession), and ROLLUP with
GROUPING() indicator columns (disambiguating aggregation-level NULLs
from data NULLs).

Determinism discipline follows queries.py: calendar math is integer
(year*12 + month), lag windows use a unique-key tie-break so adjacency
is total, and grouping ids are engine-defined integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from . import tables
from .queries import q


@q(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_part('year', o_orderdate) * 12
                 + date_part('month', o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT DISTINCT o.o_custkey,
             date_part('year', o.o_orderdate) * 12
             + date_part('month', o.o_orderdate) AS act_m
      FROM orders o
    )
    SELECT CAST(f.cohort_m AS BIGINT) AS cohort_m,
           CAST(a.act_m - f.cohort_m AS BIGINT) AS months_since,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM activity a JOIN firsts f ON a.o_custkey = f.o_custkey
    WHERE a.act_m - f.cohort_m <= 6
    GROUP BY f.cohort_m, a.act_m - f.cohort_m
    """,
    desc="calendar-cohort retention: customers bucketed by first-order "
         "month, counted again in each of the following 6 months they "
         "ordered — the cohort twin of the event-stream retention "
         "query. Month index = year*12+month, pure integer calendar "
         "math; the per-customer first month is a combinable MIN; one "
         "shuffle on the customer key.",
    tags=["join", "agg", "cohort"],
)
def q_cohort_retention(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    m = (F.year(col("o_orderdate")) * 12 + F.month(col("o_orderdate"))).alias("act_m")
    activity = o.select("o_custkey", m).distinct()
    firsts = activity.groupBy("o_custkey").agg(F.min("act_m").alias("cohort_m"))
    return (
        activity.join(firsts, "o_custkey")
        .select("cohort_m", (col("act_m") - col("cohort_m")).alias("months_since"))
        .filter(col("months_since") <= 6)
        .groupBy("cohort_m", "months_since")
        .agg(F.count("*").alias("n_customers"))
        .select(col("cohort_m").cast("long").alias("cohort_m"),
                col("months_since").cast("long").alias("months_since"),
                "n_customers")
    )


@q(
    "q_quick_succession",
    oracle="""
    WITH seq AS (
      SELECT o_orderpriority,
             date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN gap_days <= 7 THEN 1 END) AS BIGINT) AS n_quick,
           CAST(COUNT(CASE WHEN gap_days IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_repeat
    FROM seq GROUP BY o_orderpriority
    """,
    desc="sequential self-comparison without a self-join: per customer, "
         "orders placed within 7 days of the previous order via lag() "
         "over (custkey, date, unique-key) — the total tie-break makes "
         "adjacency deterministic under same-day orders; one exchange "
         "on the high-cardinality customer key.",
    tags=["window", "agg"],
)
def q_quick_succession(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(col("o_orderdate"), F.lag("o_orderdate").over(w))
    seq = o.select("o_orderpriority", gap.alias("gap_days"))
    return seq.groupBy("o_orderpriority").agg(
        F.count(F.when(col("gap_days") <= 7, 1)).alias("n_quick"),
        F.count(F.when(col("gap_days").isNotNull(), 1)).alias("n_repeat"),
    )


@q(
    "q_grouping_id",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
           CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
    desc="ROLLUP with GROUPING() indicator columns: the markers "
         "disambiguate aggregation-level NULLs from data NULLs (the "
         "standard cube-consumer contract); partial aggregation "
         "expands grouping ids map-side.",
    tags=["agg", "rollup"],
)
def q_grouping_id(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    return (
        c.rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("c_nationkey").cast("int").alias("g_nat"),
            F.count("*").alias("n"),
        )
        .select("c_mktsegment", "c_nationkey", "g_seg", "g_nat", "n")
    )
