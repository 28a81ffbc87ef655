"""Fifty-eighth-wave query inventory: multi-objective analytics —
the SKYLINE (Pareto front) operator (orders no other order beats on
BOTH price and fulfillment speed: the classic database operator
behind any 'best tradeoffs' view, absent from SQL engines as a
builtin) and KNEE-POINT detection on the cumulative revenue curve
(the principled 'where does the vital-few end' cut that ABC's fixed
80% threshold hardcodes — the max-gap-to-diagonal point, the same
geometry as the KS statistic).

The 2D skyline needs NO pairwise comparison: collapse to the best
(min latency) per distinct price, sort price-descending, and a row is
on the front iff its latency strictly beats the running minimum of
all higher-priced rows — O(n log n), one partitioned window, where
the textbook formulation is a quadratic self-join.

Determinism discipline: prices are integer cents, latencies integer
days; fronts and knees are computed per order priority so every
window partitions; the knee's gap statistic is an exact ratio of
integer cumulative cents with a full tie-break on the argmax.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_skyline_orders",
    oracle="""
    WITH latency AS (
      SELECT o.o_orderkey, o.o_orderpriority AS pri,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS price,
             MIN(date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE))) AS lat
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3
    ), per_price AS (
      SELECT pri, price, MIN(lat) AS best_lat, COUNT(*) AS n_orders
      FROM latency GROUP BY pri, price
    ), swept AS (
      SELECT pri, price, best_lat, n_orders,
             MIN(best_lat) OVER (PARTITION BY pri ORDER BY price DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS run_min
      FROM per_price
    )
    SELECT pri AS o_orderpriority,
           CAST(price AS BIGINT) AS price_cents,
           CAST(best_lat AS BIGINT) AS best_latency_days,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM swept
    WHERE run_min IS NULL OR best_lat < run_min
    ORDER BY pri, price DESC
    """,
    desc="Skyline (Pareto front) of orders per priority over "
         "(maximize price, minimize first-ship latency): the set no "
         "other order dominates on both axes — the 'best tradeoffs' "
         "operator relational engines lack as a builtin. The plan is "
         "the scalable one: collapse to min-latency per distinct "
         "price (combinable agg), then ONE price-descending window "
         "per priority where a row survives iff it strictly beats "
         "the running minimum latency of everything pricier — "
         "O(n log n) with no pairwise self-join (the textbook "
         "NOT EXISTS formulation is quadratic). Ties on both axes "
         "collapse into one front point carrying its order count. "
         "Integer cents and integer days end to end.",
    tags=["window", "join", "agg"],
)
def q_skyline_orders(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    latency = (
        li.join(
            orders.select(
                "o_orderkey", col("o_orderpriority").alias("pri"),
                dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("price"),
                col("o_orderdate").cast("date").alias("od"),
            ),
            col("l_orderkey") == col("o_orderkey"),
        )
        .groupBy("o_orderkey", "pri", "price")
        .agg(
            F.min(
                F.datediff(col("l_shipdate").cast("date"), col("od"))
            ).alias("lat")
        )
    )
    per_price = latency.groupBy("pri", "price").agg(
        F.min("lat").alias("best_lat"), F.count("*").alias("n_orders")
    )
    w = (
        Window.partitionBy("pri").orderBy(col("price").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = per_price.withColumn("run_min", F.min("best_lat").over(w))
    return (
        swept.filter(col("run_min").isNull() | (col("best_lat") < col("run_min")))
        .select(
            col("pri").alias("o_orderpriority"),
            col("price").cast("long").alias("price_cents"),
            col("best_lat").cast("long").alias("best_latency_days"),
            col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("o_orderpriority", col("price_cents").desc())
    )


@q(
    "q_knee_point",
    oracle="""
    WITH cust_rev AS (
      SELECT o_orderpriority AS pri, o_custkey,
             SUM(CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT pri, cents,
             ROW_NUMBER() OVER (PARTITION BY pri
                                ORDER BY cents DESC, o_custkey) AS rk,
             SUM(cents) OVER (PARTITION BY pri
                              ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cents) OVER (PARTITION BY pri) AS tot,
             COUNT(*) OVER (PARTITION BY pri) AS n
      FROM cust_rev
    ), gaps AS (
      SELECT pri, rk, n,
             CAST(cum AS DOUBLE) / tot - CAST(rk AS DOUBLE) / n AS gap,
             CAST(cum AS DOUBLE) / tot AS cum_share
      FROM ranked
    ), best AS (
      SELECT pri, rk, n, gap, cum_share,
             ROW_NUMBER() OVER (PARTITION BY pri
                                ORDER BY gap DESC, rk) AS is_knee
      FROM gaps
    )
    SELECT pri AS o_orderpriority,
           CAST(rk AS BIGINT) AS knee_rank, CAST(n AS BIGINT) AS n_customers,
           (CAST(rk AS DOUBLE) / n) AS knee_share_of_customers,
           (cum_share) AS revenue_share_at_knee,
           (gap) AS max_gap
    FROM best WHERE is_knee = 1 ORDER BY pri
    """,
    desc="Knee point of the cumulative revenue concentration curve "
         "per priority: rank customers by revenue, and the knee is "
         "the rank maximizing (cumulative revenue share - rank "
         "share) — the max vertical gap between the Lorenz-style "
         "curve and the diagonal (the KS construction applied to "
         "concentration), i.e. the PRINCIPLED 'vital few' cut that "
         "ABC's hardcoded 80% approximates. Reading the row: "
         "knee_share_of_customers captures revenue_share_at_knee of "
         "revenue. All windows partition per priority; cumulative "
         "sums are exact integer cents; the argmax is fully "
         "tie-broken (gap desc, rank).",
    tags=["stats", "window", "agg"],
)
def q_knee_point(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    cust_rev = orders.groupBy(
        col("o_orderpriority").alias("pri"), "o_custkey"
    ).agg(
        F.sum(dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long")).alias("cents")
    )
    w_ord = Window.partitionBy("pri").orderBy(col("cents").desc(), "o_custkey")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("pri")
    ranked = cust_rev.select(
        "pri", "cents",
        F.row_number().over(w_ord).alias("rk"),
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(w_all).alias("tot"),
        F.count("*").over(w_all).alias("n"),
    )
    gaps = ranked.select(
        "pri", "rk", "n",
        (col("cum").cast("double") / col("tot")
         - col("rk").cast("double") / col("n")).alias("gap"),
        (col("cum").cast("double") / col("tot")).alias("cum_share"),
    )
    w_best = Window.partitionBy("pri").orderBy(col("gap").desc(), "rk")
    best = gaps.withColumn("is_knee", F.row_number().over(w_best))
    return (
        best.filter(col("is_knee") == 1)
        .select(
            col("pri").alias("o_orderpriority"),
            col("rk").cast("long").alias("knee_rank"),
            col("n").cast("long").alias("n_customers"),
            (col("rk").cast("double") / col("n"))
            .alias("knee_share_of_customers"),
            (col("cum_share")).alias("revenue_share_at_knee"),
            (col("gap")).alias("max_gap"),
        )
        .orderBy("o_orderpriority")
    )
