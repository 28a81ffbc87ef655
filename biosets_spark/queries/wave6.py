"""Sixth-wave query inventory: the remaining classic TPC-H join/agg
shapes (Q7 volume shipping, Q8 market share, Q10 returned items, Q14
promo effect, Q18 large orders) — broadening the relational surface
with the decimal-money discipline from queries.py (exact DECIMAL
sums cast to DOUBLE at the end; ratios divide two exactly-converted
doubles, so no rounding is needed for determinism).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import q

def _rev():
    # built lazily — Column construction needs an active SparkContext
    return col("l_extendedprice").cast("decimal(12,2)") * (lit(1) - col("l_discount").cast("decimal(12,2)"))


from ..oracle_fragments import REV_SQL as _REV_SQL


@q(
    "q_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    desc="TPC-H Q7 shape: bidirectional nation-pair shipping volume by "
         "year; both nation dims broadcast, the OR-pair predicate "
         "evaluated after the cheap dim joins.",
    tags=["join", "agg", "tpch"],
)
def q_volume_shipping(spark, sf_dir):
    # explicit projection: the OR-pair predicate sits above two
    # different nation joins, which defeats automatic column pruning
    # through the 4-way fact join — select only what the query reads
    # so the scans stay narrow (audit: no wide scans).
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tables.load(spark, sf_dir, "nation")
    n1 = n.select(col("n_nationkey").alias("_s_nk"), col("n_name").alias("supp_nation"))
    n2 = n.select(col("n_nationkey").alias("_c_nk"), col("n_name").alias("cust_nation"))
    return (
        s.join(li, col("s_suppkey") == col("l_suppkey"))
        .join(o, col("o_orderkey") == col("l_orderkey"))
        .join(c, col("c_custkey") == col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") == col("_s_nk"))
        .join(broadcast(n2), col("c_nationkey") == col("_c_nk"))
        .filter(
            (((col("supp_nation") == "NATION_1") & (col("cust_nation") == "NATION_2"))
             | ((col("supp_nation") == "NATION_2") & (col("cust_nation") == "NATION_1")))
            & (col("l_shipdate") >= "1996-01-01") & (col("l_shipdate") < "1998-01-01")
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@q(
    "q_market_share",
    # ratio of two exact DECIMAL sums, each converted exactly to
    # double (values << 2^53), so the double division is engine-
    # deterministic without rounding.
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
    desc="TPC-H Q8 shape: one nation's share of ECONOMY-part revenue "
         "inside the ASIA-customer market, by order year — the "
         "conditional-sum-ratio aggregate; all dims broadcast.",
    tags=["join", "agg", "tpch"],
)
def q_market_share(spark, sf_dir):
    p = tables.load(spark, sf_dir, "part")
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    n1 = n.select(col("n_nationkey").alias("_c_nk"), col("n_regionkey").alias("_c_rk"))
    n2 = n.select(col("n_nationkey").alias("_s_nk"), col("n_name").alias("supp_nation"))
    vol = F.when(col("supp_nation") == "NATION_3", _rev()).otherwise(lit(0).cast("decimal(12,2)"))
    return (
        p.filter(col("p_type") == "ECONOMY")
        .join(li, col("p_partkey") == col("l_partkey"))
        .join(broadcast(s), col("s_suppkey") == col("l_suppkey"))
        .join(o, col("o_orderkey") == col("l_orderkey"))
        .join(c, col("c_custkey") == col("o_custkey"))
        .join(broadcast(n1), col("c_nationkey") == col("_c_nk"))
        .join(broadcast(r), col("_c_rk") == col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") == col("_s_nk"))
        .filter(col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(vol).cast("double") / F.sum(_rev()).cast("double")).alias("mkt_share"))
    )


@q(
    "q_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM({_REV_SQL}) DESC, c_custkey
    LIMIT 20
    """,
    desc="TPC-H Q10 shape: top-20 customers by returned-item revenue "
         "in a half-year window; exact-decimal ordering makes the "
         "top-k selection engine-deterministic.",
    tags=["join", "agg", "topk", "tpch"],
)
def q_returned_items(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    n = tables.load(spark, sf_dir, "nation")
    return (
        c.join(o, col("c_custkey") == col("o_custkey"))
        .join(li, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(n), col("c_nationkey") == col("n_nationkey"))
        .filter((col("l_returnflag") == "R")
                & (col("o_orderdate") >= "1996-01-01") & (col("o_orderdate") < "1996-07-01"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).alias("_rev_dec"))
        .orderBy(col("_rev_dec").desc(), col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", col("_rev_dec").cast("double").alias("revenue"))
    )


@q(
    "q_promo_effect",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                 / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    desc="TPC-H Q14 shape: promo revenue percentage for one ship "
         "month — conditional-sum ratio over a broadcast part join.",
    tags=["join", "agg", "tpch"],
)
def q_promo_effect(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part")
    promo = F.when(col("p_type") == "PROMO", _rev()).otherwise(lit(0).cast("decimal(12,2)"))
    return (
        li.filter((col("l_shipdate") >= "1996-03-01") & (col("l_shipdate") < "1996-04-01"))
        .join(broadcast(p), col("l_partkey") == col("p_partkey"))
        .agg((lit(100.0) * F.sum(promo).cast("double") / F.sum(_rev()).cast("double"))
             .alias("promo_revenue_pct"))
    )


@q(
    "q_large_orders",
    oracle="""
    SELECT c_name, o.o_orderkey,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty,
           CAST(CAST(ANY_VALUE(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS total_price
    FROM orders o
    JOIN lineitem ON l_orderkey = o.o_orderkey
    JOIN customer ON c_custkey = o_custkey
    GROUP BY c_name, o.o_orderkey
    HAVING SUM(l_quantity) > 250
    """,
    desc="TPC-H Q18 shape: orders whose total line quantity exceeds "
         "250 — aggregate-then-HAVING over the fact join; quantity "
         "sums are integer-valued doubles (exact).",
    tags=["join", "agg", "having", "tpch"],
)
def q_large_orders(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    c = tables.load(spark, sf_dir, "customer")
    return (
        o.join(li, col("l_orderkey") == col("o_orderkey"))
        .join(c, col("c_custkey") == col("o_custkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(
            F.sum("l_quantity").cast("double").alias("total_qty"),
            F.any_value(col("o_totalprice")).cast("decimal(12,2)").cast("double").alias("total_price"),
        )
        .filter(col("total_qty") > 250)
    )
