"""Seventh-wave query inventory: the remaining classic TPC-H shapes,
adapted to the driver's leaner star schema (no ``partsupp`` table, no
commit/receipt dates, no ``p_container``; see TESTDATA.md):

- Q2  -> q_min_cost_supplier     (correlated min over a region-filtered
                                  supplier pool; min-equality join)
- Q4  -> q_order_priority_check  (EXISTS semi join with a non-equi
                                  residual condition)
- Q9  -> q_product_profit        (5-way join, profit formula kept in
                                  exact decimals until the final cast)
- Q11 -> q_important_suppliers   (HAVING against a scalar-subquery
                                  grand total)
- Q12 -> q_ship_delay_priority   (computed delay bucketing +
                                  conditional priority counts)
- Q15 -> q_top_supplier          (max-revenue equality on the exact
                                  DECIMAL value — no float compare)
- Q16 -> q_supplier_part_variety (distinct-supplier counts per part
                                  attribute with an exclusion filter)
- Q19 -> q_disjunctive_filter    (OR-of-ANDs multi-branch predicate;
                                  the implied brand disjunction is
                                  pre-applied to the part dim so the
                                  broadcast build stays small)
- Q20 -> q_excess_parts_suppliers (nested semi-join chain:
                                  part -> lineitem agg -> supplier)
- Q21 -> q_waiting_suppliers     (multi-correlated EXISTS/NOT EXISTS
                                  re-expressed as one per-order set
                                  aggregation — no self-join storm)

Determinism discipline (queries.py module docstring): money goes
through DECIMAL(12,2) sums and is cast to DOUBLE only at the end;
comparisons that would hinge on a float average use exact decimal
sums on both sides or a single IEEE division of identical doubles;
every top-k is fully tie-broken by group keys.

Reference parity: the reference has no TPC-H suite; these cover the
same relational surface its Arrow-level ops compose to (filter/join/
group/agg, docs/PROCESSING.md) at warehouse query shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import q


def _rev():
    # built lazily — Column construction needs an active SparkContext
    return col("l_extendedprice").cast("decimal(12,2)") * (
        lit(1) - col("l_discount").cast("decimal(12,2)")
    )


from ..oracle_fragments import REV_SQL as _REV_SQL


@q(
    "q_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    desc="TPC-H Q4 shape: order-priority counts for orders with at "
         "least one lineitem shipped after the order date — the "
         "correlated EXISTS evaluated as max(l_shipdate) per order "
         "(a map-side-combinable pre-aggregate, so the exchange "
         "carries one row per order, never raw lineitems) joined "
         "back on the equi key with the non-equi residual as a "
         "post-join filter.",
    tags=["join", "semi-join", "subquery", "tpch"],
)
def q_order_priority_check(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sel = o.filter(
        (col("o_orderdate") >= "1996-01-01") & (col("o_orderdate") < "1996-07-01"))
    # EXISTS(l_shipdate > o_orderdate) <=> MAX(l_shipdate) > o_orderdate:
    # the pre-aggregate shrinks lineitem to one (orderkey, max) row
    # BEFORE any exchange (guide-style partial aggregation), where the
    # old left-semi forced lineitem to be the hash build side — the
    # only side a semi join can build — so bench-scale plans broadcast
    # a 600k-row build and cluster-scale plans shuffle every lineitem.
    ms = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("_max_ship"))
    semi = (
        sel.join(ms, col("l_orderkey") == col("o_orderkey"))
        .filter(col("_max_ship") > col("o_orderdate"))
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "q_product_profit",
    oracle=f"""
    SELECT n_name, o_year, revenue - cost AS profit
    FROM (
      SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / 10 AS cost
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    )
    ORDER BY n_name, o_year
    """,
    desc="TPC-H Q9 shape: per-nation-per-year profit on 'widget' parts "
         "(revenue minus a retail-price-derived cost). Both terms are "
         "exact DECIMAL sums; the only float ops are the final cast, "
         "one division by 10, and one subtraction — identical IEEE "
         "steps in both engines.",
    tags=["join", "agg", "tpch"],
)
def q_product_profit(spark, sf_dir):
    p = (
        tables.load(spark, sf_dir, "part")
        .filter(col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_quantity", "l_extendedprice", "l_discount")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = tables.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost_term = col("l_quantity").cast("decimal(12,2)") * col("p_retailprice").cast("decimal(12,2)")
    joined = (
        li.join(broadcast(p), col("p_partkey") == col("l_partkey"))
        .join(broadcast(s), col("s_suppkey") == col("l_suppkey"))
        .join(o, col("o_orderkey") == col("l_orderkey"))
        .join(broadcast(n), col("n_nationkey") == col("s_nationkey"))
    )
    agg = joined.groupBy("n_name", F.year("o_orderdate").alias("o_year")).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        (F.sum(cost_term).cast("double") / lit(10)).alias("cost"),
    )
    return (
        agg.select("n_name", "o_year", (col("revenue") - col("cost")).alias("profit"))
        .orderBy("n_name", "o_year")
    )


@q(
    "q_important_suppliers",
    oracle=f"""
    WITH vals AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS val
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(val AS DOUBLE) AS value
    FROM vals JOIN supplier ON s_suppkey = l_suppkey
    WHERE CAST(val AS DOUBLE) * (SELECT COUNT(*) FROM vals) >
          1.02 * (SELECT CAST(SUM(val) AS DOUBLE) FROM vals)
    ORDER BY value DESC, s_suppkey
    """,
    desc="TPC-H Q11 shape: suppliers whose lineitem revenue exceeds "
         "1.02x the mean supplier revenue — per-group exact DECIMAL "
         "sums HAVING-filtered against a 1-row scalar aggregate "
         "(broadcast, deliberate single-row nested loop). The cutoff "
         "is share-based (val*n > 1.02*total), so it stays selective "
         "at every scale factor instead of degenerating into a no-op "
         "like a fixed fraction would.",
    # "cross" tag: the single-row scalar-aggregate crossJoin(broadcast)
    # is a deliberate BroadcastNestedLoopJoin (1-row build side)
    tags=["agg", "subquery", "cross", "tpch"],
)
def q_important_suppliers(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    vals = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("_val"))
    total = vals.agg(F.sum("_val").alias("_total"), F.count("*").alias("_n"))
    return (
        vals.crossJoin(broadcast(total))
        .filter(
            col("_val").cast("double") * col("_n")
            > lit(1.02) * col("_total").cast("double"))
        .join(broadcast(s), col("s_suppkey") == col("l_suppkey"))
        .select("s_suppkey", "s_name", col("_val").cast("double").alias("value"))
        .orderBy(col("value").desc(), "s_suppkey")
    )


@q(
    "q_ship_delay_priority",
    oracle="""
    SELECT delay_bucket,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
                  WHEN date_diff('day', o_orderdate, l_shipdate) < 60 THEN 'medium'
                  ELSE 'slow' END AS delay_bucket
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    )
    GROUP BY delay_bucket
    ORDER BY delay_bucket
    """,
    desc="TPC-H Q12 shape: shipping-delay buckets (computed day diff, "
         "all stamps are midnight so day arithmetic is engine-exact) "
         "with conditional high/low priority counts — map-side "
         "combinable conditional aggregation.",
    tags=["join", "agg", "tpch"],
)
def q_ship_delay_priority(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    delay = F.datediff(col("l_shipdate"), col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "fast").when(delay < 60, "medium").otherwise("slow")
    )
    high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((col("l_shipdate") >= "1996-01-01") & (col("l_shipdate") < "1997-01-01"))
        .join(o, col("o_orderkey") == col("l_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            # COUNT(CASE ...) not SUM: DuckDB types SUM(int) as a
            # decimal (HUGEINT-backed) while Spark says long — COUNT
            # is BIGINT in both engines.
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@q(
    "q_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
    desc="TPC-H Q15 shape: the supplier(s) achieving the maximum "
         "quarterly revenue. The max-equality compare happens on the "
         "exact DECIMAL sum (not a float), so ties and near-ties are "
         "engine-stable; the 1-row max is a broadcast nested loop.",
    tags=["agg", "subquery", "cross", "tpch"],
)
def q_top_supplier(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter((col("l_shipdate") >= "1996-01-01") & (col("l_shipdate") < "1996-04-01"))
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("_rev"))
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.crossJoin(broadcast(mx))
        .filter(col("_rev") == col("_mx"))
        .join(broadcast(s), col("s_suppkey") == col("l_suppkey"))
        .select("s_suppkey", "s_name", col("_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@q(
    "q_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 20
    """,
    desc="TPC-H Q16 shape: how many distinct suppliers ship each "
         "(brand, type, size) combination, excluding one brand — "
         "distinct-agg after a broadcast part join, top-20 fully "
         "tie-broken by the group key so LIMIT is deterministic.",
    tags=["join", "agg", "distinct", "tpch"],
)
def q_supplier_part_variety(spark, sf_dir):
    p = (
        tables.load(spark, sf_dir, "part")
        .filter(
            (col("p_brand") != "Brand#13")
            & col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = tables.load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(broadcast(p), col("p_partkey") == col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@q(
    "q_disjunctive_filter",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    desc="TPC-H Q19 shape: revenue under an OR-of-ANDs predicate "
         "mixing part attributes and lineitem ranges. The implied "
         "brand-membership disjunct is applied to the part dim before "
         "the broadcast (manual pushdown of the disjunction's common "
         "factor), so the build side carries only 3 brands.",
    tags=["join", "agg", "tpch"],
)
def q_disjunctive_filter(spark, sf_dir):
    p = (
        tables.load(spark, sf_dir, "part")
        # implied by the disjunction below: every branch pins one of
        # these three brands — pre-filtering keeps the broadcast small
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    branch = (
        ((col("p_brand") == "Brand#1") & col("p_size").between(1, 15)
         & col("l_quantity").between(1, 11))
        | ((col("p_brand") == "Brand#2") & col("p_size").between(10, 25)
           & col("l_quantity").between(10, 20))
        | ((col("p_brand") == "Brand#3") & col("p_size").between(20, 35)
           & col("l_quantity").between(20, 30))
    )
    return (
        li.join(broadcast(p), col("p_partkey") == col("l_partkey"))
        .filter(branch)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@q(
    "q_excess_parts_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%widget%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50
      )
    ORDER BY s_suppkey
    """,
    desc="TPC-H Q20 shape: suppliers in three nations who shipped a "
         "large yearly volume of 'widget' parts — a nested semi-join "
         "chain (part filter -> broadcast semi into lineitem -> "
         "HAVING on the exact decimal quantity sum -> semi into "
         "supplier -> broadcast nation filter).",
    tags=["join", "semi-join", "subquery", "tpch"],
)
def q_excess_parts_suppliers(spark, sf_dir):
    p = (
        tables.load(spark, sf_dir, "part")
        .filter(col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    s = tables.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    n = (
        tables.load(spark, sf_dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select("n_nationkey")
    )
    heavy = (
        li.filter((col("l_shipdate") >= "1996-01-01") & (col("l_shipdate") < "1997-01-01"))
        .join(broadcast(p), col("l_partkey") == col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(col("l_quantity").cast("decimal(12,2)")).alias("_qty"))
        .filter(col("_qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(broadcast(n), col("n_nationkey") == col("s_nationkey"), "left_semi")
        .join(heavy, col("s_suppkey") == col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@q(
    "q_waiting_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN l_suppkey END) AS n_late,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_order JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    desc="TPC-H Q21 shape: suppliers who were the SOLE late shipper "
         "(>60 days after the order date) on a multi-supplier order. "
         "The classic double-EXISTS/NOT-EXISTS self-join storm is "
         "re-expressed as a per-order set aggregation in TWO plain "
         "hash-agg levels: (order, supplier) first with a max-late "
         "flag, then per order count/sum/max — no countDistinct pair, "
         "whose Expand would triple every joined row before the "
         "shuffle (measured 2x at sf0.1) — instead of three "
         "correlated scans of lineitem.",
    tags=["join", "agg", "subquery", "tpch"],
)
def q_waiting_suppliers(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = col("l_shipdate") > F.date_add(col("o_orderdate"), 60)
    # two-level distinct: dedup to (order, supplier) with a max-late
    # flag, then plain count/sum/max per order. Equivalent to the twin
    # countDistinct form but without its Expand (which tripled every
    # joined row before the shuffle — measured 2x at sf0.1); both
    # levels are map-side combinable.
    per_supp = (
        li.join(o, col("o_orderkey") == col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("is_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(col("is_late") == 1, col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((col("n_supp") > 1) & (col("n_late") == 1))
        .join(broadcast(s), col("s_suppkey") == col("late_supp"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(col("numwait").desc(), "s_name")
        .limit(10)
    )


@q(
    "q_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ),
    mins AS (SELECT pk AS mpk, MIN(unit_cost) AS mc FROM costs GROUP BY pk)
    SELECT pk AS p_partkey, sk AS s_suppkey, unit_cost
    FROM costs JOIN mins ON pk = mpk AND unit_cost = mc
    ORDER BY unit_cost, p_partkey, s_suppkey
    LIMIT 50
    """,
    desc="TPC-H Q2 shape: for each part, the EUROPE supplier(s) "
         "offering the minimum observed unit cost — a correlated-min "
         "equality join. unit_cost is ONE IEEE division of identical "
         "doubles (bit-identical in both engines), so the min-equality "
         "and the order-by are engine-stable; the output keeps the "
         "exact double (rounding a boundary double differs between "
         "engines' shortest-repr vs binary expansions), ties fully "
         "broken by (part, supplier).",
    tags=["join", "agg", "subquery", "tpch"],
)
def q_min_cost_supplier(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tables.load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (
        tables.load(spark, sf_dir, "region")
        .filter(col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    # one small dim: EUROPE suppliers (supplier ⋈ nation ⋈ region)
    eu_supp = (
        s.join(broadcast(n), col("n_nationkey") == col("s_nationkey"))
        .join(broadcast(r), col("r_regionkey") == col("n_regionkey"), "left_semi")
        .select("s_suppkey")
    )
    costs = (
        li.join(broadcast(eu_supp), col("s_suppkey") == col("l_suppkey"), "left_semi")
        .groupBy(col("l_partkey").alias("pk"), col("l_suppkey").alias("sk"))
        .agg(F.min(col("l_extendedprice") / col("l_quantity")).alias("unit_cost"))
    )
    mins = costs.groupBy(col("pk").alias("mpk")).agg(F.min("unit_cost").alias("mc"))
    return (
        costs.join(mins, (col("pk") == col("mpk")) & (col("unit_cost") == col("mc")))
        .select(
            col("pk").alias("p_partkey"),
            col("sk").alias("s_suppkey"),
            "unit_cost",
        )
        .orderBy("unit_cost", "p_partkey", "s_suppkey")
        .limit(50)
    )
