"""Thirty-first-wave query inventory: two classic order-statistics /
sweep mechanisms the inventory still lacked — interval UNION length
(total distinct covered time per subject, the gaps-and-islands sweep)
and the weighted median (cumulative-weight order statistic).

Determinism discipline (queries.py header): interval arithmetic is
integer microseconds end-to-end (the wave-16 sessionize precedent);
the weighted median picks an ACTUAL data value via an exact
cumulative-weight threshold (no interpolation at all), with full key
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
      FROM events
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), merged AS (
      SELECT user_id, island, MAX(e) - MIN(s) AS len_us
      FROM islands GROUP BY user_id, island
    )
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len_us) // 60000000 AS BIGINT) AS covered_minutes
    FROM merged GROUP BY user_id % 10 ORDER BY user_bucket
    """,
    desc="Interval-UNION length: each event opens a 5-minute activity "
         "window; overlapping windows merge and the total DISTINCT "
         "covered time per user is summed (reported per user-id "
         "bucket). The gaps-and-islands sweep — an island starts where "
         "a window's start exceeds the running MAX of all previous "
         "ends (ROWS ... 1 PRECEDING frame), islands are numbered by "
         "a running sum of the starts, and each island contributes "
         "max(end)-min(start). Complements q_interval_overlap's "
         "CLIPPING (time inside fixed windows) with COVERAGE (distinct "
         "time at all). Integer microseconds end-to-end; the windows "
         "partition on the user key — per-user timelines, never the "
         "stream.",
    tags=["events", "window", "agg"],
)
def q_interval_union(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 300_000_000).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(col("s") > F.max("e").over(wprev), 1).otherwise(0),
    )
    wcum = (
        Window.partitionBy("user_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = marked.withColumn("island", F.sum("new_island").over(wcum))
    merged = (
        islands.groupBy("user_id", "island")
        .agg((F.max("e") - F.min("s")).alias("len_us"))
    )
    return (
        merged.groupBy((col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count("*").alias("n_islands"),
            F.expr("SUM(len_us) DIV 60000000").alias("covered_minutes"),
        )
        .orderBy("user_bucket")
    )


@q(
    "q_weighted_median",
    oracle="""
    WITH items AS (
      SELECT l_returnflag AS flag, FLOOR((l_extendedprice) * 1e2 + 0.5) / 1e2 AS price,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ), g AS (
      SELECT flag, price, SUM(w) AS w FROM items GROUP BY flag, price
    ), c AS (
      SELECT flag, price, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY price
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM g
    )
    SELECT flag,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           (MIN(CASE WHEN 2 * cw >= tw THEN price END)) AS weighted_median
    FROM c GROUP BY flag ORDER BY flag
    """,
    desc="Quantity-weighted median price per return flag: the order "
         "statistic where each row counts with its weight — the "
         "robust 'typical traded price' a pricing review reads "
         "(unweighted medians over-count one-unit lines). Values "
         "collapse to distinct (flag, price) cells FIRST (combinable "
         "integer weight sums), then one per-flag cumulative-weight "
         "window over distinct prices picks the smallest price whose "
         "cumulative weight reaches half the total — an ACTUAL data "
         "value by exact integer comparison, no interpolation, so "
         "both engines agree by construction. The window sorts "
         "distinct prices per flag, never lineitems.",
    tags=["window", "agg", "percentile"],
)
def q_weighted_median(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        col("l_returnflag").alias("flag"),
        (dfloor((col("l_extendedprice")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).alias("price"),
        col("l_quantity").cast("long").alias("w"),
    )
    g = li.groupBy("flag", "price").agg(F.sum("w").alias("w"))
    wcum = (
        Window.partitionBy("flag").orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("flag")
    c = g.select(
        "flag", "price", "w",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    return (
        c.groupBy("flag")
        .agg(
            F.max("tw").alias("total_weight"),
            (F.min(F.when(2 * col("cw") >= col("tw"), col("price")))).alias("weighted_median"),
        )
        .orderBy("flag")
    )
