"""Eighteenth-wave query inventory: ops-dashboard staples — weekly
p50/p95 bands per event type and the order-to-ship latency histogram.

Determinism discipline follows queries.py: percentile inputs quantized
to 2 decimals before the sort-based agg and outputs rounded (the
q_quantiles precedent), integer day diffs, total orders on every
output.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import q


@q(
    "q_weekly_percentiles",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
           CAST(COUNT(*) AS BIGINT) AS n,
           (quantile_cont(FLOOR((value) * 1e2 + 0.5) / 1e2, 0.5)) AS p50,
           (quantile_cont(FLOOR((value) * 1e2 + 0.5) / 1e2, 0.95)) AS p95
    FROM events
    GROUP BY event_type, date_trunc('week', CAST(ts AS DATE))
    ORDER BY event_type, week
    """,
    desc="Weekly p50/p95 value bands per event type — the SLO "
         "dashboard series. Exact sort-based percentiles are grouped "
         "by (type, week), so each sort covers one small cell, never "
         "the stream; inputs are quantized to 2 decimals before the "
         "percentile (engine-identical interpolation inputs) and the "
         "ISO week_trunc is mirrored on both engines. The sketch "
         "alternative for unbounded cells is q_approx_quantile_audit's "
         "approx_percentile, audited there.",
    tags=["events", "agg", "percentile"],
)
def q_weekly_percentiles(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("week", col("ts").cast("date")).cast("date").alias("week"),
        )
        .agg(
            F.count("*").alias("n"),
            (F.expr("percentile(FLOOR((value) * 1e2 + 0.5) / 1e2, 0.5)")).alias("p50"),
            (F.expr("percentile(FLOOR((value) * 1e2 + 0.5) / 1e2, 0.95)")).alias("p95"),
        )
        .orderBy("event_type", "week")
    )


@q(
    "q_ship_latency_histogram",
    oracle="""
    SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE)) AS BIGINT) AS latency_days,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
    ORDER BY latency_days
    """,
    desc="Order-to-ship latency distribution in whole days: the "
         "fulfillment histogram an ops review reads. One fact-fact "
         "join on the order key (co-partitioned SMJ under AQE), "
         "integer day arithmetic, combinable counts; the distinct "
         "order count per bucket distinguishes 'many slow lines' from "
         "'many slow orders'.",
    tags=["join", "agg"],
)
def q_ship_latency_histogram(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(o, col("l_orderkey") == col("o_orderkey"))
        .select(
            F.datediff(
                col("l_shipdate").cast("date"), col("o_orderdate").cast("date")
            ).cast("long").alias("latency_days"),
            "l_orderkey",
        )
        .groupBy("latency_days")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.count_distinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("latency_days")
    )
