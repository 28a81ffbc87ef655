"""Forty-first-wave query inventory: behavioral sequence mining and
heavy-tail binning — top in-session event-type TRIGRAM paths (the
path-analysis table product teams read to see what users actually do,
one more token of context than q_event_transitions' Markov bigrams)
and an exact log2 (powers-of-two) histogram of order totals (the
binning that renders heavy-tailed money/size distributions readable,
where equal-width bins put everything in bucket 0).

Determinism discipline: trigram order is total (ts, event_id
tie-break, the q_sessionize_batch construction); the log2 bin comes
from the BINARY-STRING LENGTH of exact integer cents — no log2() on
doubles, whose values just below a power of two round differently
per engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import dfloor, q


@q(
    "q_session_paths",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ), tri AS (
      SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
               || '>' || LEAD(event_type, 2) OVER w2 AS path
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri WHERE path IS NOT NULL
    GROUP BY path ORDER BY n DESC, path LIMIT 20
    """,
    desc="Top-20 in-session event-type trigram paths: sessionize "
         "(30-min gap, total order via the event_id tie-break), then "
         "two LEADs over the SAME (user, session) window emit each "
         "3-step path with zero extra shuffle — the path-analysis "
         "table that shows what users actually do, one token more "
         "context than q_event_transitions' bigram Markov matrix. "
         "LEAD never crosses a session boundary by construction "
         "(the window partitions on session_id), so no phantom "
         "cross-session paths. Combinable path counts + "
         "TakeOrderedAndProject with a full tie-break; the whole "
         "query is one exchange+sort per user plus one count "
         "shuffle at any scale.",
    tags=["events", "window", "agg"],
)
def q_session_paths(spark, sf_dir):
    from ..operators.events import sessionize

    ev = tables.load(spark, sf_dir, "events")
    sess = sessionize(ev, gap_minutes=30)
    w2 = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    tri = sess.select(
        F.concat_ws(
            ">",
            col("event_type"),
            F.lead("event_type", 1).over(w2),
            F.lead("event_type", 2).over(w2),
        ).alias("path"),
        F.lead("event_type", 2).over(w2).alias("third"),
    ).filter(col("third").isNotNull())
    return (
        tri.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(col("n").desc(), "path")
        .limit(20)
    )


@q(
    "q_log2_histogram",
    oracle="""
    WITH cents AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c FROM orders
    ), binned AS (
      SELECT c, length(printf('%b', c)) - 1 AS bin FROM cents
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(c) AS BIGINT) AS min_cents,
           CAST(MAX(c) AS BIGINT) AS max_cents,
           CAST(SUM(c) AS BIGINT) AS total_cents
    FROM binned GROUP BY bin ORDER BY bin
    """,
    desc="Exact powers-of-two (log2) histogram of order totals — the "
         "binning that makes heavy-tailed money/size distributions "
         "readable (equal-width bins dump everything into bucket 0; "
         "doubling bins give each decade of the tail its own row, "
         "the same shape parquet/ORC writers use for size "
         "statistics). The bin is the BINARY-STRING LENGTH of exact "
         "integer cents, not floor(log2(double)): a value one cent "
         "below a power of two is exactly binned on both engines, "
         "where log2's double rounding can flip it. Pure expressions "
         "+ one combinable ~15-group agg: scan speed at any scale.",
    tags=["stats", "agg"],
)
def q_log2_histogram(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    cents = orders.select(
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c")
    )
    binned = cents.select(
        "c", (F.length(F.bin(col("c"))) - 1).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("c").cast("long").alias("min_cents"),
            F.max("c").cast("long").alias("max_cents"),
            F.sum("c").cast("long").alias("total_cents"),
        )
        .withColumn("n_orders", col("n_orders").cast("long"))
        .orderBy("bin")
    )
