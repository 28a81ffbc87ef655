"""Sixteenth-wave query inventory: two product-analytics staples over
the event archive — exact rolling 7-day active users (the windowed
COUNT DISTINCT that plain window frames cannot express) and
first-touch session attribution built on the microsecond-exact batch
sessionizer.

Determinism discipline follows queries.py: integer-only outputs,
total per-key orders with unique-id tie-breaks, microsecond epoch
arithmetic mirrored on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import q


@q(
    "q_rolling_active_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    contrib AS (
      SELECT d + CAST(o AS INT) AS day, user_id
      FROM days CROSS JOIN (SELECT unnest(range(7)) AS o)
    ),
    spine AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT spine.day, CAST(COUNT(DISTINCT contrib.user_id) AS BIGINT) AS mau7
    FROM spine JOIN contrib ON contrib.day = spine.day
    GROUP BY spine.day ORDER BY spine.day
    """,
    desc="Exact rolling 7-day active users per day — the windowed "
         "COUNT DISTINCT no frame can express: each (user, active "
         "day) is deduped FIRST (at most 365·users rows/year survive, "
         "regardless of event volume), then fans out to the 7 days it "
         "keeps the user 'active' for, and a distinct count per day "
         "closes it. The fan-out factor is the window length, bounded "
         "and constant — at 100 TB of raw events the expensive part "
         "(the dedup) is one combinable groupBy, and nothing "
         "downstream ever touches raw event rows.",
    tags=["events", "agg", "window", "cross"],
)
def q_rolling_active_users(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    days = ev.select(col("ts").cast("date").alias("d"), "user_id").distinct()
    contrib = days.select(
        F.explode(F.sequence(col("d"), F.date_add(col("d"), 6))).alias("day"),
        "user_id",
    )
    spine = ev.select(col("ts").cast("date").alias("day")).distinct()
    return (
        spine.join(contrib, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("mau7"))
        .orderBy("day")
    )


@q(
    "q_first_touch_attribution",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    firsts AS (
      SELECT user_id, session_id, ts, event_id, event_type,
             FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id, session_id ORDER BY ts, event_id
             ) AS first_touch
      FROM sess
    )
    SELECT first_touch, CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM firsts WHERE event_type = 'purchase'
    GROUP BY first_touch ORDER BY n_purchases DESC, first_touch
    """,
    desc="First-touch attribution: every purchase is credited to the "
         "event type that OPENED its 30-minute-gap session — "
         "sessionize (lag + running sum over one (user, ts, id) "
         "exchange+sort, microsecond-exact gaps) followed by a "
         "first_value window over the SAME partitioning plus the "
         "session id, so no additional exchange is needed; the "
         "attribution join is a window, not a self-join.",
    tags=["events", "window", "agg"],
)
def q_first_touch_attribution(spark, sf_dir):
    from ..operators.events import sessionize

    ev = tables.load(spark, sf_dir, "events")
    sess = sessionize(ev, gap_minutes=30)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    labeled = sess.withColumn("first_touch", F.first("event_type").over(w))
    return (
        labeled.filter(col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy(col("n_purchases").desc(), "first_touch")
    )
