"""Sixty-sixth-wave query inventory: representation geometry and
session conversion — EMBEDDING ANISOTROPY (the mean pairwise cosine
of the normalized vectors per label, computed EXACTLY in one pass
via the centroid identity sum_{i!=j} u_i.u_j = ||sum u||^2 - n: the
representation-collapse diagnostic — anisotropy near 1 means the
vectors point one way and cosine similarity is meaningless — that
q_embedding_norms' scale audit cannot see) and SESSION-LEVEL
CONVERSION (view -> click -> purchase strictly ordered INSIDE a
30-minute session: the funnel at the granularity product analytics
actually bills, where q_events_funnel's user-lifetime ordering
counts conversions that span days).

Determinism discipline: unit-vector components quantize ROUND(,8)->
DECIMAL(28,8) before the only cross-row sums (per-component, then a
64-term closed form); session ids come from the exact lag-gap +
running-count construction over integer microseconds with
(ts, event_id) tie-breaks; all rates are exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from . import tables
from .queries import q


@q(
    "q_embedding_anisotropy",
    oracle="""
    WITH norms AS (
      SELECT label, vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> ROUND(x, 6))
               AS vec,
             SQRT(CAST(list_sum(list_transform(
                    CAST(embedding AS DOUBLE[]),
                    x -> CAST(ROUND(ROUND(x, 6) * ROUND(x, 6), 12)
                              AS DECIMAL(38,12)))) AS DOUBLE)) AS l2
      FROM embeddings
    ), comps AS (
      SELECT label, generate_subscripts(vec, 1) AS pos,
             CAST(ROUND(unnest(vec) / l2, 8) AS DECIMAL(28,8)) AS u
      FROM norms
    ), sums AS (
      SELECT label, pos, CAST(SUM(u) AS DOUBLE) AS s, COUNT(*) AS n
      FROM comps GROUP BY label, pos
    ), agg AS (
      SELECT label, MAX(n) AS n,
             CAST(SUM(CAST(ROUND(s * s, 10) AS DECIMAL(38,10))) AS DOUBLE)
               AS norm2
      FROM sums GROUP BY label
    )
    SELECT label, CAST(n AS BIGINT) AS n_vectors,
           ROUND((norm2 - n) / (CAST(n AS DOUBLE) * (n - 1)), 6)
             AS mean_pairwise_cosine,
           ROUND(SQRT(norm2) / n, 6) AS centroid_norm
    FROM agg ORDER BY label
    """,
    desc="Embedding anisotropy per label: the EXACT mean pairwise "
         "cosine of the unit-normalized vectors via the centroid "
         "identity (sum_{i!=j} u_i.u_j = ||sum_i u_i||^2 - n) — one "
         "pass, no pair join, where a naive check would cost "
         "O(n^2 d). Mean cosine near 1 is representation collapse "
         "(all vectors share a dominant direction and cosine-based "
         "retrieval loses discrimination — the known anisotropy "
         "pathology of contextual embedding spaces); centroid_norm "
         "= ||mean u|| is its square root twin. Unit components "
         "quantize ROUND(,8)->DECIMAL(28,8) before the per-"
         "component sums and the 64 squared sums quantize again "
         "before the closing 64-term sum, so no accumulation order "
         "exists anywhere. Shuffles (label, pos, decimal) partial "
         "sums only — never vectors.",
    tags=["vector", "stats", "agg"],
)
def q_embedding_anisotropy(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(
            col("embedding"),
            lambda x: F.round(
                F.round(x.cast("double"), 6) * F.round(x.cast("double"), 6), 12
            ).cast("decimal(38,12)"),
        ),
        lit(0).cast("decimal(38,12)"),
        lambda acc, v: (acc + v).cast("decimal(38,12)"),
    )
    norms = emb.select(
        "label",
        F.transform(col("embedding"), lambda x: F.round(x.cast("double"), 6))
        .alias("vec"),
        F.sqrt(sq.cast("double")).alias("l2"),
    )
    comps = norms.select(
        "label",
        F.posexplode("vec").alias("pos0", "comp"),
        "l2",
    ).select(
        "label",
        (col("pos0") + 1).alias("pos"),
        F.round(col("comp") / col("l2"), 8).cast("decimal(28,8)").alias("u"),
    )
    sums = comps.groupBy("label", "pos").agg(
        F.sum("u").cast("double").alias("s"), F.count("*").alias("n")
    )
    agg = sums.groupBy("label").agg(
        F.max("n").alias("n"),
        F.sum(F.round(col("s") * col("s"), 10).cast("decimal(38,10)"))
        .cast("double").alias("norm2"),
    )
    nd = col("n").cast("double")
    return agg.select(
        "label",
        col("n").cast("long").alias("n_vectors"),
        # try_divide: a single-vector label has no pairs -> NULL,
        # matching the oracle's x/0 = NULL
        F.round(F.try_divide(col("norm2") - col("n"), nd * (col("n") - 1)), 6)
        .alias("mean_pairwise_cosine"),
        F.round(F.sqrt(col("norm2")) / col("n"), 6).alias("centroid_norm"),
    ).orderBy("label")


@q(
    "q_session_conversion",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts)
                       - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 * 1000000
                  OR LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, event_id, event_type, us,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM ordered
    ), stages AS (
      SELECT user_id, sid,
             MIN(us) FILTER (WHERE event_type = 'view') AS t_view,
             MIN(us) FILTER (WHERE event_type = 'click') AS t_click,
             MIN(us) FILTER (WHERE event_type = 'purchase') AS t_buy
      FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT)
             AS n_view,
           CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL
                                 AND t_click > t_view) AS BIGINT)
             AS n_view_click,
           CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL
                                 AND t_click > t_view
                                 AND t_buy > t_click) AS BIGINT)
             AS n_full_funnel,
           ROUND(CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL
                                       AND t_click > t_view
                                       AND t_buy > t_click) AS DOUBLE)
                 / NULLIF(COUNT(*) FILTER (WHERE t_view IS NOT NULL), 0), 6)
             AS session_conversion
    FROM stages
    """,
    desc="Session-level conversion funnel: within each 30-minute-gap "
         "session (exact lag-gap flag + running count over integer "
         "microseconds, (ts, event_id) tie-broken), did a view "
         "precede a click precede a purchase — the funnel at the "
         "granularity product analytics reports, where "
         "q_events_funnel's user-lifetime ordering credits "
         "conversions days apart and q_events_sessions only counts "
         "sessions. Stage times are exact MIN-microsecond integers "
         "per session; strict inequalities make the ordering "
         "unambiguous under ties; every rate is an exact integer "
         "ratio. One shuffle on user_id for the session windows, "
         "then a combinable per-session agg.",
    tags=["events", "window", "agg"],
)
def q_session_conversion(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    us = F.unix_micros(col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.when(
            (us - F.lag(us).over(w) > 1800 * 1_000_000)
            | F.lag(us).over(w).isNull(), 1
        ).otherwise(0).alias("new_sess"),
    )
    w_run = (
        Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ordered.withColumn("sid", F.sum("new_sess").over(w_run))
    stages = sess.groupBy("user_id", "sid").agg(
        F.min(F.when(col("event_type") == "view", col("us"))).alias("t_view"),
        F.min(F.when(col("event_type") == "click", col("us"))).alias("t_click"),
        F.min(F.when(col("event_type") == "purchase", col("us"))).alias("t_buy"),
    )
    viewed = col("t_view").isNotNull()
    clicked = viewed & (col("t_click") > col("t_view"))
    bought = clicked & (col("t_buy") > col("t_click"))
    return stages.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.count(F.when(viewed, 1)).cast("long").alias("n_view"),
        F.count(F.when(clicked, 1)).cast("long").alias("n_view_click"),
        F.count(F.when(bought, 1)).cast("long").alias("n_full_funnel"),
        F.round(
            F.count(F.when(bought, 1)).cast("double")
            / F.nullif(F.count(F.when(viewed, 1)).cast("double"), lit(0.0)),
            6,
        ).alias("session_conversion"),
    )
