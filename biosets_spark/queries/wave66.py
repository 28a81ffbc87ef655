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

Determinism discipline: unit-vector components quantize the 1e-8 grid ->
DECIMAL(28,8) before the only cross-row sums (per-component, then a
64-term closed form); session ids come from the exact lag-gap +
running-count construction over integer microseconds with
(ts, event_id) tie-breaks; all rates are exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_embedding_anisotropy",
    oracle="""
    WITH norms AS (
      SELECT label, vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> FLOOR((x) * 1e6 + 0.5) / 1e6)
               AS vec,
             SQRT(CAST(list_sum(list_transform(
                    CAST(embedding AS DOUBLE[]),
                    x -> CAST(FLOOR(FLOOR((x) * 1e6 + 0.5) / 1e6 * FLOOR((x) * 1e6 + 0.5) / 1e6 * 1e12 + 0.5)
                              AS DECIMAL(38,0)))) AS DOUBLE) / 1e12) AS l2
      FROM embeddings
    ), comps AS (
      SELECT label, generate_subscripts(vec, 1) AS pos,
             CAST(FLOOR(unnest(vec) / l2 * 1e8 + 0.5) AS DECIMAL(28,0)) AS u
      FROM norms
    ), sums AS (
      SELECT label, pos, CAST(SUM(u) AS DECIMAL(38,0)) AS s, COUNT(*) AS n
      FROM comps GROUP BY label, pos
    ), agg AS (
      SELECT label, MAX(n) AS n,
             CAST(SUM(s * s) AS DOUBLE) / 1e16 AS norm2
      FROM sums GROUP BY label
    )
    SELECT label, CAST(n AS BIGINT) AS n_vectors,
           ((norm2 - n) / (CAST(n AS DOUBLE) * (n - 1)))
             AS mean_pairwise_cosine,
           (SQRT(norm2) / n) AS centroid_norm
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
         "quantize onto the engine-identical FLOOR(x*1e8 + 0.5) "
         "integer grid before the per-component sums; the squared "
         "component sums are then EXACT decimal arithmetic, so no "
         "accumulation order exists anywhere. Shuffles (label, pos, decimal) partial "
         "sums only — never vectors.",
    tags=["vector", "stats", "agg"],
)
def q_embedding_anisotropy(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    # all derived-double quantizers use the engine-identical integer
    # grid FLOOR(x*K + 0.5) (r9: ROUND-then-DECIMAL double-rounds
    # differently in DuckDB than Spark's BigDecimal HALF_UP); only the
    # RAW component keeps ROUND (both engines see the identical
    # parquet float, so its rounding agrees)
    sq = F.aggregate(
        F.transform(
            col("embedding"),
            lambda x: F.floor(
                (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)) * (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                * lit(1e12) + lit(0.5)
            ).cast("decimal(38,0)"),
        ),
        lit(0).cast("decimal(38,0)"),
        lambda acc, v: (acc + v).cast("decimal(38,0)"),
    )
    norms = emb.select(
        "label",
        F.transform(col("embedding"), lambda x: (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)))
        .alias("vec"),
        F.sqrt(sq.cast("double") / lit(1e12)).alias("l2"),
    )
    comps = norms.select(
        "label",
        F.posexplode("vec").alias("pos0", "comp"),
        "l2",
    ).select(
        "label",
        (col("pos0") + 1).alias("pos"),
        F.floor(col("comp") / col("l2") * lit(1e8) + lit(0.5))
        .cast("decimal(28,0)").alias("u"),
    )
    sums = comps.groupBy("label", "pos").agg(
        F.sum("u").cast("decimal(38,0)").alias("s"), F.count("*").alias("n")
    )
    # s is an exact integer on the 1e-8 grid, so sum(s*s) is EXACT
    # decimal arithmetic — the third quantizer disappears entirely
    agg = sums.groupBy("label").agg(
        F.max("n").alias("n"),
        (F.sum(col("s") * col("s")).cast("double") / lit(1e16)).alias("norm2"),
    )
    nd = col("n").cast("double")
    return agg.select(
        "label",
        col("n").cast("long").alias("n_vectors"),
        # try_divide: a single-vector label has no pairs -> NULL,
        # matching the oracle's x/0 = NULL
        (F.try_divide(col("norm2") - col("n"), nd * (col("n") - 1)))
        .alias("mean_pairwise_cosine"),
        (F.sqrt(col("norm2")) / col("n")).alias("centroid_norm"),
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
           (CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL
                                       AND t_click > t_view
                                       AND t_buy > t_click) AS DOUBLE)
                 / NULLIF(COUNT(*) FILTER (WHERE t_view IS NOT NULL), 0))
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
        (F.count(F.when(bought, 1)).cast("double")
            / F.nullif(F.count(F.when(viewed, 1)).cast("double"), lit(0.0))).alias("session_conversion"),
    )
