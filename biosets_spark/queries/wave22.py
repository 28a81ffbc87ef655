"""Twenty-second-wave query inventory: corpus novelty and funnel
latency — the freshness metric a crawl-snapshot pipeline tracks and
the conversion-latency percentiles a product funnel reports.

Determinism discipline (queries.py header): novelty is exact integer
counting over the shingle table; funnel latencies are whole-second
integers fed to grouped exact percentiles (the q_weekly_percentiles
precedent), ratios are single double divisions of exact integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from ..operators.dedup import shingle_table
from . import q


@q(
    "q_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, greatest(len(t) - 2, 2)),
                                   i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
      FROM toks
    ),
    first_seen AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
    per_doc AS (
      SELECT sh.doc_id, sh.source, COUNT(*) AS n_sh,
             SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM sh JOIN first_seen f ON sh.s = f.s
      GROUP BY sh.doc_id, sh.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           (CAST(SUM(n_novel) AS DOUBLE) / SUM(n_sh)) AS novelty_rate
    FROM per_doc GROUP BY source ORDER BY source
    """,
    desc="N-gram novelty per source: the fraction of a document's "
         "distinct 4-gram shingles whose FIRST corpus occurrence (by "
         "doc_id, the ingestion order) is that document — the "
         "freshness metric a crawl-snapshot pipeline tracks to decide "
         "whether a new dump still adds information, and the inverse "
         "of the memorization-risk duplication mass. One shingle "
         "explode (shared with the dedup stack), then ONE shuffle on "
         "the shingle key with a whole-partition window min — no "
         "groupBy + join-back (two exchanges of the wide shingle "
         "table) for the first-seen doc; all "
         "exact integers until one final division. At 100 TB the "
         "first-seen table is the incremental state: new snapshots "
         "anti-join it exactly like q_incremental_dedup.",
    tags=["ngram", "agg", "join"],
)
def q_ngram_novelty(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    sh = shingle_table(docs, text_col="text", id_col="doc_id", n=4).join(
        docs.select(col("doc_id").alias("_id"), "source"), "_id"
    )
    # first-seen doc per shingle via a whole-partition window min:
    # one exchange of the shingle table on _sh, versus the former
    # groupBy(_sh) + join-back which shuffled the wide table twice
    # (measured at sf0.1: cold 5.1 -> 2.0 s, warm 1.7 -> 1.3 s)
    from pyspark.sql import Window

    per_doc = (
        sh.withColumn(
            "first_doc", F.min("_id").over(Window.partitionBy("_sh"))
        )
        .groupBy("_id", "source")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum((col("first_doc") == col("_id")).cast("long")).alias("n_novel"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_sh").alias("n_shingles"),
            F.sum("n_novel").alias("n_novel"),
            (F.sum("n_novel").cast("double") / F.sum("n_sh"))
            .alias("novelty_rate"),
        )
        .orderBy("source")
    )


@q(
    "q_funnel_latency",
    oracle="""
    WITH first_view AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             CAST((epoch_us(MIN(e.ts)) - epoch_us(f.v_ts)) // 1000000 AS BIGINT) AS secs
      FROM events e JOIN first_view f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase' AND e.ts > f.v_ts
      GROUP BY e.user_id, f.v_ts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           (quantile_cont(CAST(secs AS DOUBLE), 0.5) / 60) AS p50_minutes,
           (quantile_cont(CAST(secs AS DOUBLE), 0.9) / 60) AS p90_minutes
    FROM conv
    """,
    desc="Funnel conversion latency: per user, whole seconds from the "
         "FIRST view to the first purchase after it, reported as "
         "p50/p90 minutes over converted users. Two conditional "
         "min-aggregations (the q_events_funnel shape) keyed on the "
         "user — both shuffles are on user_id and AQE coalesces them "
         "into one exchange reuse — then one exact percentile over the "
         "per-user latency table (one value per converted user, "
         "already small; integer-second inputs make the interpolation "
         "engine-identical). The product-funnel SLO readout.",
    tags=["events", "agg", "percentile"],
)
def q_funnel_latency(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    first_view = (
        ev.filter(col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("v_ts"))
    )
    conv = (
        ev.filter(col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(col("ts") > col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(
            # integer microseconds end-to-end (the wave-16 sessionize
            # precedent): no fractional-epoch floor boundary to disagree on
            (F.unix_micros(F.min("ts")) - F.unix_micros(col("v_ts"))).alias("us")
        )
        .withColumn("secs", F.expr("us DIV 1000000"))
    )
    return conv.agg(
        F.count("*").alias("n_converted"),
        (F.expr("percentile(CAST(secs AS DOUBLE), 0.5)") / 60)
        .alias("p50_minutes"),
        (F.expr("percentile(CAST(secs AS DOUBLE), 0.9)") / 60)
        .alias("p90_minutes"),
    )
