"""Sixty-fourth-wave query inventory: corpus lineage and arrival
process — the VOCABULARY-OVERLAP matrix between sources (set Jaccard
over each source's distinct token vocabulary: the corpus-lineage
signal that flags mirrored/scraped-from-each-other sources, which
q_burrows_delta's frequency profile and q_crosslingual_dup's
doc-level pairs both look past) and the INTER-ARRIVAL EXPONENTIAL
FIT audit (is each event type's arrival process Poisson? Coefficient
of variation of the gaps plus the exact KS distance against the
fitted exponential — the queueing-model assumption check behind any
capacity plan; q_burstiness reports the related (CoV-1)/(CoV+1)
scalar but never tests the distribution itself).

Determinism discipline: vocabularies are exact distinct sets and
Jaccard exact integer ratios; inter-arrival gaps are exact integer
microseconds from epoch-micros with (ts, event_id) tie-break; gap
moments are exact DECIMAL(38,0) sums; the empirical CDF uses the
distinct-gap cumulative-count construction (no empty-partition
window) and each KS term is one closed-form double over identical
inputs, so the max is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_vocab_overlap",
    oracle=f"""
    WITH vocab AS (
      SELECT DISTINCT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ), vs AS (
      SELECT source, COUNT(*) AS v FROM vocab GROUP BY source
    ), common AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_common
      FROM vocab a JOIN vocab b
        ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT c.source_a, c.source_b,
           CAST(va.v AS BIGINT) AS vocab_a,
           CAST(vb.v AS BIGINT) AS vocab_b,
           CAST(c.n_common AS BIGINT) AS n_common,
           (CAST(c.n_common AS DOUBLE)
                 / (va.v + vb.v - c.n_common)) AS jaccard
    FROM common c
    JOIN vs va ON c.source_a = va.source
    JOIN vs vb ON c.source_b = vb.source
    ORDER BY CAST(c.n_common AS DOUBLE) / (va.v + vb.v - c.n_common) DESC,
             c.source_a, c.source_b
    LIMIT 15
    """,
    desc="Vocabulary-overlap matrix: set Jaccard between each source "
         "pair's distinct token vocabularies, top-15 most-overlapping "
         "pairs — the corpus-lineage audit that catches sources "
         "scraping or mirroring each other (near-identical "
         "vocabularies) even when document-level dedup finds no "
         "shared docs and q_burrows_delta's style profile differs. "
         "The corpus collapses to the distinct (source, token) table; "
         "the token-equality self-join fans out at most "
         "C(n_sources,2) rows PER TOKEN (bounded by the source count "
         "squared, independent of corpus size); Jaccard is an exact "
         "integer ratio, ordered on the unrounded double with "
         "source tie-breaks so both engines pick the same 15.",
    tags=["text", "dedup", "join", "agg"],
)
def q_vocab_overlap(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("source", "text")
    vocab = (
        docs.select("source", F.explode(tokens(col("text"))).alias("tok"))
        .distinct()
    )
    vs = vocab.groupBy("source").agg(F.count("*").alias("v"))
    a, b = vocab.alias("a"), vocab.alias("b")
    common = (
        a.join(
            b,
            (col("a.tok") == col("b.tok"))
            & (col("a.source") < col("b.source")),
        )
        .groupBy(
            col("a.source").alias("source_a"),
            col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    va = vs.select(col("source").alias("source_a"), col("v").alias("vocab_a"))
    vb = vs.select(col("source").alias("source_b"), col("v").alias("vocab_b"))
    jac = col("n_common").cast("double") / (
        col("vocab_a") + col("vocab_b") - col("n_common")
    )
    return (
        common.join(broadcast(va), "source_a")
        .join(broadcast(vb), "source_b")
        .select(
            "source_a", "source_b",
            col("vocab_a").cast("long").alias("vocab_a"),
            col("vocab_b").cast("long").alias("vocab_b"),
            col("n_common").cast("long").alias("n_common"),
            (jac).alias("jaccard"),
            jac.alias("_j"),
        )
        .orderBy(col("_j").desc(), "source_a", "source_b")
        .limit(15)
        .drop("_j")
    )


@q(
    "q_interarrival_fit",
    oracle="""
    WITH ordered AS (
      SELECT event_type, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS prev
      FROM events
    ), gaps AS (
      SELECT event_type, us - prev AS g FROM ordered WHERE prev IS NOT NULL
    ), mom AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(g AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(g AS DECIMAL(38,0)) * g) AS DOUBLE) AS s2
      FROM gaps GROUP BY event_type
    ), dist AS (
      SELECT event_type, g, COUNT(*) AS c FROM gaps GROUP BY 1, 2
    ), cdf AS (
      SELECT event_type, g,
             SUM(c) OVER (PARTITION BY event_type ORDER BY g
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_le,
             COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY g
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS cum_lt
      FROM dist
    ), ks AS (
      SELECT c.event_type,
             MAX(GREATEST(
               ABS(CAST(c.cum_le AS DOUBLE) / m.n
                   - (1 - EXP(-c.g / (m.s1 / m.n)))),
               ABS(CAST(c.cum_lt AS DOUBLE) / m.n
                   - (1 - EXP(-c.g / (m.s1 / m.n))))
             )) AS d
      FROM cdf c JOIN mom m ON c.event_type = m.event_type
      GROUP BY c.event_type
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n_gaps,
           (m.s1 / m.n / 1e6) AS mean_gap_sec,
           (SQRT(m.s2 / m.n - POWER(m.s1 / m.n, 2))
                 / (m.s1 / m.n)) AS cov,
           (k.d) AS ks_distance,
           k.d > 1.358 / SQRT(m.n) AS reject_exponential_5pct
    FROM mom m JOIN ks k ON m.event_type = k.event_type
    ORDER BY m.event_type
    """,
    desc="Exponential inter-arrival audit per event type: gaps in "
         "exact integer microseconds ((ts, event_id) tie-broken lag), "
         "their coefficient of variation (1 for a Poisson process), "
         "and the exact two-sided KS distance between the empirical "
         "gap CDF and the moment-fitted Exp(1/mean) — with the "
         "5%-level rejection flag D > 1.358/sqrt(n). This TESTS the "
         "Poisson-arrivals assumption every queueing-style capacity "
         "model (and q_peak_concurrency's interpretation) rests on, "
         "where q_burstiness only scores it. Gap moments are exact "
         "DECIMAL(38,0) sums; the CDF uses the distinct-gap "
         "cumulative construction (parallelism = distinct gaps, "
         "never one task per type scanning raw events); each KS term "
         "is a closed-form double over identical inputs so the MAX "
         "is engine-identical.",
    tags=["events", "stats", "window", "agg"],
)
def q_interarrival_fit(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(col("ts"))
    gaps = (
        ev.select("event_type", "event_id", "ts")
        .withColumn("g", us - F.lag(us).over(w))
        .filter(col("g").isNotNull())
        .select("event_type", "g")
    )
    mom = gaps.groupBy(col("event_type").alias("et_m")).agg(
        F.count("*").alias("n"),
        F.sum(col("g").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(col("g").cast("decimal(38,0)") * col("g")).cast("double")
        .alias("s2"),
    )
    dist = gaps.groupBy("event_type", "g").agg(F.count("*").alias("c"))
    w_le = (
        Window.partitionBy("event_type").orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lt = (
        Window.partitionBy("event_type").orderBy("g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdf = dist.select(
        "event_type", "g",
        F.sum("c").over(w_le).alias("cum_le"),
        F.coalesce(F.sum("c").over(w_lt), F.lit(0)).alias("cum_lt"),
    )
    mean_g = col("s1") / col("n")
    f_exp = 1 - F.exp(-col("g") / mean_g)
    ks = (
        cdf.join(broadcast(mom), col("event_type") == col("et_m"))
        .groupBy("event_type")
        .agg(
            F.max(
                F.greatest(
                    F.abs(col("cum_le").cast("double") / col("n") - f_exp),
                    F.abs(col("cum_lt").cast("double") / col("n") - f_exp),
                )
            ).alias("d")
        )
    )
    out = mom.join(ks, col("et_m") == col("event_type"))
    return out.select(
        "event_type",
        col("n").cast("long").alias("n_gaps"),
        (mean_g / 1e6).alias("mean_gap_sec"),
        (F.sqrt(col("s2") / col("n") - F.pow(mean_g, 2)) / mean_g).alias("cov"),
        (col("d")).alias("ks_distance"),
        (col("d") > 1.358 / F.sqrt(col("n").cast("double")))
        .alias("reject_exponential_5pct"),
    ).orderBy("event_type")
