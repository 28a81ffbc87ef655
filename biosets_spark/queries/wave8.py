"""Eighth-wave query inventory: corpus-statistics and training-mix
operators a large-scale LLM data pipeline runs on every refresh —
vocabulary statistics (Zipf head / hapax tail), within-document token
co-occurrence with PMI scoring, and temperature-scaled source mixing
(the ``n^alpha`` sampling rule used to flatten source imbalance when
building training mixtures).

Determinism discipline: every score input is an integer count; floats
appear only as single IEEE divisions / ln / pow of identical inputs,
and any SUM over floats goes through a DECIMAL cast first so the
aggregation order cannot leak into the result (queries.py module
docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators import text as T
from . import dfloor, q

# the oracle-side whitespace tokenizer matching operators.text.tokens
from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_vocab_stats",
    oracle=f"""
    WITH counts AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
      GROUP BY tok
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(c) AS BIGINT) AS total_tokens,
           CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS hapax_count,
           (CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE))
             AS type_token_ratio,
           (SELECT tok FROM counts ORDER BY c DESC, tok DESC LIMIT 1)
             AS top_token,
           (SELECT CAST(c AS BIGINT) FROM counts ORDER BY c DESC, tok DESC LIMIT 1)
             AS top_count
    FROM counts
    """,
    desc="Corpus vocabulary statistics (Zipf head / hapax tail): vocab "
         "size, total tokens, hapax count, type-token ratio, and the "
         "modal token — one explode plus map-side-combinable counts, "
         "then a single-row rollup. The modal token is a struct-max "
         "(count, token), fully tie-broken.",
    tags=["text", "agg"],
)
def q_vocab_stats(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("text")
    counts = (
        docs.select(F.explode(T.tokens(col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    top = F.max(F.struct(col("c"), col("tok")))
    return counts.agg(
        F.count("*").alias("vocab_size"),
        F.sum("c").alias("total_tokens"),
        F.count(F.when(col("c") == 1, 1)).alias("hapax_count"),
        (F.count("*") / F.sum("c")).alias("type_token_ratio"),
        top["tok"].alias("top_token"),
        top["c"].alias("top_count"),
    )


@q(
    "q_token_pmi",
    # mirrors token_cooccurrence's two scale levers exactly: the per-doc
    # alphabetical 4096-token cap (sort -> slice before pairing) and the
    # min_df=2 vocabulary prune (lossless here: a pair reaching
    # pair_count>=5 implies both tokens have df>=5).
    oracle=f"""
    WITH td AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id,
                   unnest(list_slice(list_sort(list_distinct({_TOKS_SQL})),
                                     1, 4096)) AS tok
            FROM documents)
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM td GROUP BY tok),
    kept AS (
      SELECT td.doc_id, td.tok FROM td
      JOIN dfreq ON dfreq.tok = td.tok
      WHERE dfreq.df >= 2
    ),
    pairs AS (
      SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS pair_count
      FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
      HAVING COUNT(*) >= 5
    )
    SELECT t1, t2, pair_count,
           FLOOR((LN((CAST(pair_count AS DOUBLE)
                     * (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents))
                    / (CAST(d1.df AS DOUBLE) * CAST(d2.df AS DOUBLE)))) * 1e4 + 0.5) / 1e4
             AS pmi
    FROM pairs
    JOIN dfreq d1 ON d1.tok = t1
    JOIN dfreq d2 ON d2.tok = t2
    ORDER BY LN((CAST(pair_count AS DOUBLE)
                 * (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents))
                / (CAST(d1.df AS DOUBLE) * CAST(d2.df AS DOUBLE))) DESC,
             t1, t2
    LIMIT 20
    """,
    desc="Top-20 token collocations by PMI over document-level "
         "presence: per-doc distinct tokens (capped at 4096/doc), "
         "min_df=2 vocabulary prune before the doc-id self-join "
         "(t1 < t2), integer counts everywhere; the ordering uses the "
         "EXACT pmi double (rounding only in the output column) with "
         "full (t1, t2) tie-break.",
    tags=["text", "join", "agg"],
)
def q_token_pmi(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    scored = T.token_cooccurrence(
        docs, min_pair_count=5, min_df=2, max_distinct_per_doc=4096)
    return (
        scored.orderBy(col("pmi").desc(), "t1", "t2")
        .limit(20)
        .select("t1", "t2", "pair_count", (dfloor((col("pmi")) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias("pmi"))
    )


@q(
    "q_mix_temperature",
    oracle="""
    WITH src AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (
      SELECT source, n,
             CAST(FLOOR((POW(CAST(n AS DOUBLE), 0.7)) * 1e8 + 0.5) / 1e8 AS DECIMAL(24,8)) AS wq
      FROM src
    )
    SELECT source, n,
           (CAST(wq AS DOUBLE)
                 / (SELECT CAST(SUM(wq) AS DOUBLE) FROM w)) AS share
    FROM w
    ORDER BY source
    """,
    desc="Temperature-scaled source mixing (alpha = 0.7): the n^alpha "
         "sampling rule that flattens source imbalance in training "
         "mixtures. pow() of an integer count is engine-identical; "
         "each weight is cast to DECIMAL(24,8) before the grand-total "
         "SUM so the normalizer is an exact decimal (order-free), and "
         "the share is one IEEE division, rounded for display.",
    # "cross" tag: the single-row normalizer crossJoin(broadcast) is a
    # deliberate BroadcastNestedLoopJoin (1-row build side)
    tags=["text", "agg", "cross"],
)
def q_mix_temperature(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("source")
    w = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "wq", (dfloor((F.pow(col("n").cast("double"), lit(0.7))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8))
            .cast("decimal(24,8)"))
    )
    total = w.agg(F.sum("wq").alias("_tw"))
    return (
        w.crossJoin(broadcast(total))
        .select(
            "source", "n",
            (col("wq").cast("double") / col("_tw").cast("double")).alias("share"),
        )
        .orderBy("source")
    )
