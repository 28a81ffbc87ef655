"""Sixty-fifth-wave query inventory: truncation dedup and embedding
health — TRUNCATION-DUPLICATE detection (pairs where one document is
an exact PREFIX of another: the crawl-artifact class — truncated
fetches, pagination cuts, excerpt pages — that exact-hash dedup
misses because the hashes differ and Jaccard-threshold dedup misses
when the long doc dwarfs the short one; blocked on a head-hash so no
O(n^2) text comparison ever runs) and the EMBEDDING NORM AUDIT
(per-label L2-norm profile + degenerate-vector counts: the health
check a pipeline runs BEFORE trusting any cosine-based ANN, since
near-zero or wildly-scaled vectors silently poison q_knn_* results).

Determinism discipline: prefix candidacy blocks on the exact
64-char head and verifies with exact string equality; norms are
sums of the 1e-6 grid -quantized squared components accumulated in
DECIMAL(38,12) (order-free), with a single closed-form sqrt per
vector; every rate is an exact integer ratio.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_dedup_truncation",
    oracle="""
    WITH docs AS (
      SELECT doc_id, text, LENGTH(text) AS n FROM documents
    ), long_pairs AS (
      SELECT a.doc_id AS id_short, b.doc_id AS id_long,
             a.n AS len_short, b.n AS len_long
      FROM docs a JOIN docs b
        ON SUBSTRING(a.text, 1, 32) = SUBSTRING(b.text, 1, 32)
       AND a.n < b.n
       AND SUBSTRING(b.text, 1, a.n) = a.text
      WHERE a.n >= 32
    ), short_prefixes AS (
      SELECT b.doc_id, b.n, CAST(r.range AS INTEGER) AS plen,
             SUBSTRING(b.text, 1, CAST(r.range AS INTEGER)) AS pref
      FROM docs b, range(1, 32) r
      WHERE b.n > r.range
    ), short_pairs AS (
      SELECT a.doc_id AS id_short, p.doc_id AS id_long,
             a.n AS len_short, p.n AS len_long
      FROM docs a JOIN short_prefixes p
        ON a.n = p.plen AND a.text = p.pref
      WHERE a.n < 32
    ), blocked AS (
      SELECT * FROM long_pairs UNION ALL SELECT * FROM short_pairs
    )
    SELECT id_short, id_long,
           CAST(len_short AS BIGINT) AS len_short,
           CAST(len_long AS BIGINT) AS len_long,
           (CAST(len_short AS DOUBLE) / len_long) AS kept_fraction
    FROM blocked ORDER BY id_short, id_long
    """,
    desc="Truncation-duplicate pairs: document A is an exact prefix "
         "of a strictly longer document B — the crawl-artifact dup "
         "class (cut-off fetches, pagination splits, excerpt pages) "
         "that q_dedup_exact cannot see (different hashes) and "
         "Jaccard-threshold dedup misses when len_short/len_long is "
         "small; kept_fraction says how much of the long doc the "
         "short one covers. LOSSLESS blocking in two branches: short "
         "docs >= 32 chars equi-join on the exact 32-char head and "
         "verify with one substring equality; docs under 32 chars "
         "equi-join on (length, text) against every doc's exploded "
         "1..31-char prefixes (bounded 31-row fan-out), where the "
         "key IS the verification. No all-pairs scan exists at any "
         "corpus size; template-heavy corpora should raise the block "
         "width. Pure JVM string ops; heads+ids shuffle, bodies move "
         "only for blocked candidates.",
    tags=["dedup", "text", "join"],
)
def q_dedup_truncation(spark, sf_dir):
    docs = (
        tables.load(spark, sf_dir, "documents")
        .select("doc_id", "text", F.length("text").alias("n"))
    )
    a = docs.alias("a")
    b = docs.alias("b")
    # branch 1 — short doc has >= 32 chars: block on the exact 32-char
    # head (equi-join), then verify the long doc's first len_short
    # chars equal the short doc (expr() because substring's length
    # must be a column here)
    long_pairs = (
        a.filter(col("a.n") >= 32)
        .join(
            b,
            (F.substring(col("a.text"), 1, 32)
             == F.substring(col("b.text"), 1, 32))
            & (col("a.n") < col("b.n"))
            & (F.expr("substring(b.text, 1, a.n)") == col("a.text")),
        )
        .select(
            col("a.doc_id").alias("id_short"),
            col("b.doc_id").alias("id_long"),
            col("a.n").alias("len_short"),
            col("b.n").alias("len_long"),
        )
    )
    # branch 2 — short doc under 32 chars: explode every doc's 1..31
    # char prefixes (bounded fan-out) and equi-join on (length, text),
    # which IS the verification; a.n < b.n holds because b.n > plen
    prefixes = (
        docs.select(
            col("doc_id").alias("p_id"), col("n").alias("p_n"),
            F.explode(F.sequence(F.lit(1), F.lit(31))).alias("plen"),
            col("text").alias("p_text"),
        )
        .filter(col("p_n") > col("plen"))
        .select(
            "p_id", "p_n", "plen",
            F.expr("substring(p_text, 1, plen)").alias("pref"),
        )
    )
    short_pairs = (
        docs.filter(col("n") < 32)
        .join(
            prefixes,
            (col("n") == col("plen")) & (col("text") == col("pref")),
        )
        .select(
            col("doc_id").alias("id_short"),
            col("p_id").alias("id_long"),
            col("n").alias("len_short"),
            col("p_n").alias("len_long"),
        )
    )
    return (
        long_pairs.unionByName(short_pairs)
        .select(
            "id_short", "id_long",
            col("len_short").cast("long").alias("len_short"),
            col("len_long").cast("long").alias("len_long"),
            (col("len_short").cast("double") / col("len_long"))
            .alias("kept_fraction"),
        )
        .orderBy("id_short", "id_long")
    )


@q(
    "q_embedding_norms",
    oracle="""
    WITH norms AS (
      SELECT label, vec_id,
             SQRT(CAST(list_sum(list_transform(
                    CAST(embedding AS DOUBLE[]),
                    x -> CAST(FLOOR(FLOOR((x) * 1e6 + 0.5) / 1e6 * FLOOR((x) * 1e6 + 0.5) / 1e6 * 1e12 + 0.5)
                              AS DECIMAL(38,0))))
                  AS DOUBLE) / 1e12) AS l2
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           (CAST(SUM(CAST(FLOOR(l2 * 1e8 + 0.5) AS DECIMAL(28,0))) AS DOUBLE)
                 / 1e8 / COUNT(*)) AS mean_norm,
           (MIN(l2)) AS min_norm,
           (MAX(l2)) AS max_norm,
           CAST(COUNT(*) FILTER (WHERE l2 < 1e-6) AS BIGINT) AS n_degenerate,
           (MAX(l2) / NULLIF(MIN(l2), 0)) AS norm_spread
    FROM norms GROUP BY label ORDER BY label
    """,
    desc="Embedding L2-norm audit per label: mean/min/max norm, the "
         "count of degenerate (near-zero) vectors, and the max/min "
         "spread — the health gate a pipeline runs BEFORE any "
         "cosine ANN, because a zero vector makes cosine undefined "
         "and a 100x norm spread means dot-product shortcuts "
         "(q_knn_* uses normalized vectors) quietly change ranking. "
         "Each squared component quantizes onto the "
         "engine-identical FLOOR(x*1e12+0.5) integer grid inside a "
         "per-row fold (order-free within the vector), one sqrt per "
         "vector, and the per-label mean sums 1e-8-grid norms — no cross-row float "
         "accumulation anywhere. One scan, one combinable agg; "
         "norms are per-row expressions (JVM higher-order "
         "functions, no Python).",
    tags=["vector", "stats", "agg"],
)
def q_embedding_norms(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    # r9: derived-double quantizers use the engine-identical integer
    # grid FLOOR(x*K + 0.5) — ROUND-then-DECIMAL double-rounds
    # differently across engines on sqrt/product-derived values
    sq = F.aggregate(
        F.transform(
            col("embedding"),
            lambda x: F.floor(
                (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)) * (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                * lit(1e12) + lit(0.5)
            ).cast("decimal(38,0)"),
        ),
        lit(0).cast("decimal(38,0)"),
        # re-cast inside the merge: decimal+decimal widens under
        # Spark's precision-loss rules and breaks the fold type
        lambda acc, v: (acc + v).cast("decimal(38,0)"),
    )
    norms = emb.select(
        "label", F.sqrt(sq.cast("double") / lit(1e12)).alias("l2"))
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            (F.sum(F.floor(col("l2") * lit(1e8) + lit(0.5))
                   .cast("decimal(28,0)"))
                .cast("double") / lit(1e8) / F.count("*")).alias("mean_norm"),
            (F.min("l2")).alias("min_norm"),
            (F.max("l2")).alias("max_norm"),
            F.count(F.when(col("l2") < 1e-6, 1)).cast("long")
            .alias("n_degenerate"),
            (F.max("l2") / F.nullif(F.min("l2"), lit(0.0))).alias("norm_spread"),
        )
        .orderBy("label")
    )
