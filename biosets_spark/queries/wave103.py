"""Wave 103 (r10): batch retrieval and corpus observability —
multi-query kNN resolved in one corpus scan, IVF cell-occupancy
balance, and the one-call corpus health report.

Determinism notes: the kNN ranking outputs ranks, not sims, under the
established cross-engine ordering assumption (ext.py q_knn_lsh note:
no |sim| near-ties in the test corpus); IVF assignment ties resolve
to the highest cell in BOTH engines (array_max struct order / ORDER
BY sim DESC, cell DESC); report counts are exact integers and the
single division is double-over-exact-ints.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from ..operators import similarity as S
from . import q
from .wave102 import _NORM_SPARK, _NORM_SQL


@q(
    "q_knn_batch",
    oracle="""
    WITH qs AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id >= 10
    ),
    scored AS (
      SELECT qs.qid, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY qs.qid
               ORDER BY list_cosine_similarity(c.emb, qs.qv) DESC, c.vec_id
             ) AS rnk
      FROM corpus c CROSS JOIN qs
    )
    SELECT qid, neighbor_id, rnk FROM scored WHERE rnk <= 3
    ORDER BY qid, rnk
    """,
    desc="batch kNN: 10 query vectors resolved against the corpus in "
         "ONE scan — an Arrow kernel scores all pairs (bit-identical "
         "to the cosine expression) and keeps each query's LOCAL "
         "top-3 per batch, so only k x batches x queries triples "
         "reach the tiny exact merge; the corpus never shuffles. The "
         "retrieval shape a serving pipeline uses instead of one job "
         "per query.",
    tags=["similarity"],
)
def q_knn_batch(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(col("vec_id") < 10)
        .orderBy("vec_id").collect()
    ]
    corpus = emb.filter(col("vec_id") >= 10)
    return (
        S.knn_batch(corpus, qs, k=3)
        .select("qid", "neighbor_id", "rnk")
        .orderBy("qid", "rnk")
    )


@q(
    "q_ivf_cell_balance",
    oracle="""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS cell,
             emb AS cemb
      FROM base ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 16
    ),
    assign AS (
      SELECT b.vec_id, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY list_cosine_similarity(b.emb, c.cemb) DESC, c.cell DESC
             ) AS rn
      FROM base b CROSS JOIN cents c
    )
    SELECT cell, COUNT(*) AS n_vectors
    FROM assign WHERE rn = 1
    GROUP BY cell ORDER BY cell
    """,
    desc="IVF cell-occupancy balance (16 md5-sampled centroids): the "
         "tuning observable for the IVF ANN family — a fat cell means "
         "probe cost concentrates, empty cells waste the index. "
         "Assignment runs the Arrow kernel (n_cells > 8) computing "
         "bit-identical doubles to the literal path; only (id, cell) "
         "reaches the aggregate.",
    tags=["similarity", "ivf"],
)
def q_ivf_cell_balance(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _ = S.ivf_build(emb, n_cells=16)
    return (
        assigned.groupBy(col("_cell").alias("cell"))
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


@q(
    "q_corpus_report",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
           CAST(COUNT(*) - COUNT(DISTINCT md5({_NORM_SQL.format(c='text')}))
                AS BIGINT) AS n_norm_dups,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    desc="one-call corpus health report per source: exact-duplicate "
         "and normalized-duplicate counts plus length stats — the "
         "first thing a pipeline owner asks of a new corpus drop. "
         "Scale: one hash-shuffle on source; the distinct fingerprints "
         "partial-aggregate map-side; document text reduces to md5 / "
         "normalized hashes before any exchange.",
    tags=["text", "dedup", "pipeline"],
)
def q_corpus_report(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents")
    return (
        d.select(
            "source", "n_chars",
            F.md5(col("text")).alias("_fp"),
            F.md5(_NORM_SPARK(col("text"))).alias("_norm"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.count("*") - F.countDistinct("_fp")).alias("n_exact_dups"),
            (F.count("*") - F.countDistinct("_norm")).alias("n_norm_dups"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            (F.sum("n_chars").cast("double") / F.count("*"))
            .alias("avg_chars"),
        )
        .orderBy("source")
    )
