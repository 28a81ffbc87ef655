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


@q(
    "q_change_feed_diff",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 1 THEN 'D' ELSE 'U' END AS op,
             o_totalprice + 10.0 AS new_price
      FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders),
             'I', o_totalprice * 2
      FROM orders WHERE o_orderkey % 11 = 2
    ),
    merged AS (
      SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
             CASE WHEN t.o_orderkey IS NULL THEN 'N'
                  ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN t.o_orderkey IS NULL THEN s.new_price
                  WHEN s.o_orderkey IS NOT NULL AND s.op = 'U' THEN s.new_price
                  ELSE t.o_totalprice END AS o_totalprice
      FROM t FULL JOIN src s ON t.o_orderkey = s.o_orderkey
      WHERE NOT (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                 AND s.op = 'D')
    ),
    ins AS (
      SELECT m.o_orderkey FROM merged m LEFT JOIN t USING (o_orderkey)
      WHERE t.o_orderkey IS NULL
    ),
    del AS (
      SELECT t.o_orderkey FROM t LEFT JOIN merged m USING (o_orderkey)
      WHERE m.o_orderkey IS NULL
    ),
    upd AS (
      SELECT t.o_orderkey FROM t JOIN merged m USING (o_orderkey)
      WHERE t.o_orderstatus IS DISTINCT FROM m.o_orderstatus
         OR t.o_totalprice IS DISTINCT FROM m.o_totalprice
    )
    SELECT * FROM (
      SELECT 'delete' AS change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM del
      UNION ALL
      SELECT 'insert', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(o_orderkey) AS BIGINT) FROM ins
      UNION ALL
      SELECT 'update_postimage', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(o_orderkey) AS BIGINT) FROM upd
      UNION ALL
      SELECT 'update_preimage', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(o_orderkey) AS BIGINT) FROM upd
    ) ORDER BY change_type
    """,
    desc="change-data-feed classification of the q_merge_upsert CDC "
         "batch: the row-level diff (insert / delete / "
         "update_preimage / update_postimage, Delta-CDF shape) the "
         "versioned table's feed writer persists per commit, checked "
         "relationally via sources.sink.frame_changes — one full "
         "outer join on the key, presence sentinels, null-safe "
         "inequality across data columns. All four change types are "
         "always present in the output (zero rows -> count 0), so "
         "the shape is stable at every sf.",
    tags=["merge", "cdf", "join", "cross"],
)
def q_change_feed_diff(spark, sf_dir):
    from pyspark.sql.functions import broadcast

    from ..operators.merge import merge_into
    from ..sources.sink import frame_changes

    orders = tables.load(spark, sf_dir, "orders")
    target = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = orders.where(
        (col("o_orderkey") % 3 == 0) | (col("o_orderkey") % 7 == 1)
    ).select(
        "o_orderkey",
        F.when(col("o_orderkey") % 7 == 1, F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        (col("o_totalprice") + 10.0).alias("new_price"),
    )
    mx = orders.agg(F.max("o_orderkey").alias("__max_key"))
    inserts = (
        orders.where(col("o_orderkey") % 11 == 2)
        .crossJoin(broadcast(mx))
        .select(
            (col("o_orderkey") + col("__max_key")).alias("o_orderkey"),
            F.lit("I").alias("op"),
            (col("o_totalprice") * 2).alias("new_price"),
        )
    )
    source = updates.unionByName(inserts)
    merged = merge_into(
        target, source, on="o_orderkey",
        matched_update={"o_totalprice": col("__s.new_price")},
        matched_delete=col("__s.op") == "D",
        matched_condition=col("__s.op") == "U",
        not_matched_insert={
            "o_orderstatus": F.lit("N"),
            "o_totalprice": col("__s.new_price"),
        },
    )
    changes = frame_changes(target, merged, on="o_orderkey")
    agg = changes.groupBy(col("_change_type").alias("change_type")).agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
    )
    types = spark.createDataFrame(
        [("delete",), ("insert",), ("update_postimage",),
         ("update_preimage",)],
        "change_type string")
    return (
        types.join(agg, "change_type", "left")
        .select(
            "change_type",
            F.coalesce(col("n_rows"), F.lit(0)).alias("n_rows"),
            "key_sum",
        )
        .orderBy("change_type")
    )


def _funnel_oracle():
    from .wave3 import NEAR_FINAL_SQL, QUALITY_EXACT_SQL

    return QUALITY_EXACT_SQL + NEAR_FINAL_SQL + """
    SELECT * FROM (
      SELECT 0 AS stage, 'raw' AS stage_name,
             CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      UNION ALL SELECT 1, 'quality', CAST(COUNT(*) AS BIGINT) FROM quality
      UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM exact
      UNION ALL SELECT 3, 'near_dedup', CAST(COUNT(*) AS BIGINT) FROM final
    ) ORDER BY stage
    """


@q(
    "q_pipeline_funnel",
    oracle=_funnel_oracle(),
    desc="cleaning-pipeline funnel: survivor counts after each stage "
         "(raw -> quality gate -> exact dedup -> near-dup removal) — "
         "the report a pipeline owner reads before committing a "
         "filter configuration. The counts are declared over the SAME "
         "stage frames clean_corpus executes "
         "(operators/pipeline.py:corpus_funnel), so the funnel IS the "
         "pipeline's decisions.",
    tags=["pipeline", "dedup", "quality"],
)
def q_pipeline_funnel(spark, sf_dir):
    from ..operators.pipeline import corpus_funnel

    docs = tables.load(spark, sf_dir, "documents")
    return corpus_funnel(docs, jaccard_threshold=0.5, shingle_n=4)
