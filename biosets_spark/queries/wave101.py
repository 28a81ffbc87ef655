"""Wave 101 (r9): embedding-space clustering — Lloyd's k-means on the
exact 1e-6 integer grid, and SemDeDup cluster-then-dedup (Abbas et
al. 2023, arXiv:2303.09540).

Determinism discipline (operators/cluster.py module docstring): every
distance / dot product / threshold test is exact integer or
DECIMAL(38,0)/HUGEINT arithmetic on grid-scaled BIGINT components, so
the two engines agree bit-for-bit even on exact threshold ties and
across iterative reassignment — there is NO float comparison anywhere
in these queries, which is what makes an ITERATIVE algorithm safe to
differential-check (a single ulp-divergent assignment would cascade).
Centroid means run in a +2^21 offset space so the half-up integer
mean (2*sum + n) // (2*n) divides positives only — Python floor-div,
Spark driver arithmetic, and DuckDB ``//`` all agree there.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from ..operators.cluster import kmeans_fit, prune_farthest, semantic_dedup_stats
from . import q


@q(
    "q_kmeans_lloyd",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) + 2097152) AS vec
      FROM embeddings
    ),
    ini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS cell,
             vec
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 8
    ),
    vc AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM v),
    cc0 AS (SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM ini),
    d1 AS (
      SELECT vc.vec_id, cc0.cell, SUM((vc.c - cc0.c) * (vc.c - cc0.c)) AS dist
      FROM vc JOIN cc0 USING (pos) GROUP BY 1, 2
    ),
    a1 AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
      FROM d1
    ),
    m1 AS (
      SELECT a1.cell, vc.pos,
             CAST((2 * SUM(vc.c) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS c
      FROM a1 JOIN vc USING (vec_id) WHERE a1.rn = 1
      GROUP BY 1, 2
    ),
    cc1 AS (
      SELECT cc0.cell, cc0.pos, COALESCE(m1.c, cc0.c) AS c
      FROM cc0 LEFT JOIN m1 ON m1.cell = cc0.cell AND m1.pos = cc0.pos
    ),
    d2 AS (
      SELECT vc.vec_id, cc1.cell, SUM((vc.c - cc1.c) * (vc.c - cc1.c)) AS dist
      FROM vc JOIN cc1 USING (pos) GROUP BY 1, 2
    ),
    a2 AS (
      SELECT vec_id, cell, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
      FROM d2
    )
    SELECT CAST(cell AS INTEGER) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(dist) AS BIGINT) AS inertia
    FROM a2 WHERE rn = 1
    GROUP BY cell ORDER BY cell
    """,
    desc="Lloyd's k-means (k=8, one update cycle then final E-step) on "
         "the exact 1e-6 grid: deterministic md5-sampled init, exact "
         "long squared distances (argmin via array_min over (dist, "
         "cell) structs — ties to the lowest cell, mirroring the "
         "oracle's ROW_NUMBER), half-up integer centroid means in the "
         "+2^21 offset space, empty cells keep their previous "
         "centroid. Output pins the full geometry: per-cell size and "
         "EXACT integer inertia. Scale: each iteration is one scan + "
         "one (cell,pos) partial agg (k*dim groups) + a k*dim-long "
         "driver collect — the collect is the model, not the data; "
         "the oracle unrolls the iteration as CTEs.",
    tags=["cluster", "vector", "iterative"],
)
def q_kmeans_lloyd(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _cents = kmeans_fit(emb, k=8, iters=1)
    return (
        assigned.groupBy(col("_cell").alias("cell"))
        .agg(F.count("*").alias("n"), F.sum("_dist").alias("inertia"))
        .orderBy("cell")
    )


@q(
    "q_dedup_semantic",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS vec
      FROM embeddings
    ),
    ini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS cell,
             vec
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 16
    ),
    vc AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM v),
    cc AS (SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM ini),
    d1 AS (
      SELECT vc.vec_id, cc.cell, SUM((vc.c - cc.c) * (vc.c - cc.c)) AS dist
      FROM vc JOIN cc USING (pos) GROUP BY 1, 2
    ),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM d1)
      WHERE rn = 1
    ),
    ac AS (SELECT vc.vec_id, asg.cell, vc.pos, vc.c FROM vc JOIN asg USING (vec_id)),
    pp AS (
      SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
             SUM(CAST(a.c AS HUGEINT) * b.c) AS dot,
             SUM(CAST(a.c AS HUGEINT) * a.c) AS na2,
             SUM(CAST(b.c AS HUGEINT) * b.c) AS nb2
      FROM ac a JOIN ac b
        ON a.cell = b.cell AND a.pos = b.pos AND a.vec_id < b.vec_id
      GROUP BY 1, 2, 3
    ),
    dup AS (
      SELECT cell, id_a, id_b FROM pp
      WHERE dot > 0 AND dot * dot * 10000 >= 1764 * na2 * nb2
    ),
    sizes AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs FROM asg GROUP BY 1),
    per AS (
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_pruned
      FROM dup GROUP BY 1
    )
    SELECT CAST(sizes.cell AS INTEGER) AS cell, sizes.n_docs,
           COALESCE(per.n_pairs, 0) AS n_pairs,
           COALESCE(per.n_pruned, 0) AS n_pruned
    FROM sizes LEFT JOIN per ON per.cell = sizes.cell
    ORDER BY cell
    """,
    desc="SemDeDup cluster-then-dedup summary (16 md5-sampled cells, "
         "cosine >= 0.42): every vector assigned to its nearest cell "
         "by exact integer distance, near-duplicate pairs compared "
         "ONLY within a cell (the SemDeDup trade: sum-of-cell-sizes-"
         "squared instead of O(n^2)), threshold evaluated as dot^2 * "
         "den^2 >= num^2 * |a|^2 * |b|^2 in exact wide integers "
         "(int64 Gram matmul + arbitrary-precision compare in the "
         "per-cell Arrow kernel; HUGEINT in the oracle) — exact even "
         "ON the threshold, so the pair set cannot drift between "
         "engines. Output: per cell, member count, duplicate pairs, "
         "and docs pruned under keep-lowest-id. Scale: one shuffle of "
         "(id, cell, vec) — never text — into one kernel task per "
         "cell; k is the knob that bounds each cell's quadratic "
         "(SemDeDup runs ~100k cells at web scale).",
    tags=["dedup", "cluster", "similarity", "embedding"],
)
def q_dedup_semantic(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    return semantic_dedup_stats(
        emb, k=16, threshold_num=42, threshold_den=100)


@q(
    "q_prototype_prune",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) + 2097152) AS vec
      FROM embeddings
    ),
    ini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS cell,
             vec
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 8
    ),
    vc AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM v),
    cc0 AS (SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM ini),
    d1 AS (
      SELECT vc.vec_id, cc0.cell, SUM((vc.c - cc0.c) * (vc.c - cc0.c)) AS dist
      FROM vc JOIN cc0 USING (pos) GROUP BY 1, 2
    ),
    a1 AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
      FROM d1
    ),
    m1 AS (
      SELECT a1.cell, vc.pos,
             CAST((2 * SUM(vc.c) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS c
      FROM a1 JOIN vc USING (vec_id) WHERE a1.rn = 1
      GROUP BY 1, 2
    ),
    cc1 AS (
      SELECT cc0.cell, cc0.pos, COALESCE(m1.c, cc0.c) AS c
      FROM cc0 LEFT JOIN m1 ON m1.cell = cc0.cell AND m1.pos = cc0.pos
    ),
    d2 AS (
      SELECT vc.vec_id, cc1.cell, SUM((vc.c - cc1.c) * (vc.c - cc1.c)) AS dist
      FROM vc JOIN cc1 USING (pos) GROUP BY 1, 2
    ),
    a2 AS (
      SELECT vec_id, cell, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
      FROM d2
    ),
    fin AS (SELECT vec_id, cell, dist FROM a2 WHERE rn = 1),
    rk AS (
      SELECT vec_id, cell, dist,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY dist DESC, vec_id DESC) AS r,
             COUNT(*) OVER (PARTITION BY cell) AS nc
      FROM fin
    )
    SELECT CAST(cell AS INTEGER) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN r <= nc // 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
           CAST(SUM(CASE WHEN r > nc // 4 THEN dist ELSE 0 END) AS BIGINT) AS inertia_kept
    FROM rk GROUP BY cell ORDER BY cell
    """,
    desc="Prototypicality data pruning (Sorscher et al. 2022, arXiv:"
         "2206.14486): fit k-means (k=8, exact grid), then drop the "
         "farthest quartile of each cell — the per-cluster outlier "
         "tail. Prune counts are exact integer floor-division and the "
         "farthest-first order is total (dist DESC, id DESC) over "
         "EXACT integer distances, so the kept set is deterministic "
         "and engine-portable. Output: per cell, size, pruned count, "
         "and the exact inertia of the kept examples. Scale: one "
         "window over the cell partitioning (thousands of cells at "
         "real k — never a single-partition window) plus a broadcast "
         "k-row count table.",
    tags=["cluster", "prune", "window"],
)
def q_prototype_prune(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _cents = kmeans_fit(emb, k=8, iters=1)
    pruned = prune_farthest(assigned, frac_num=1, frac_den=4)
    return (
        pruned.groupBy(col("_cell").alias("cell"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(~col("_keep"), 1).otherwise(0)).alias("n_pruned"),
            F.sum(F.when(col("_keep"), col("_dist")).otherwise(0)).alias("inertia_kept"),
        )
        .orderBy("cell")
    )


from .wave3 import QUALITY_EXACT_SQL  # noqa: E402

_CURATED_ORACLE = QUALITY_EXACT_SQL + """,
    v AS (
      SELECT e.vec_id,
             list_transform(CAST(e.embedding AS DOUBLE[]),
               x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS vec
      FROM embeddings e JOIN exact ON e.vec_id = exact.doc_id
    ),
    ini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS cell,
             vec
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 16
    ),
    vc AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM v),
    cc AS (SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM ini),
    d1 AS (
      SELECT vc.vec_id, cc.cell, SUM((vc.c - cc.c) * (vc.c - cc.c)) AS dist
      FROM vc JOIN cc USING (pos) GROUP BY 1, 2
    ),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM d1)
      WHERE rn = 1
    ),
    ac AS (SELECT vc.vec_id, asg.cell, vc.pos, vc.c FROM vc JOIN asg USING (vec_id)),
    pp AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             SUM(CAST(a.c AS HUGEINT) * b.c) AS dot,
             SUM(CAST(a.c AS HUGEINT) * a.c) AS na2,
             SUM(CAST(b.c AS HUGEINT) * b.c) AS nb2
      FROM ac a JOIN ac b
        ON a.cell = b.cell AND a.pos = b.pos AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    dropped AS (
      SELECT DISTINCT id_b FROM pp
      WHERE dot > 0 AND dot * dot * 10000 >= 1764 * na2 * nb2
    ),
    final AS (
      SELECT * FROM exact WHERE doc_id NOT IN (SELECT id_b FROM dropped)
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM final GROUP BY lang ORDER BY lang
"""


@q(
    "q_pipeline_curated_corpus",
    oracle=_CURATED_ORACLE,
    desc="the embedding-era curation pipeline: quality gate -> exact "
         "dedup (min-id per normalized fingerprint, shared stages "
         "with q_pipeline_clean_corpus) -> SEMANTIC dedup (SemDeDup "
         "over the SURVIVORS' embeddings: 16 cells, cosine >= 0.42, "
         "keep-lowest-id). Survivors per language. Stage order is "
         "cheapest-first; the semantic stage's centroid sample, cell "
         "assignment, and per-cell pair kernels see only the pruned "
         "survivor set, and the embedding join ships (id, vec) only "
         "— text never enters the semantic stage.",
    tags=["pipeline", "dedup", "cluster", "quality"],
)
def q_pipeline_curated_corpus(spark, sf_dir):
    from ..operators.pipeline import curated_corpus

    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")
    final = curated_corpus(docs, emb, k=16)
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    ).orderBy("lang")
