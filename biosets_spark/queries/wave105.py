"""Wave 105 (r12): trained PQ codebooks and the IVF x PQ composition.

The r11 verdict's two extension gaps closed:
1. ``pq_train_codebooks`` (operators/pq.py) — Lloyd's on the exact
   grid per subspace (the kmeans_fit discipline), replacing the raw
   md5 row sample as the production codebook path. The oracle unrolls
   the training iteration as CTEs in the +2^21 OFFSET space (all
   components positive, where DuckDB ``//`` == Python floor-div; the
   engine trains in signed space — exactly equivalent, see the
   operator docstring) and recomputes every assignment, mean, and
   distortion bit-for-bit.
2. ``ivfpq_build`` / ``ivfpq_adc_topk`` — the production 100 TB ANN
   layout: grid-exact IVF coarse cells over PQ codes, the ADC scan
   reading only the probed cells' (id, cell, code) rows.

Determinism: the cluster.py grid discipline throughout — every
distance, mean, and score is exact integer arithmetic, so these
ITERATIVE/composed paths are safe to differential-check.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import q
from .wave104 import _PQ_ENC_SQL

# Oracle CTE chain for ONE PQ training iteration in the +2^21 offset
# space: grid+offset vectors, md5-sampled init codebook (seed '42'),
# iteration-0 assignment (exact L2 argmin, ties to the lowest code),
# half-up integer M-step means keyed (sub, code, pos) with COALESCE
# for empty cells, and the iteration-1 re-assignment carrying the
# exact distortion. m=4 subspaces of dsub=16 over the 64-dim
# embeddings, n_codes=8 — mirrors pq_train_codebooks(iters=1) +
# pq_encode(dist_col=...) bit-for-bit (distances and argmins are
# translation-invariant, so the offset never shows in the output).
_PQ_TRAIN_SQL = """
    v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) + 2097152) AS vec
      FROM embeddings
    ),
    ini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS code,
             vec
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 8
    ),
    vc AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM v),
    cb0 AS (
      SELECT code, (generate_subscripts(vec, 1) - 1) // 16 AS sub,
             generate_subscripts(vec, 1) AS pos, unnest(vec) AS c
      FROM ini
    ),
    d0 AS (
      SELECT vc.vec_id, cb0.sub, cb0.code,
             SUM((vc.c - cb0.c) * (vc.c - cb0.c)) AS d
      FROM vc JOIN cb0 USING (pos)
      GROUP BY 1, 2, 3
    ),
    e0 AS (
      SELECT vec_id, sub, code, d
      FROM (SELECT vec_id, sub, code, d,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d, code) AS rn
            FROM d0)
      WHERE rn = 1
    ),
    m1 AS (
      SELECT e0.sub, e0.code, vc.pos,
             CAST((2 * SUM(vc.c) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS c
      FROM e0 JOIN vc ON vc.vec_id = e0.vec_id
                     AND (vc.pos - 1) // 16 = e0.sub
      GROUP BY 1, 2, 3
    ),
    cb1 AS (
      SELECT cb0.sub, cb0.code, cb0.pos, COALESCE(m1.c, cb0.c) AS c
      FROM cb0 LEFT JOIN m1 ON m1.sub = cb0.sub AND m1.code = cb0.code
                           AND m1.pos = cb0.pos
    ),
    d1 AS (
      SELECT vc.vec_id, cb1.sub, cb1.code,
             SUM((vc.c - cb1.c) * (vc.c - cb1.c)) AS d
      FROM vc JOIN cb1 ON cb1.pos = vc.pos
      GROUP BY 1, 2, 3
    ),
    e1 AS (
      SELECT vec_id, sub, code, d
      FROM (SELECT vec_id, sub, code, d,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d, code) AS rn
            FROM d1)
      WHERE rn = 1
    )
"""


@q(
    "q_pq_trained_codebooks",
    oracle="WITH " + _PQ_TRAIN_SQL + """
    SELECT CAST(sub AS INTEGER) AS sub,
           CAST(code AS INTEGER) AS code,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(d) AS BIGINT) AS distortion
    FROM e1
    GROUP BY sub, code
    ORDER BY sub, code
    """,
    desc="Lloyd-TRAINED PQ codebooks (operators/pq.py:"
         "pq_train_codebooks, 1 iteration): occupancy AND exact "
         "integer distortion per (subspace, code) after re-encoding "
         "with the trained books — pinning not just which code wins "
         "but the trained codebook VALUES themselves (a single "
         "off-by-one mean component changes some distortion sum). "
         "Training is one Arrow encode pass + one (sub, code, pos) "
         "aggregate + a model-sized collect per iteration — the "
         "kmeans_fit scale contract; the oracle unrolls the iteration "
         "as CTEs in the offset space.",
    tags=["vector", "quantize", "cluster", "iterative"],
)
def q_pq_trained_codebooks(spark, sf_dir):
    from ..operators import pq as PQ

    emb = tables.load(spark, sf_dir, "embeddings")
    cbs = PQ.pq_train_codebooks(emb, m=4, n_codes=8, iters=1)
    enc = PQ.pq_encode(emb, cbs, dist_col="pq_dist")
    return (
        enc.select(F.posexplode(F.arrays_zip("pq_code", "pq_dist"))
                   .alias("sub0", "z"))
        .select(col("sub0").cast("int").alias("sub"),
                col("z.pq_code").cast("int").alias("code"),
                col("z.pq_dist").alias("d"))
        .groupBy("sub", "code")
        .agg(F.count("*").alias("n_vecs"),
             F.sum("d").alias("distortion"))
        .orderBy("sub", "code")
    )


@q(
    "q_pq_train_gain",
    oracle="WITH " + _PQ_TRAIN_SQL + """
    SELECT * FROM (
      SELECT CAST(0 AS INTEGER) AS iter,
             CAST(SUM(d) AS BIGINT) AS total_distortion
      FROM e0
      UNION ALL
      SELECT CAST(1 AS INTEGER) AS iter,
             CAST(SUM(d) AS BIGINT) AS total_distortion
      FROM e1
    )
    ORDER BY iter
    """,
    desc="PQ training gain: TOTAL exact quantization distortion under "
         "the raw md5-sampled codebooks (iter 0) vs after one Lloyd "
         "iteration (iter 1) — the audit that justifies paying for "
         "training (Lloyd's monotonicity guarantees iter1 <= iter0 on "
         "the same data; the exact integers make the claim "
         "cross-engine checkable rather than a float anecdote).",
    tags=["vector", "quantize", "cluster", "iterative"],
)
def q_pq_train_gain(spark, sf_dir):
    from ..operators import pq as PQ

    emb = tables.load(spark, sf_dir, "embeddings")
    cbs0 = PQ.pq_codebooks(emb, m=4, n_codes=8)
    cbs1 = PQ.pq_train_codebooks(emb, m=4, n_codes=8, iters=1)

    def total(cbs, it):
        enc = PQ.pq_encode(emb, cbs, dist_col="pq_dist")
        return enc.select(
            F.explode("pq_dist").alias("d")
        ).agg(
            F.lit(it).cast("int").alias("iter"),
            F.sum("d").alias("total_distortion"),
        ).select("iter", "total_distortion")

    return total(cbs0, 0).unionByName(total(cbs1, 1)).orderBy("iter")


@q(
    "q_ivfpq_knn",
    oracle="WITH " + _PQ_ENC_SQL + """,
    cellini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '7')) - 1 AS cell,
             vec
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '7') LIMIT 8
    ),
    cellc AS (SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c
              FROM cellini),
    celld AS (
      SELECT vc.vec_id, cellc.cell,
             SUM((vc.c - cellc.c) * (vc.c - cellc.c)) AS d
      FROM vc JOIN cellc USING (pos)
      GROUP BY 1, 2
    ),
    cella AS (
      SELECT vec_id, cell
      FROM (SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM celld)
      WHERE rn = 1
    ),
    probe AS (SELECT cell FROM celld WHERE vec_id = 0 ORDER BY d, cell LIMIT 2),
    qsub AS (
      SELECT (pos - 1) // 16 AS sub, pos, c FROM vc WHERE vec_id = 0
    ),
    dtable AS (
      SELECT cb.sub, cb.code, SUM((qsub.c - cb.c) * (qsub.c - cb.c)) AS d
      FROM qsub JOIN cb USING (pos)
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT enc.vec_id AS neighbor_id, SUM(dtable.d) AS adc_score
      FROM enc
      JOIN cella ON cella.vec_id = enc.vec_id
      JOIN dtable ON dtable.sub = enc.sub AND dtable.code = enc.code
      WHERE enc.vec_id <> 0
        AND cella.cell IN (SELECT cell FROM probe)
      GROUP BY 1
    )
    SELECT neighbor_id, CAST(adc_score AS BIGINT) AS adc_score
    FROM scored
    ORDER BY adc_score, neighbor_id
    LIMIT 10
    """,
    desc="IVF x PQ cell-pruned ADC top-10 (operators/pq.py:"
         "ivfpq_build/ivfpq_adc_topk): 8 grid-exact IVF cells "
         "(md5-sampled centroids seed 7, exact integer L2 assignment, "
         "ties to the lowest cell), PQ codes per row, the vec_id-0 "
         "query probes its 2 nearest cells and ADC-scans ONLY those "
         "cells' codes — the production 100 TB ANN layout where the "
         "scan reads n_probe/n_cells of the code table (partition-"
         "pruned when written partitionBy(_cell)) and none of the raw "
         "vectors. Exact long scores, deterministic cross-engine.",
    tags=["vector", "quantize", "similarity"],
)
def q_ivfpq_knn(spark, sf_dir):
    from ..operators import pq as PQ

    emb = tables.load(spark, sf_dir, "embeddings")
    encoded, cents, cbs = PQ.ivfpq_build(
        emb, n_cells=8, m=4, n_codes=8, train_iters=0,
        cell_seed=7, code_seed=42)
    qvec = [float(x) for x in
            emb.filter(col("vec_id") == 0).first()["embedding"]]
    return PQ.ivfpq_adc_topk(encoded, cents, cbs, qvec, k=10, n_probe=2,
                             exclude_self=0)


@q(
    "q_ivfpq_residual_knn",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS vec
      FROM embeddings
    ),
    vc AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c FROM v),
    cellini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '7')) - 1 AS cell,
             vec
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '7') LIMIT 8
    ),
    cellc AS (SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS c
              FROM cellini),
    celld AS (
      SELECT vc.vec_id, cellc.cell,
             SUM((vc.c - cellc.c) * (vc.c - cellc.c)) AS d
      FROM vc JOIN cellc USING (pos)
      GROUP BY 1, 2
    ),
    cella AS (
      SELECT vec_id, cell
      FROM (SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM celld)
      WHERE rn = 1
    ),
    rc AS (
      SELECT vc.vec_id, vc.pos, vc.c - cellc.c AS c
      FROM vc
      JOIN cella USING (vec_id)
      JOIN cellc ON cellc.cell = cella.cell AND cellc.pos = vc.pos
    ),
    rini AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS code,
             vec_id
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 8
    ),
    rcb AS (
      SELECT rini.code, (rc.pos - 1) // 16 AS sub, rc.pos, rc.c
      FROM rini JOIN rc ON rc.vec_id = rini.vec_id
    ),
    rdist AS (
      SELECT rc.vec_id, rcb.sub, rcb.code,
             SUM((rc.c - rcb.c) * (rc.c - rcb.c)) AS d
      FROM rc JOIN rcb ON rcb.pos = rc.pos
      GROUP BY 1, 2, 3
    ),
    renc AS (
      SELECT vec_id, sub, code
      FROM (SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d, code) AS rn
            FROM rdist)
      WHERE rn = 1
    ),
    probe AS (SELECT cell FROM celld WHERE vec_id = 0 ORDER BY d, cell LIMIT 2),
    qr AS (
      SELECT probe.cell, vc.pos, vc.c - cellc.c AS c
      FROM vc
      CROSS JOIN probe
      JOIN cellc ON cellc.cell = probe.cell AND cellc.pos = vc.pos
      WHERE vc.vec_id = 0
    ),
    dtab AS (
      SELECT qr.cell, rcb.sub, rcb.code,
             SUM((qr.c - rcb.c) * (qr.c - rcb.c)) AS d
      FROM qr JOIN rcb ON rcb.pos = qr.pos
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT renc.vec_id AS neighbor_id, SUM(dtab.d) AS adc_score
      FROM renc
      JOIN cella ON cella.vec_id = renc.vec_id
      JOIN dtab ON dtab.cell = cella.cell AND dtab.sub = renc.sub
               AND dtab.code = renc.code
      WHERE renc.vec_id <> 0
      GROUP BY 1
    )
    SELECT neighbor_id, CAST(adc_score AS BIGINT) AS adc_score
    FROM scored
    ORDER BY adc_score, neighbor_id
    LIMIT 10
    """,
    desc="residual IVF x PQ ADC top-10 (faiss-default by_residual: "
         "codes quantize v - centroid(cell), so PQ resolution "
         "concentrates on within-cell noise-scale differences — the "
         "r12 1M probe shows this is what lifts raw-ADC recall on "
         "clustered corpora, see PERFORMANCE.md). The query's distance "
         "table is PER PROBED CELL (q - centroid_c vs the residual "
         "codebooks); the scan is a union of per-cell scans, each "
         "partition-prunable. Residuals are exact grid differences, "
         "so every code and score is oracle-reproducible.",
    tags=["vector", "quantize", "similarity"],
)
def q_ivfpq_residual_knn(spark, sf_dir):
    from ..operators import pq as PQ

    emb = tables.load(spark, sf_dir, "embeddings")
    encoded, cents, cbs = PQ.ivfpq_build(
        emb, n_cells=8, m=4, n_codes=8, train_iters=0,
        cell_seed=7, code_seed=42, by_residual=True)
    qvec = [float(x) for x in
            emb.filter(col("vec_id") == 0).first()["embedding"]]
    return PQ.ivfpq_adc_topk(encoded, cents, cbs, qvec, k=10, n_probe=2,
                             exclude_self=0, by_residual=True)
