"""Eleventh-wave query inventory: extractive TF-IDF keywords, Zipf
slope estimation, and a deterministic Johnson-Lindenstrauss random
projection — the dimensionality-reduction scale path in front of ANN
search (project 64-d embeddings to 8-d with a +-1 sign matrix derived
from md5, identical in any engine, then verify norm preservation).

Determinism discipline follows queries.py: integer counts everywhere
possible; every double that enters a SUM is grid-rounded to a fixed scale
and accumulated in DECIMAL (order-free); orderings use exact
expressions with unique tie-breaks; md5 is the portable randomness
source (same digest in Spark, DuckDB, and Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators import text as T
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_tfidf_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents
    ),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT doc_id, t,
             tf * LN((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df)
               AS score
      FROM tf JOIN dfq USING (t)
    ),
    ranked AS (
      SELECT doc_id, t, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, t) AS rn
      FROM scored
    )
    SELECT doc_id, t AS term, CAST(rn AS INT) AS rank,
           (score) AS score
    FROM ranked WHERE rn <= 3
    """,
    desc="per-document top-3 TF-IDF keywords (extractive tagging): "
         "tf * ln(N/df) with exact-integer inputs, one IEEE product "
         "per score, term tie-break; the top-k window partitions by "
         "the high-cardinality doc id so it parallelizes at any "
         "scale.",
    tags=["text", "window", "agg"],
)
def q_tfidf_keywords(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    kw = T.tfidf_keywords(docs, k=3)
    return kw.select("doc_id", "term", "rank", col("score").alias("score"))


@q(
    "q_zipf_slope",
    # least-squares fit of ln(count) on ln(rank) over the top-1000
    # vocabulary head: each log term quantizes onto the engine-
    # identical FLOOR(x*1e8 + 0.5) integer grid before the exact sums
    # (order-free), slope/intercept are one closing double expression
    oracle=f"""
    WITH counts AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
      GROUP BY tok
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk
      FROM counts
    ),
    head AS (SELECT * FROM ranked WHERE rnk <= 1000),
    terms AS (
      SELECT CAST(FLOOR(LN(CAST(rnk AS DOUBLE)) * 1e8 + 0.5)
                  AS DECIMAL(18,0)) AS x,
             CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1e8 + 0.5)
                  AS DECIMAL(18,0)) AS y,
             CAST(FLOOR(LN(CAST(rnk AS DOUBLE)) * LN(CAST(c AS DOUBLE))
                        * 1e8 + 0.5) AS DECIMAL(18,0)) AS xy,
             CAST(FLOOR(LN(CAST(rnk AS DOUBLE)) * LN(CAST(rnk AS DOUBLE))
                        * 1e8 + 0.5) AS DECIMAL(18,0)) AS xx
      FROM head
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(xy) AS sxy, SUM(xx) AS sxx
      FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           ((n * (CAST(sxy AS DOUBLE) / 1e8)
             - (CAST(sx AS DOUBLE) / 1e8) * (CAST(sy AS DOUBLE) / 1e8))
                 / (n * (CAST(sxx AS DOUBLE) / 1e8)
                    - (CAST(sx AS DOUBLE) / 1e8) * (CAST(sx AS DOUBLE) / 1e8)))
             AS slope,
           (((CAST(sy AS DOUBLE) / 1e8)
                  - ((n * (CAST(sxy AS DOUBLE) / 1e8)
                      - (CAST(sx AS DOUBLE) / 1e8) * (CAST(sy AS DOUBLE) / 1e8))
                     / (n * (CAST(sxx AS DOUBLE) / 1e8)
                        - (CAST(sx AS DOUBLE) / 1e8) * (CAST(sx AS DOUBLE) / 1e8)))
                    * (CAST(sx AS DOUBLE) / 1e8)) / n) AS intercept
    FROM s
    """,
    desc="Zipf slope of the vocabulary head: least-squares ln(count) ~ "
         "ln(rank) over the top-1000 types (a natural corpus sits near "
         "slope -1; flat slopes flag synthetic/templated shards). The "
         "head is a TakeOrdered limit, so no global rank window at "
         "scale; log terms quantize to DECIMAL(18,8) before the sums.",
    tags=["text", "agg", "stats"],
)
def q_zipf_slope(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("text")
    counts = (
        docs.select(F.explode(T.tokens(col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    # top-1000 head via TakeOrdered (no full-vocab single-task window),
    # then rank via zip_with_index (narrow JVM passes — avoids even a
    # bounded empty-partition-spec window, keeping the plan audit's
    # global-window check meaningful)
    from ..operators.joins import zip_with_index

    head = (
        counts.orderBy(col("c").desc(), "tok").limit(1000)
        .withColumn("_negc", -col("c"))
    )
    ranked = zip_with_index(
        head, order_by=["_negc", "tok"], col_name="_rid"
    ).select("c", (col("_rid") + 1).cast("int").alias("rnk"))
    lx = F.log(col("rnk").cast("double"))
    ly = F.log(col("c").cast("double"))
    # engine-identical 1e-8 integer grid for the log-derived terms
    # (r9: ROUND-then-DECIMAL double-rounds differently across engines)
    terms = ranked.select(
        F.floor(lx * F.lit(1e8) + F.lit(0.5)).cast("decimal(18,0)").alias("x"),
        F.floor(ly * F.lit(1e8) + F.lit(0.5)).cast("decimal(18,0)").alias("y"),
        F.floor(lx * ly * F.lit(1e8) + F.lit(0.5)).cast("decimal(18,0)").alias("xy"),
        F.floor(lx * lx * F.lit(1e8) + F.lit(0.5)).cast("decimal(18,0)").alias("xx"),
    )
    s = terms.agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"), F.sum("xx").alias("sxx"),
    )
    n = col("n")
    sx = col("sx").cast("double") / F.lit(1e8)
    sy = col("sy").cast("double") / F.lit(1e8)
    sxy = col("sxy").cast("double") / F.lit(1e8)
    sxx = col("sxx").cast("double") / F.lit(1e8)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return s.select(
        col("n").alias("n_ranks"),
        (slope).alias("slope"),
        (intercept).alias("intercept"),
    )


@q(
    "q_random_projection",
    # the +-1 sign matrix is md5-derived (sign(k,d) = +1 iff the first
    # hex digit of md5('k:d') < '8'), so Spark, DuckDB, and any other
    # engine reconstruct the IDENTICAL projection; per-cell products
    # quantize to DECIMAL before every sum
    oracle="""
    WITH emb64 AS (
      SELECT * FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
    ),
    dims AS (SELECT unnest(range(0, 8)) AS k),
    comps AS (
      SELECT e.vec_id, d.d AS d, k.k AS k,
             CAST(e.embedding[d.d + 1] AS DOUBLE) AS x,
             CASE WHEN substring(md5(concat(CAST(k.k AS VARCHAR), ':',
                                            CAST(d.d AS VARCHAR))), 1, 1)
                       < '8'
                  THEN 1.0 ELSE -1.0 END AS s
      FROM emb64 e, (SELECT unnest(range(0, 64)) AS d) d, dims k
    ),
    proj AS (
      SELECT vec_id, k,
             CAST(SUM(CAST(FLOOR((x * s) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM comps GROUP BY vec_id, k
    ),
    norms AS (
      SELECT e.vec_id,
             CAST(SUM(CAST(FLOOR((CAST(e.embedding[d.d + 1] AS DOUBLE)
                                 * CAST(e.embedding[d.d + 1] AS DOUBLE)) * 1e6 + 0.5) / 1e6
                           AS DECIMAL(18,6))) AS DOUBLE) AS orig_sq
      FROM emb64 e, (SELECT unnest(range(0, 64)) AS d) d
      GROUP BY e.vec_id
    ),
    ratios AS (
      SELECT p.vec_id,
             (CAST(SUM(CAST(FLOOR((p.y * p.y) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6))) AS DOUBLE)
              / 8.0) / n.orig_sq AS ratio
      FROM proj p JOIN norms n ON p.vec_id = n.vec_id
      GROUP BY p.vec_id, n.orig_sq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
           (CAST(SUM(CAST(FLOOR(ratio * 1e8 + 0.5) AS DECIMAL(18,0)))
                 AS DOUBLE) / 1e8 / COUNT(*)) AS mean_ratio,
           (MIN(ratio)) AS min_ratio,
           (MAX(ratio)) AS max_ratio
    FROM ratios
    """,
    desc="deterministic Johnson-Lindenstrauss projection 64-d -> 8-d "
         "with a +-1 md5-derived sign matrix, verified by the norm-"
         "preservation ratio ||y||^2/K over ||x||^2 (mean ~= 1): the "
         "dimensionality-reduction scale path in front of ANN search "
         "(8-d probes are 8x cheaper to shuffle than 64-d). Sign "
         "matrix reconstructed identically in any engine; every sum "
         "decimal-quantized.",
    # "cross" tag: the 8x64 sign-matrix build is a deliberate tiny
    # range crossJoin (BroadcastNestedLoopJoin over 512 cells)
    tags=["similarity", "projection", "agg", "cross"],
)
def q_random_projection(spark, sf_dir):
    import hashlib

    # guard the per-row array expressions against degenerate rows: a
    # null or short embedding null-poisons F.aggregate (zip_with pads
    # with nulls; acc + null = null) while still counting in n_vecs —
    # both engines drop non-64-dim vectors up front instead.
    emb = tables.load(spark, sf_dir, "embeddings").where(
        col("embedding").isNotNull() & (F.size(col("embedding")) == 64)
    )
    # The 8x64 sign matrix is METADATA, not data: derive it driver-side
    # with the same md5 formula the oracle evaluates in SQL (hashlib
    # md5 == Spark md5 == DuckDB md5 on the same bytes) and inline it
    # as array literals. The whole projection then runs as per-row
    # higher-order array expressions — no posexplode (64x fan-out), no
    # sign join, no (vec, k) shuffle agg: the former explode plan
    # pushed 8x64 rows per vector through three hash aggregates and
    # measured 1.9 s warm at sf0.1; this one is 0.05 s warm (plan =
    # scan + project + one global agg). Per-element quantization is
    # identical (the 1e-6 grid -> DECIMAL before every sum; the aggregate
    # accumulator re-casts to DECIMAL(28,6) each step, exact for 64
    # O(1) terms, matching DuckDB's exact DECIMAL SUM).
    signs = [
        [
            1.0
            if hashlib.md5(f"{k}:{d}".encode()).hexdigest()[0] < "8"
            else -1.0
            for d in range(64)
        ]
        for k in range(8)
    ]
    # The whole per-row pipeline rides SQL strings parsed JVM-side (the
    # r12 literal-sweep rationale, operators/pq.py:_long_array_lit,
    # extended to the full expression tree): the former Column-by-Column
    # construction (8 zip_with + aggregate HOF chains with Python
    # lambdas, 512 F.lit sign elements) cost 3,246 py4j round trips =
    # ~0.9-1.2 s of driver wall per build at sf0.1 (cProfile), while
    # the parsed form builds the IDENTICAL expression trees (same
    # dfloor/decimal-quantization structure, same literals) in
    # milliseconds. The y -> y^2 quantization runs in a SECOND
    # projection over named y columns so each per-row aggregate is
    # evaluated once and never duplicated into the y*y term's tree.
    x_sql = "transform(embedding, v -> CAST(v AS DOUBLE))"

    def dfloor_sql(t: str) -> str:
        # queries.dfloor, spelled in SQL: FLOOR kept in double below
        # 2^52, identity above (double already integral there)
        return (f"(CASE WHEN abs({t}) < 4503599627370496.0D "
                f"THEN CAST(FLOOR({t}) AS DOUBLE) ELSE {t} END)")

    def q6_sql(t: str) -> str:
        # the engine-identical 1e-6 quantizer grid FLOOR(x*1e6+0.5)/1e6
        return dfloor_sql(f"({t}) * 1000000.0D + 0.5D") + " / 1000000.0D"

    def dsum_sql(arr: str) -> str:
        return ("CAST(aggregate(" + arr + ", CAST(0 AS DECIMAL(28,6)), "
                "(acc, v) -> CAST(acc + CAST(v AS DECIMAL(18,6)) "
                "AS DECIMAL(28,6))) AS DOUBLE)")

    sign_sql = [
        "array(" + ",".join("1.0D" if s > 0 else "-1.0D" for s in row) + ")"
        for row in signs
    ]
    ys_sql = [
        dsum_sql(f"zip_with({x_sql}, {sign_sql[k]}, "
                 f"(xv, sv) -> {q6_sql('xv * sv')})")
        for k in range(8)
    ]
    norm_sql = dsum_sql(f"transform({x_sql}, xv -> {q6_sql('xv * xv')})")
    proj = emb.select(
        *[F.expr(ys_sql[k]).alias(f"y{k}") for k in range(8)],
        F.expr(norm_sql).alias("norm"),
    )
    terms = [
        (dfloor((col(f"y{k}") * col(f"y{k}")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .cast("decimal(18,6)")
        for k in range(8)
    ]
    proj_sq = terms[0].cast("decimal(28,6)")
    for t in terms[1:]:
        proj_sq = (proj_sq + t).cast("decimal(28,6)")
    ratios = proj.select(
        ((proj_sq.cast("double") / lit(8.0)) / col("norm")).alias("ratio")
    )
    return ratios.agg(
        F.count("*").alias("n_vecs"),
        # engine-identical 1e-8 grid for the derived ratio (r9)
        (F.sum(F.floor(col("ratio") * F.lit(1e8) + F.lit(0.5))
               .cast("decimal(18,0)")).cast("double")
            / F.lit(1e8) / F.count("*")).alias("mean_ratio"),
        (F.min("ratio")).alias("min_ratio"),
        (F.max("ratio")).alias("max_ratio"),
    )
