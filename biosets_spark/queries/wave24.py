"""Twenty-fourth-wave query inventory: the two normalization staples
of the reference's own domain (omics feature matrices — reference
features/omics.py models Abundance/Expression/ReadCount columns):
quantile normalization and the centered log-ratio (CLR) transform.

Quantile normalization forces every sample's feature distribution to
a shared reference (the per-rank mean); CLR maps compositional counts
(microbiome abundances) into unconstrained coordinates. Both are
expressed matrix-free: the "matrix" stays a long (sample, feature,
value) table, so the same plan runs at any width.

Determinism discipline (queries.py header): values are 6-dec rounded
before ranking, ranks are integer row_numbers with positional
tie-breaks, per-rank/per-sample means are decimal-accumulated, and
log terms are 12-dec rounded before their decimal sum.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import dfloor, q


@q(
    "q_quantile_normalize",
    oracle="""
    WITH comps AS (
      SELECT vec_id, pos, comp FROM (
        SELECT vec_id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS comp
        FROM (SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]), x -> FLOOR((x) * 1e6 + 0.5) / 1e6) AS vec
              FROM embeddings)
      )
    ), ranked AS (
      SELECT vec_id, comp,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY comp, pos) AS rnk
      FROM comps
    )
    SELECT CAST(rnk AS INT) AS rnk,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           (CAST(SUM(CAST(comp AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*))
             AS ref_value
    FROM ranked GROUP BY rnk ORDER BY rnk
    """,
    desc="Quantile normalization reference distribution (the "
         "microarray/RNA-seq normalization workhorse; reference "
         "features/omics.py Expression/ReadCount columns are its "
         "inputs): every sample's sorted feature values are averaged "
         "AT EACH RANK across samples — replacing each sample's k-th "
         "smallest value with ref_value[k] equalizes all marginal "
         "distributions. Expressed matrix-free: explode to (sample, "
         "pos, value), per-sample rank window (each sort covers ONE "
         "sample's features, never the cohort), then a combinable "
         "per-rank decimal mean. The apply step is a broadcast join "
         "of the 64-row reference back on (sample, rank). Components "
         "are 6-dec rounded pre-rank and positionally tie-broken, so "
         "both engines rank identically.",
    tags=["vector", "window", "agg", "omics"],
)
def q_quantile_normalize(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(col("embedding"), lambda x: (dfloor((x.cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))).alias("vec"),
    )
    comps = emb.select("vec_id", F.posexplode("vec").alias("pos", "comp"))
    w = Window.partitionBy("vec_id").orderBy("comp", "pos")
    ranked = comps.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("rnk")
        .agg(
            F.count("*").alias("n_samples"),
            (F.sum(col("comp").cast("decimal(18,8)")).cast("double") / F.count("*")).alias("ref_value"),
        )
        .select(col("rnk").cast("int").alias("rnk"), "n_samples", "ref_value")
        .orderBy("rnk")
    )


@q(
    "q_clr_transform",
    oracle="""
    WITH items AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             (LN(l_quantity)) AS ln_q
      FROM lineitem WHERE l_orderkey <= 2000
    ), geo AS (
      SELECT l_orderkey,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(ln_q AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mean_ln
      FROM items GROUP BY l_orderkey
    )
    SELECT i.l_orderkey, CAST(MAX(g.n_items) AS BIGINT) AS n_items,
           (MAX(i.ln_q - g.mean_ln)) AS max_clr,
           (MIN(i.ln_q - g.mean_ln)) AS min_clr
    FROM items i JOIN geo g ON i.l_orderkey = g.l_orderkey
    GROUP BY i.l_orderkey
    HAVING MAX(g.n_items) >= 3
    ORDER BY i.l_orderkey
    """,
    desc="Centered log-ratio transform per composition (the "
         "compositional-data workhorse for microbiome abundances — "
         "reference features/omics.py Abundance; here each order's "
         "lineitem quantities stand in for one sample's counts): "
         "clr_i = ln(x_i) - mean_j ln(x_j), i.e. log-counts centered "
         "on the sample's log-geometric-mean, which removes the "
         "closure constraint before any distance/PCA step. One "
         "combinable per-sample agg for the geometric mean (12-dec "
         "rounded log terms, decimal-summed), one join back keyed on "
         "the sample — both shuffles on the same key, and the key "
         "filter prunes the scan. Reported as per-sample clr extremes "
         "for compositions of >= 3 parts.",
    tags=["agg", "join", "omics"],
)
def q_clr_transform(spark, sf_dir):
    items = (
        tables.load(spark, sf_dir, "lineitem")
        .filter(col("l_orderkey") <= 2000)
        .select(
            "l_orderkey", "l_linenumber",
            (F.log("l_quantity")).alias("ln_q"),
        )
    )
    geo = items.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        (F.sum(col("ln_q").cast("decimal(38,12)")).cast("double") / F.count("*"))
        .alias("mean_ln"),
    )
    return (
        items.join(geo.select(col("l_orderkey").alias("gk"), "n_items", "mean_ln"),
                   col("l_orderkey") == col("gk"))
        .groupBy("l_orderkey")
        .agg(
            F.max("n_items").alias("n_items"),
            (F.max(col("ln_q") - col("mean_ln"))).alias("max_clr"),
            (F.min(col("ln_q") - col("mean_ln"))).alias("min_clr"),
        )
        .filter(col("n_items") >= 3)
        .orderBy("l_orderkey")
    )
