"""Thirty-ninth-wave query inventory: omics sampling-depth closure on
the order-as-sample / part-as-taxon framing shared with
q_alpha_diversity and q_bray_curtis — deterministic RAREFACTION
(subsample every sample to a common read depth so richness is
comparable across unequal depths, the first normalization step of any
amplicon/metagenomic pipeline; reference parity: biosets' sample-
metadata workflows feed exactly this) and CORE-TAXA PREVALENCE (the
fraction of samples each taxon appears in — the 'core microbiome'
table every diversity paper reports).

Classical rarefaction draws a random subsample; here the draw is the
engine-portable md5 hash order (q_stratified_sample's gate), so both
engines — and every rerun — pick the IDENTICAL subsample: rarefaction
becomes oracle-checkable instead of seed-dependent.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import q

_DEPTH = 25  # rarefaction depth (reads per sample)
_MAX_ORDER = 2000  # sample universe shared with q_alpha_diversity


@q(
    "q_rarefaction",
    oracle=f"""
    WITH items AS (
      SELECT l_orderkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem WHERE l_orderkey <= {_MAX_ORDER}
      GROUP BY 1, 2
    ), reads AS (
      SELECT l_orderkey, l_partkey,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                                 || CAST(l_partkey AS VARCHAR) || ':'
                                 || CAST(u AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM items, unnest(generate_series(1, CAST(qty AS BIGINT))) AS t(u)
    ), ranked AS (
      SELECT l_orderkey, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY h, l_partkey) AS rn,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS depth
      FROM reads
    )
    SELECT l_orderkey,
           CAST(MAX(depth) AS BIGINT) AS n_reads,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS raw_richness,
           CAST(COUNT(DISTINCT CASE WHEN rn <= {_DEPTH} THEN l_partkey END)
                AS BIGINT) AS rarefied_richness
    FROM ranked
    GROUP BY l_orderkey
    HAVING MAX(depth) >= {_DEPTH}
    ORDER BY l_orderkey
    """,
    desc=f"Deterministic rarefaction to depth {_DEPTH}: every sampled "
         "order's quantity-units ('reads') are ranked by the portable "
         "md5 hash and the first "
         f"{_DEPTH} kept, making richness comparable across unequal "
         "sequencing depths (raw richness grows with depth; rarefied "
         "richness doesn't) — the first normalization of any "
         "amplicon pipeline, here seed-free and oracle-checkable "
         "because the 'random' draw is the engine-portable hash "
         "order. The explode is bounded (quantity <= 50 per item); "
         "the rank window partitions per sample over <= a few "
         "hundred units; samples shallower than the depth are "
         "dropped per standard practice. At 100 TB the unit explode "
         "is a flatMap whose fan-out is data-bounded, and the "
         "per-sample window never leaves one task's partition.",
    tags=["omics", "sampling", "window", "agg"],
)
def q_rarefaction(spark, sf_dir):
    from ..operators.dedup import portable_hash60

    items = (
        tables.load(spark, sf_dir, "lineitem")
        .filter(col("l_orderkey") <= _MAX_ORDER)
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum(col("l_quantity").cast("long")).alias("qty"))
    )
    reads = items.select(
        "l_orderkey", "l_partkey",
        F.explode(F.sequence(F.lit(1), col("qty"))).alias("u"),
    ).select(
        "l_orderkey", "l_partkey",
        portable_hash60(
            F.concat_ws(":", col("l_orderkey"), col("l_partkey"), col("u"))
        ).alias("h"),
    )
    w = Window.partitionBy("l_orderkey").orderBy("h", "l_partkey")
    wd = Window.partitionBy("l_orderkey")
    ranked = reads.select(
        "l_orderkey", "l_partkey",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wd).alias("depth"),
    )
    return (
        ranked.groupBy("l_orderkey")
        .agg(
            F.max("depth").cast("long").alias("n_reads"),
            F.countDistinct("l_partkey").cast("long").alias("raw_richness"),
            F.countDistinct(
                F.when(col("rn") <= _DEPTH, col("l_partkey"))
            ).cast("long").alias("rarefied_richness"),
        )
        .filter(col("n_reads") >= _DEPTH)
        .orderBy("l_orderkey")
    )


@q(
    "q_core_prevalence",
    oracle=f"""
    WITH samples AS (
      SELECT DISTINCT l_orderkey FROM lineitem
      WHERE l_orderkey <= {_MAX_ORDER}
    ), pres AS (
      SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS n_present
      FROM lineitem WHERE l_orderkey <= {_MAX_ORDER}
      GROUP BY l_partkey
    ), tot AS (SELECT COUNT(*) AS n_samples FROM samples)
    SELECT l_partkey, CAST(n_present AS BIGINT) AS n_present,
           CAST(n_samples AS BIGINT) AS n_samples,
           (CAST(n_present AS DOUBLE) / n_samples) AS prevalence
    FROM pres, tot
    ORDER BY n_present DESC, l_partkey
    LIMIT 20
    """,
    desc="Core-taxa prevalence: for each part ('taxon'), the fraction "
         "of sampled orders ('samples') it appears in, top-20 — the "
         "core-microbiome table of the diversity suite "
         "(q_alpha_diversity / q_bray_curtis share the framing), and "
         "in pipeline terms the prevalence filter that drops "
         "rare-noise features before modeling. One combinable "
         "distinct-count agg per taxon + a 1-row sample-count "
         "broadcast (tagged cross) + TakeOrderedAndProject with a "
         "full tie-break — no global sort materializes.",
    tags=["omics", "agg", "cross"],
)
def q_core_prevalence(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").filter(
        col("l_orderkey") <= _MAX_ORDER
    )
    pres = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n_present")
    )
    tot = li.agg(F.countDistinct("l_orderkey").alias("n_samples"))
    return (
        pres.crossJoin(broadcast(tot))
        .select(
            "l_partkey",
            col("n_present").cast("long").alias("n_present"),
            col("n_samples").cast("long").alias("n_samples"),
            (col("n_present").cast("double") / col("n_samples")).alias("prevalence"),
        )
        .orderBy(col("n_present").desc(), "l_partkey")
        .limit(20)
    )
