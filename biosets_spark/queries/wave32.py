"""Thirty-second-wave query inventory: evaluation-curve analytics —
the Gini coefficient (concentration of a quantity over a population)
and the decile lift table (how much a score-ranked population
concentrates an outcome) — the two curves every targeting/quality
model review reads. Both are scoped PER GROUP (segment / source): the
rank windows partition on the group key, so no global single-task
sort exists at any scale — the same statistic at whole-population
scope runs the identical formula over a range-partitioned sort.

Determinism discipline (queries.py header): both are rank statistics
over decimal-exact per-entity aggregates; ranks are integer
row_numbers/NTILEs with full tie-breaks; the Gini reduction is a
decimal sum of exact rank-weighted terms; lift is a ratio of exact
integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import q


@q(
    "q_gini_revenue",
    oracle="""
    WITH per_cust AS (
      SELECT c_mktsegment AS seg, o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_custkey
    ), ranked AS (
      SELECT seg, rev,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY rev, o_custkey) AS rnk
      FROM per_cust
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           (CAST(SUM(rev) AS DOUBLE)) AS total_revenue,
           (CAST(SUM((2 * rnk - 1) * rev) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(rev) AS DOUBLE)) - 1.0) AS gini
    FROM ranked GROUP BY seg ORDER BY seg
    """,
    desc="Gini coefficient of revenue concentration across customers, "
         "per market segment (0 = perfectly even, ->1 = one whale): "
         "the inequality statistic a portfolio review reads, via the "
         "exact rank formula G = sum((2i-1) x_(i)) / (n sum x) - 1. "
         "Per-customer revenue is one combinable decimal agg off the "
         "fact table; the rank window partitions on the segment over "
         "the already-aggregated customer population, and the "
         "weighted sum is exact DECIMAL times integer rank. The full "
         "tie-break makes ranks engine-identical — and the (2i-1) "
         "weighting makes the statistic invariant to tie order "
         "anyway.",
    tags=["agg", "window", "join"],
)
def q_gini_revenue(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(broadcast(c), col("o_custkey") == col("c_custkey"))
        .groupBy(col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("seg").orderBy("rev", "o_custkey")
    ranked = per_cust.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("seg")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum("rev").cast("double")).alias("total_revenue"),
            (F.sum((2 * col("rnk") - 1) * col("rev")).cast("double")
                / (F.count("*") * F.sum("rev").cast("double")) - 1.0).alias("gini"),
        )
        .orderBy("seg")
    )


@q(
    "q_decile_lift",
    oracle="""
    WITH scored AS (
      SELECT source, doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS hit
      FROM documents
    ), ranked AS (
      SELECT source, hit,
             NTILE(10) OVER (PARTITION BY source
                             ORDER BY n_chars DESC, doc_id) AS decile
      FROM scored
    ), per_dec AS (
      SELECT source, decile, COUNT(*) AS n, SUM(hit) AS hits
      FROM ranked GROUP BY source, decile
    ), base AS (
      SELECT source, SUM(n) AS tn, SUM(hits) AS th FROM per_dec GROUP BY source
    )
    SELECT p.source, CAST(p.decile AS INT) AS decile,
           CAST(p.n AS BIGINT) AS n, CAST(p.hits AS BIGINT) AS hits,
           ((CAST(p.hits AS DOUBLE) / p.n)
                 / (CAST(b.th AS DOUBLE) / b.tn)) AS lift
    FROM per_dec p JOIN base b ON p.source = b.source
    WHERE b.th > 0
    ORDER BY p.source, decile
    """,
    desc="Decile lift table per source: documents ranked by a score "
         "(length stands in for any model score) inside each source, "
         "cut into NTILEs, each decile's outcome rate (English-"
         "language here) compared to the source's base rate — the "
         "targeting-evaluation curve (decile-1 lift >> 1 means the "
         "score concentrates the outcome). The rank window partitions "
         "on the source; NTILE with a full tie-break gives engine-"
         "identical cuts; counts are exact integers and lift is one "
         "double ratio against the per-source base joined back on the "
         "group key. Sources with no hits are excluded (their base "
         "rate is zero).",
    tags=["window", "agg", "join"],
)
def q_decile_lift(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    scored = docs.select(
        "source", "doc_id", "n_chars",
        F.when(col("lang") == "en", 1).otherwise(0).alias("hit"),
    )
    w = Window.partitionBy("source").orderBy(col("n_chars").desc(), "doc_id")
    per_dec = (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("source", "decile")
        .agg(F.count("*").alias("n"), F.sum("hit").alias("hits"))
    )
    base = per_dec.groupBy("source").agg(
        F.sum("n").alias("tn"), F.sum("hits").alias("th")
    )
    return (
        per_dec.join(broadcast(base), "source")
        .filter(col("th") > 0)
        .select(
            "source",
            col("decile").cast("int").alias("decile"),
            "n", "hits",
            ((col("hits").cast("double") / col("n"))
                / (col("th").cast("double") / col("tn"))).alias("lift"),
        )
        .orderBy("source", "decile")
    )
