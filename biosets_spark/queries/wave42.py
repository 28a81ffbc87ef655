"""Forty-second-wave query inventory: privacy / data-governance
audits — k-anonymity (how small is the smallest quasi-identifier
equivalence class, and how many rows sit in re-identifiable classes)
and l-diversity (do small classes also expose a sensitive attribute
by near-unanimity?). The release-gate checks a data-sharing pipeline
runs BEFORE exporting, complementing q_pii_redact's value-level
scrubbing with table-shape-level disclosure risk.

Quasi-identifier here: (nation, market segment, account-balance
band). Sensitive attribute for l-diversity: order priority. Both are
pure combinable aggregations over the equivalence-class table — the
class table is orders of magnitude smaller than the data, so every
step after the first groupBy is effectively free at any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import q

# acctbal in [-1000, 10000) -> 1000-wide bands; floor() keeps the
# band arithmetic exact on both engines (acctbal has 2 decimals)
_BAND = "CAST(FLOOR(c_acctbal / 1000) AS BIGINT)"


@q(
    "q_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment, {_BAND} AS bal_band,
             COUNT(*) AS class_size
      FROM customer GROUP BY 1, 2, 3
    ), tot AS (
      SELECT SUM(class_size) AS n_rows FROM classes
    )
    SELECT CAST(class_size AS BIGINT) AS class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows_in_size,
           (CAST(SUM(class_size) AS DOUBLE) / MAX(t.n_rows))
             AS row_share,
           CAST((SELECT MIN(class_size) FROM classes) AS BIGINT)
             AS k_anonymity
    FROM classes, tot t
    GROUP BY class_size ORDER BY class_size LIMIT 20
    """,
    desc="k-anonymity audit over the quasi-identifier (nation, "
         "segment, 1000-wide balance band): the class-size "
         "distribution head (how many equivalence classes of size 1, "
         "2, ... and what share of rows they hold) plus the table's "
         "k-anonymity level (the minimum class size — size-1 classes "
         "are directly re-identifiable rows). THE release gate before "
         "sharing: q_pii_redact scrubs values, this measures shape "
         "disclosure. One combinable groupBy to the class table, "
         "then counts-of-counts over classes (already tiny) + a "
         "1-row total broadcast (tagged cross). At 100 TB the only "
         "data-scale step is the first agg.",
    tags=["privacy", "agg", "cross"],
)
def q_k_anonymity(spark, sf_dir):
    cust = tables.load(spark, sf_dir, "customer")
    classes = (
        cust.groupBy(
            "c_nationkey", "c_mktsegment",
            F.expr(_BAND).alias("bal_band"),
        )
        .agg(F.count("*").alias("class_size"))
    )
    tot = classes.agg(
        F.sum("class_size").alias("n_rows"),
        F.min("class_size").alias("k_anonymity"),
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count("*").alias("n_classes"),
             F.sum("class_size").alias("n_rows_in_size"))
        .crossJoin(broadcast(tot))
        .select(
            col("class_size").cast("long").alias("class_size"),
            col("n_classes").cast("long").alias("n_classes"),
            col("n_rows_in_size").cast("long").alias("n_rows_in_size"),
            (col("n_rows_in_size").cast("double") / col("n_rows")).alias("row_share"),
            col("k_anonymity").cast("long").alias("k_anonymity"),
        )
        .orderBy("class_size")
        .limit(20)
    )


@q(
    "q_l_diversity",
    oracle=f"""
    WITH joined AS (
      SELECT c.c_nationkey, c.c_mktsegment, {_BAND} AS bal_band,
             o.o_orderpriority
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ), classes AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT o_orderpriority) AS l_distinct
      FROM joined GROUP BY 1, 2, 3
    )
    SELECT CAST(l_distinct AS BIGINT) AS l_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(n_rows) AS BIGINT) AS min_class_rows,
           CAST((SELECT MIN(l_distinct) FROM classes) AS BIGINT)
             AS l_diversity
    FROM classes GROUP BY l_distinct ORDER BY l_distinct
    """,
    desc="l-diversity audit: within each quasi-identifier class "
         "(nation, segment, balance band), how many DISTINCT values "
         "of the sensitive attribute (order priority) appear — a "
         "k-anonymous class whose members all share one sensitive "
         "value still discloses it (the homogeneity attack "
         "k-anonymity alone misses). Reports the class distribution "
         "by distinct-count and the table's l-diversity level (the "
         "minimum). The fact join collapses into the class table in "
         "one distinct-count agg; everything after runs over classes "
         "(tiny; the 1-row minimum broadcast is tagged cross). "
         "Release gate: publish only if l >= policy threshold.",
    tags=["privacy", "join", "agg", "cross"],
)
def q_l_diversity(spark, sf_dir):
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")
    joined = orders.join(
        cust, col("o_custkey") == col("c_custkey")
    ).select(
        "c_nationkey", "c_mktsegment",
        F.expr(_BAND).alias("bal_band"),
        "o_orderpriority",
    )
    classes = joined.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderpriority").alias("l_distinct"),
    )
    tot = classes.agg(F.min("l_distinct").alias("l_diversity"))
    return (
        classes.groupBy("l_distinct")
        .agg(F.count("*").alias("n_classes"),
             F.min("n_rows").alias("min_class_rows"))
        .crossJoin(broadcast(tot))
        .select(
            col("l_distinct").cast("long").alias("l_distinct"),
            col("n_classes").cast("long").alias("n_classes"),
            col("min_class_rows").cast("long").alias("min_class_rows"),
            col("l_diversity").cast("long").alias("l_diversity"),
        )
        .orderBy("l_distinct")
    )
