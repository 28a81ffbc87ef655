"""Twenty-third-wave query inventory: data-contract validation and
cross-lingual template detection — the referential-integrity audit a
warehouse load gate runs, and the language-pair near-dup matrix that
separates translated/templated boilerplate from in-language dups.

Determinism discipline (queries.py header): the audit is pure integer
counting (anti-join cardinalities and predicate violations); the
language matrix inherits the bounded-Jaccard determinism (exact
integer shingle counts, one ratio compare).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from ..operators import dedup as D
from . import q


@q(
    "q_referential_audit",
    oracle="""
    SELECT 'orphan_lineitems' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'childless_orders',
           CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    UNION ALL
    SELECT 'orders_unknown_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'bad_lineitem_values',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    WHERE l_quantity <= 0 OR l_extendedprice <= 0
       OR l_discount < 0 OR l_discount > 1 OR l_tax < 0
    ORDER BY check_name
    """,
    desc="Data-contract validation gate: referential integrity both "
         "directions across the order/lineitem/customer keys (anti-"
         "join cardinalities — at scale each is one shuffle on the "
         "key, or a broadcast when the parent's key set is small) "
         "plus domain predicates on measures at scan speed. The load "
         "gate a warehouse runs before publishing a snapshot; "
         "childless orders are EXPECTED in TPC-H-shaped data (orders "
         "with no lineitems at this SF) — the audit reports, the "
         "policy decides. Zero rows are evidence, not absence: every "
         "check always emits its row.",
    tags=["join", "agg", "audit"],
)
def q_referential_audit(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")

    def check(name, df):
        return df.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    orphan = li.join(o.select("o_orderkey"),
                     col("l_orderkey") == col("o_orderkey"), "left_anti")
    childless = o.join(li.select("l_orderkey").distinct(),
                       col("o_orderkey") == col("l_orderkey"), "left_anti")
    unknown_cust = o.join(c.select("c_custkey"),
                          col("o_custkey") == col("c_custkey"), "left_anti")
    bad_vals = li.filter(
        (col("l_quantity") <= 0) | (col("l_extendedprice") <= 0)
        | (col("l_discount") < 0) | (col("l_discount") > 1) | (col("l_tax") < 0)
    )
    return (
        check("orphan_lineitems", orphan)
        .unionAll(check("childless_orders", childless))
        .unionAll(check("orders_unknown_customer", unknown_cust))
        .unionAll(check("bad_lineitem_values", bad_vals))
        .orderBy("check_name")
    )


@q(
    "q_crosslingual_dup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 2, 2)),
                                   i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
      FROM toks
    ),
    kept AS (
      SELECT sh.doc_id, sh.s
      FROM sh JOIN (SELECT s, COUNT(*) AS d FROM sh GROUP BY 1) df USING (s)
      WHERE df.d <= 50
    ),
    cnt AS (SELECT doc_id, COUNT(*) n FROM kept GROUP BY 1),
    pairs AS (
      SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) common
      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edge AS (
      SELECT id_a, id_b
      FROM pairs JOIN cnt ca ON pairs.id_a = ca.doc_id
                 JOIN cnt cb ON pairs.id_b = cb.doc_id
      WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.3
    )
    SELECT LEAST(da.lang, db.lang) AS lang_a,
           GREATEST(da.lang, db.lang) AS lang_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM edge
    JOIN documents da ON edge.id_a = da.doc_id
    JOIN documents db ON edge.id_b = db.doc_id
    GROUP BY LEAST(da.lang, db.lang), GREATEST(da.lang, db.lang)
    ORDER BY lang_a, lang_b
    """,
    desc="Cross-lingual near-duplicate matrix: bounded-Jaccard pairs "
         "(threshold 0.3) bucketed by the unordered language pair of "
         "their endpoints. Off-diagonal mass is templated/boilerplate "
         "content leaking across language shards — the signal that "
         "per-language dedup is not enough and the pipeline needs a "
         "language-agnostic pass; diagonal mass is ordinary "
         "in-language duplication. Reuses the df-bounded shingle "
         "self-join (fan-out capped at 50 docs/shingle); the language "
         "lookups are joins on the doc key, broadcastable when the "
         "doc dimension's (id, lang) projection is small.",
    tags=["dedup", "ngram", "join"],
)
def q_crosslingual_dup(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=4, threshold=0.3, max_shingle_df=50)
    langs = docs.select("doc_id", "lang")
    la = langs.select(col("doc_id").alias("id_a"), col("lang").alias("la"))
    lb = langs.select(col("doc_id").alias("id_b"), col("lang").alias("lb"))
    return (
        pairs.join(la, "id_a").join(lb, "id_b")
        .groupBy(
            F.least("la", "lb").alias("lang_a"),
            F.greatest("la", "lb").alias("lang_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("lang_a", "lang_b")
    )
