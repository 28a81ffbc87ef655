"""Ninth-wave query inventory: the last remaining TPC-H shapes the
lean schema can express (Q13 customer order-count distribution, Q17
small-quantity revenue, Q22 idle rich customers), plus three corpus
health statistics every training-data refresh computes — unigram-LM
cross-entropy ("cheap perplexity") outlier scoring, printable-ASCII
script ratio by language, and Zipf head coverage of the vocabulary.

Determinism discipline follows queries.py: double aggregates go
through DECIMAL casts (exact, order-free accumulation), top-k uses a
total order with a unique-key tie-break, every computed column is
aliased identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators import text as T
from . import dfloor, dsum, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_order_count_distribution",
    oracle="""
    WITH oc AS (
      SELECT o_custkey, COUNT(*) AS cnt
      FROM orders
      WHERE o_orderpriority <> '1-URGENT'
      GROUP BY o_custkey
    )
    SELECT CAST(COALESCE(oc.cnt, 0) AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    GROUP BY COALESCE(oc.cnt, 0)
    ORDER BY custdist DESC, c_count DESC
    """,
    desc="TPC-H Q13 shape: distribution of per-customer order counts "
         "(excluding one priority class), customers with zero orders "
         "included via the left join. Orders are pre-aggregated to one "
         "row per customer BEFORE the join, so the join input shrinks "
         "from |orders| to at most |customer| rows.",
    tags=["join", "agg"],
)
def q_order_count_distribution(spark, sf_dir):
    customer = tables.load(spark, sf_dir, "customer").select("c_custkey")
    orders = tables.load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    oc = (
        orders.filter(col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        customer.join(oc, col("c_custkey") == col("o_custkey"), "left")
        .select(F.coalesce(col("cnt"), lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(col("custdist").desc(), col("c_count").desc())
    )


@q(
    "q_small_quantity_revenue",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem
      JOIN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23') pb
        ON l_partkey = pb.p_partkey
    ),
    thr AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*)) AS lim
      FROM li GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM li JOIN thr ON li.l_partkey = thr.l_partkey
    WHERE li.l_quantity < thr.lim
    """,
    desc="TPC-H Q17 shape: revenue from small-quantity orders of one "
         "brand's parts, threshold = 20% of the per-part mean quantity. "
         "The brand dim filter is a broadcast semi join pushed in front "
         "of both passes; the per-part thresholds (a tiny table) "
         "broadcast back onto the filtered lineitem slice. The mean is "
         "exact-decimal-sum / count so the threshold double is "
         "engine-identical.",
    tags=["join", "agg"],
)
def q_small_quantity_revenue(spark, sf_dir):
    part = tables.load(spark, sf_dir, "part")
    lineitem = tables.load(spark, sf_dir, "lineitem")
    pb = part.filter(col("p_brand") == "Brand#23").select("p_partkey")
    li = (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(pb), col("l_partkey") == col("p_partkey"))
        .drop("p_partkey")
    )
    thr = li.groupBy("l_partkey").agg(
        (
            lit(0.2)
            * (F.sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*"))
        ).alias("lim")
    )
    return (
        li.join(broadcast(thr), "l_partkey")
        .filter(col("l_quantity") < col("lim"))
        .agg(
            F.count("*").alias("n_small"),
            (F.sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / lit(7.0))
            .alias("avg_yearly"),
        )
    )


@q(
    "q_idle_rich_customers",
    oracle="""
    WITH ab AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg_bal FROM ab)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    desc="TPC-H Q22 shape: above-average-balance customers with no "
         "urgent orders, grouped by market segment (every synthetic "
         "customer has some order, so the no-orders-at-all predicate "
         "would be vacuously empty). The global average is a "
         "one-row broadcast (deliberate BroadcastNestedLoopJoin); the "
         "balance filter runs BEFORE the anti join so the shuffled "
         "anti-join probe side is the small above-average slice, not "
         "the full customer table.",
    tags=["join", "agg", "cross"],
)
def q_idle_rich_customers(spark, sf_dir):
    customer = tables.load(spark, sf_dir, "customer")
    orders = (
        tables.load(spark, sf_dir, "orders")
        .filter(col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    ab = (
        customer.filter(col("c_acctbal") > 0.0)
        .agg(
            (F.sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count("*"))
            .alias("avg_bal")
        )
    )
    rich = (
        customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .crossJoin(broadcast(ab))
        .filter(col("c_acctbal") > col("avg_bal"))
    )
    return (
        rich.join(orders, col("c_custkey") == col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@q(
    "q_unigram_surprise",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM counts),
    surprise AS (
      SELECT toks.doc_id,
             CAST(FLOOR((-LN(CAST(counts.c AS DOUBLE) / (SELECT total FROM tot))) * 1e8 + 0.5) / 1e8 AS DECIMAL(18,8)) AS s
      FROM toks JOIN counts ON toks.tok = counts.tok
    ),
    doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(s) AS DOUBLE) AS sum_surprise
      FROM surprise GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, (sum_surprise / n_tokens) AS xent
    FROM doc
    ORDER BY sum_surprise / n_tokens DESC, doc_id
    LIMIT 20
    """,
    desc="Top-20 highest cross-entropy documents under a corpus-fitted "
         "unigram LM — the cheap 'perplexity filter' tail. Per-token "
         "surprise quantized to DECIMAL(18,8) before the per-doc sum "
         "(order-free); ordering uses the exact sum/count double with "
         "a doc_id tie-break; display value rounded.",
    # "cross" tag: unigram_surprise normalizes with a deliberate 1-row
    # crossJoin(broadcast(total)) — same pattern as q_mix_temperature.
    tags=["text", "join", "agg", "cross"],
)
def q_unigram_surprise(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    scored = T.unigram_surprise(docs)
    return (
        scored.orderBy(col("xent").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "n_tokens", (col("xent")).alias("xent"))
    )


@q(
    "q_script_ratio",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (CAST(SUM(CAST(FLOOR((CASE WHEN n_chars > 0 THEN
                     CAST(LENGTH(REGEXP_REPLACE(text, '[^ -~]', '', 'g'))
                          AS DOUBLE) / CAST(n_chars AS DOUBLE)
                   ELSE 1.0 END) * 1e8 + 0.5) / 1e8 AS DECIMAL(18,8))) AS DOUBLE)
                 / COUNT(*)) AS mean_ascii_ratio
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    desc="Printable-ASCII script ratio by language — the script-mix "
         "audit a multilingual corpus refresh runs to catch mislabeled "
         "or mojibake shards. The ASCII count is an unambiguous regex "
         "on both engines; the denominator is the stored n_chars column "
         "(full string length can differ across engines on astral code "
         "points). Per-doc ratios quantize to DECIMAL(18,8) before the "
         "group sum.",
    tags=["text", "agg"],
)
def q_script_ratio(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("lang", "text", "n_chars")
    ratio = (dfloor((T.ascii_ratio(col("text"), col("n_chars"))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(18,8)")
    return (
        docs.select("lang", ratio.alias("_r"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("_r").cast("double") / F.count("*")).alias("mean_ascii_ratio"),
        )
        .orderBy("lang")
    )


@q(
    "q_head_coverage",
    oracle=f"""
    WITH counts AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
      GROUP BY tok
    ),
    top AS (SELECT c FROM counts ORDER BY c DESC, tok DESC LIMIT 100)
    SELECT CAST((SELECT SUM(c) FROM top) AS BIGINT) AS head_tokens,
           CAST((SELECT SUM(c) FROM counts) AS BIGINT) AS total_tokens,
           (CAST((SELECT SUM(c) FROM top) AS DOUBLE)
                 / CAST((SELECT SUM(c) FROM counts) AS DOUBLE))
             AS head_coverage
    """,
    desc="Zipf head coverage: fraction of all corpus tokens accounted "
         "for by the 100 most frequent types — the tokenizer-sizing / "
         "vocabulary-truncation statistic. One explode + combinable "
         "counts; the head is a TakeOrdered over the (count, token) "
         "total order; two singleton aggregates broadcast-joined.",
    tags=["text", "agg", "cross"],
)
def q_head_coverage(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("text")
    counts = (
        docs.select(F.explode(T.tokens(col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    head = (
        counts.orderBy(col("c").desc(), col("tok").desc())
        .limit(100)
        .agg(F.sum("c").alias("head_tokens"))
    )
    total = counts.agg(F.sum("c").alias("total_tokens"))
    return head.crossJoin(broadcast(total)).select(
        "head_tokens",
        "total_tokens",
        (col("head_tokens").cast("double") / col("total_tokens").cast("double")).alias("head_coverage"),
    )
