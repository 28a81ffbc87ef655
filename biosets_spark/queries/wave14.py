"""Fourteenth-wave query inventory: a bigram-LM perplexity filter
(the CCNet-style quality gate one rung above unigram surprise), the
FlatMapCoGroupsInPandas UDF surface exercised through a bucketed
orders/lineitem reconciliation, robust median/MAD outlier gating,
deterministic per-group sampling, and a differential audit of
approx_percentile against the exact sort-based percentile.

Determinism discipline follows queries.py: double aggregates pass
through explicit ROUND + DECIMAL quantization before any SUM, top-k
uses a total order with a unique-key tie-break, sketch outputs are
emitted as within-tolerance flags (the q_approx_distinct pattern),
and every computed column is aliased identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators import text as T
from . import q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_bigram_surprise",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM toks
    ),
    posts AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg),
    bgc AS (SELECT bg, COUNT(*) AS cbg FROM posts GROUP BY bg),
    ctx AS (SELECT w1, COUNT(*) AS cw1 FROM posts GROUP BY w1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT unnest(t) AS tok FROM toks)
    ),
    surprise AS (
      SELECT posts.doc_id,
             CAST(FLOOR((-LN((bgc.cbg + 1) / (ctx.cw1 + (SELECT v FROM vocab)))) * 1e8 + 0.5) / 1e8
                  AS DECIMAL(18,8)) AS s
      FROM posts JOIN bgc USING (bg) JOIN ctx USING (w1)
    ),
    doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(s) AS DOUBLE) AS sum_surprise
      FROM surprise GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, (sum_surprise / n_bigrams) AS xent
    FROM doc ORDER BY sum_surprise / n_bigrams DESC, doc_id LIMIT 20
    """,
    desc="Top-20 highest cross-entropy documents under a corpus-fitted "
         "add-one-smoothed bigram LM (CCNet-style perplexity filter): "
         "catches docs whose tokens are individually common but "
         "globally mis-strung (template spam, shuffled text) that the "
         "unigram filter passes. Bigrams built per-row via zip_with "
         "over array slices — no explode-side self-join; postings "
         "carry (doc_id, bigram) only. Per-position surprise is "
         "DECIMAL(18,8)-quantized before the order-free per-doc sum.",
    # "cross" tag: the vocabulary size V is a deliberate 1-row
    # crossJoin(broadcast(...)) normalizer (q_unigram_surprise pattern).
    tags=["text", "join", "agg", "cross"],
)
def q_bigram_surprise(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    scored = T.bigram_surprise(docs)
    return (
        scored.orderBy(col("xent").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "n_bigrams", (col("xent")).alias("xent"))
    )


@q(
    "q_cogroup_reconcile",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COALESCE(li.n, 0) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
    GROUP BY COALESCE(li.n, 0)
    ORDER BY n_items
    """,
    desc="U1/UDTF surface: orders-vs-lineitem reconciliation through "
         "cogroup().applyInPandas (FlatMapCoGroupsInPandas). Both "
         "sides are cogrouped on a 64-way orderkey bucket — Python is "
         "invoked O(buckets) times, NOT per order — and the kernel "
         "does a vectorized pandas merge + histogram inside each "
         "bucket, emitting combinable partial (n_items, n_orders) "
         "rows that one final map-side-combinable groupBy sums. "
         "Orders with zero lineitems surface as n_items=0 (left-join "
         "semantics). Integer-only outputs: deterministic.",
    tags=["udf", "join", "agg"],
)
def q_cogroup_reconcile(spark, sf_dir):
    import pandas as pd

    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", F.pmod(col("o_orderkey"), lit(64)).alias("_b")
    )
    l = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.pmod(col("l_orderkey"), lit(64)).alias("_b")
    )

    def reconcile(odf: "pd.DataFrame", ldf: "pd.DataFrame") -> "pd.DataFrame":
        per_order = (
            ldf.groupby("l_orderkey").size().rename("n").reset_index()
            if len(ldf)
            else pd.DataFrame({"l_orderkey": pd.Series(dtype="int64"),
                               "n": pd.Series(dtype="int64")})
        )
        m = odf[["o_orderkey"]].merge(
            per_order, left_on="o_orderkey", right_on="l_orderkey", how="left"
        )
        m["n"] = m["n"].fillna(0).astype("int64")
        h = m.groupby("n").size().reset_index(name="n_orders")
        return h.rename(columns={"n": "n_items"})

    partial = (
        o.groupBy("_b")
        .cogroup(l.groupBy("_b"))
        .applyInPandas(reconcile, "n_items long, n_orders long")
    )
    return (
        partial.groupBy("n_items")
        .agg(F.sum("n_orders").alias("n_orders"))
        .orderBy("n_items")
    )


@q(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT lang, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
      FROM documents GROUP BY lang
    ),
    d AS (
      SELECT documents.lang, n_chars, med,
             ABS(CAST(n_chars AS DOUBLE) - med) AS ad
      FROM documents JOIN med USING (lang)
    ),
    mad AS (SELECT lang, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY lang)
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (MIN(d.med)) AS median_chars,
           (MIN(mad.mad)) AS mad_chars,
           CAST(SUM(CASE WHEN d.ad > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM d JOIN mad USING (lang)
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    desc="Robust per-language length gating: median + MAD (median "
         "absolute deviation) of n_chars, and the count of docs "
         "outside median±3·MAD — the outlier gate a corpus refresh "
         "runs where mean/stddev would be dragged by the very tail it "
         "is hunting. Two sort-based exact percentile aggs; the 1-row-"
         "per-lang median/MAD tables come back as broadcast joins. "
         "All inputs are integers (+ interpolated halves), so the "
         "3·MAD comparison is float-exact on both engines.",
    tags=["agg", "percentile", "join", "text"],
)
def q_mad_outliers(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("lang", "n_chars")
    med = docs.groupBy("lang").agg(
        F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").alias("med")
    )
    d = docs.join(broadcast(med), "lang").withColumn(
        "ad", F.abs(col("n_chars").cast("double") - col("med"))
    )
    mad = d.groupBy("lang").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        d.join(broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.min("med")).alias("median_chars"),
            (F.min("mad")).alias("mad_chars"),
            F.sum(
                F.when(col("ad") > 3 * col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("lang")
    )


@q(
    "q_group_sample",
    oracle="""
    SELECT lang, doc_id, rn FROM (
      SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
      FROM documents
    ) t WHERE rn <= 5
    ORDER BY lang, rn
    """,
    desc="Deterministic per-group sampling: 5 docs per language by "
         "md5(doc_id) order — the engine-portable analogue of a "
         "seeded per-group reservoir, used to eyeball shards during a "
         "corpus audit. The rank<=k filter compiles to Spark's "
         "WindowGroupLimit: each task keeps a local top-5 per group "
         "BEFORE the shuffle, so a hot language never moves more than "
         "5 rows per upstream partition.",
    tags=["window", "text"],
)
def q_group_sample(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("lang", "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.md5(col("doc_id").cast("string")), col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select("lang", "doc_id", "rn")
        .orderBy("lang", "rn")
    )


@q(
    "q_approx_quantile_audit",
    # The t-digest/KLL-style approx_percentile output is engine-
    # specific, but "approx lands inside the exact p40..p60 (resp.
    # p90..p99) band" is a deterministic boolean at accuracy=10000 on
    # this data — so emit exact percentiles plus the flags, and the
    # oracle asserts the flags (q_approx_distinct pattern).
    # the flags carry a support gate (n >= 100): on a handful of rows
    # the exact band is an INTERPOLATED interval between two data
    # points while the (then-exact) sketch returns an actual data
    # value, so "inside the band" is vacuously undecidable — the gate
    # makes the audit NULL there on both engines instead of flaky
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           (quantile_cont(o_totalprice, 0.5)) AS p50_exact,
           (quantile_cont(o_totalprice, 0.95)) AS p95_exact,
           CASE WHEN COUNT(*) >= 100 THEN CAST(1 AS INT) END
             AS p50_within_band,
           CASE WHEN COUNT(*) >= 100 THEN CAST(1 AS INT) END
             AS p95_within_band
    FROM orders GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    desc="Differential audit of the approx_percentile sketch: per "
         "order priority, the approximate p50/p95 (accuracy 10000) "
         "must land inside the exact p40..p60 / p90..p99 bands "
         "computed by the sort-based exact percentile — the check an "
         "operator runs before trusting the single-pass sketch for "
         "100 TB SLO dashboards, where the exact sort is the thing "
         "being avoided.",
    tags=["agg", "percentile", "approx"],
)
def q_approx_quantile_audit(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            (F.expr("percentile(o_totalprice, 0.5)")).alias("p50_exact"),
            (F.expr("percentile(o_totalprice, 0.95)")).alias("p95_exact"),
            F.when(F.count("*") >= 100, (
                (F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
                 >= F.expr("percentile(o_totalprice, 0.40)"))
                & (F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
                   <= F.expr("percentile(o_totalprice, 0.60)"))
            ).cast("int")).alias("p50_within_band"),
            F.when(F.count("*") >= 100, (
                (F.expr("approx_percentile(o_totalprice, 0.95, 10000)")
                 >= F.expr("percentile(o_totalprice, 0.90)"))
                & (F.expr("approx_percentile(o_totalprice, 0.95, 10000)")
                   <= F.expr("percentile(o_totalprice, 0.99)"))
            ).cast("int")).alias("p95_within_band"),
        )
        .orderBy("o_orderpriority")
    )
