"""Twelfth-wave query inventory: customer-cohort retention (the
calendar-cohort twin of the event-stream retention query), sequential
self-comparison via lag (orders in quick succession), and ROLLUP with
GROUPING() indicator columns (disambiguating aggregation-level NULLs
from data NULLs).

Determinism discipline follows queries.py: calendar math is integer
(year*12 + month), lag windows use a unique-key tie-break so adjacency
is total, and grouping ids are engine-defined integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from . import q


@q(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_part('year', o_orderdate) * 12
                 + date_part('month', o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT DISTINCT o.o_custkey,
             date_part('year', o.o_orderdate) * 12
             + date_part('month', o.o_orderdate) AS act_m
      FROM orders o
    )
    SELECT CAST(f.cohort_m AS BIGINT) AS cohort_m,
           CAST(a.act_m - f.cohort_m AS BIGINT) AS months_since,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM activity a JOIN firsts f ON a.o_custkey = f.o_custkey
    WHERE a.act_m - f.cohort_m <= 6
    GROUP BY f.cohort_m, a.act_m - f.cohort_m
    """,
    desc="calendar-cohort retention: customers bucketed by first-order "
         "month, counted again in each of the following 6 months they "
         "ordered — the cohort twin of the event-stream retention "
         "query. Month index = year*12+month, pure integer calendar "
         "math; the per-customer first month is a combinable MIN; one "
         "shuffle on the customer key.",
    tags=["join", "agg", "cohort"],
)
def q_cohort_retention(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    m = (F.year(col("o_orderdate")) * 12 + F.month(col("o_orderdate"))).alias("act_m")
    activity = o.select("o_custkey", m).distinct()
    firsts = activity.groupBy("o_custkey").agg(F.min("act_m").alias("cohort_m"))
    return (
        activity.join(firsts, "o_custkey")
        .select("cohort_m", (col("act_m") - col("cohort_m")).alias("months_since"))
        .filter(col("months_since") <= 6)
        .groupBy("cohort_m", "months_since")
        .agg(F.count("*").alias("n_customers"))
        .select(col("cohort_m").cast("long").alias("cohort_m"),
                col("months_since").cast("long").alias("months_since"),
                "n_customers")
    )


@q(
    "q_quick_succession",
    oracle="""
    WITH seq AS (
      SELECT o_orderpriority,
             date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN gap_days <= 7 THEN 1 END) AS BIGINT) AS n_quick,
           CAST(COUNT(CASE WHEN gap_days IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_repeat
    FROM seq GROUP BY o_orderpriority
    """,
    desc="sequential self-comparison without a self-join: per customer, "
         "orders placed within 7 days of the previous order via lag() "
         "over (custkey, date, unique-key) — the total tie-break makes "
         "adjacency deterministic under same-day orders; one exchange "
         "on the high-cardinality customer key.",
    tags=["window", "agg"],
)
def q_quick_succession(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(col("o_orderdate"), F.lag("o_orderdate").over(w))
    seq = o.select("o_orderpriority", gap.alias("gap_days"))
    return seq.groupBy("o_orderpriority").agg(
        F.count(F.when(col("gap_days") <= 7, 1)).alias("n_quick"),
        F.count(F.when(col("gap_days").isNotNull(), 1)).alias("n_repeat"),
    )


@q(
    "q_grouping_id",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
           CAST(GROUPING(c_nationkey) AS INT) AS g_nat,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
    desc="ROLLUP with GROUPING() indicator columns: the markers "
         "disambiguate aggregation-level NULLs from data NULLs (the "
         "standard cube-consumer contract); partial aggregation "
         "expands grouping ids map-side.",
    tags=["agg", "rollup"],
)
def q_grouping_id(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    return (
        c.rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("c_nationkey").cast("int").alias("g_nat"),
            F.count("*").alias("n"),
        )
        .select("c_mktsegment", "c_nationkey", "g_seg", "g_nat", "n")
    )


@q(
    "q_token_fertility",
    oracle=r"""
    SELECT lang,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_extract_all(text,
                 '[\p{L}]+|[\p{N}]+|[^ \t\n\x0B\f\r\p{L}\p{N}]'))) AS BIGINT)
             AS total_bpe,
           (CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE)
                 / SUM(len(regexp_extract_all(text,
                       '[\p{L}]+|[\p{N}]+|[^ \t\n\x0B\f\r\p{L}\p{N}]'))))
             AS chars_per_token
    FROM documents GROUP BY lang
    """,
    desc="tokenizer fertility by language (chars per BPE-ish token): "
         "the statistic that sizes vocabulary share per language in a "
         "multilingual tokenizer. Integer sums + one closing division; "
         "regexp_extract_all is JVM-side scan-speed.",
    tags=["text", "tokens", "agg"],
)
def q_token_fertility(spark, sf_dir):
    from ..operators import text as T

    docs = tables.load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(col("n_chars").cast("bigint")).alias("total_chars"),
        F.sum(F.size(T.bpe_tokens(col("text")))).cast("bigint").alias("total_bpe"),
        (F.sum(col("n_chars").cast("bigint")).cast("double")
            / F.sum(F.size(T.bpe_tokens(col("text"))))).alias("chars_per_token"),
    )


@q(
    "q_source_quality_matrix",
    oracle=r"""
    WITH toks AS (
      SELECT source, lang,
             list_filter(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    flags AS (
      SELECT source, lang,
             len(t) AS n,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
                            AS DOUBLE) / len(t) END AS alpha_frac,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE CAST(len(list_distinct(t)) AS DOUBLE) / len(t) END AS dratio
      FROM toks
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN n >= 30 AND n <= 100000
                            AND dratio >= 0.4 AND alpha_frac >= 0.8
                           THEN 1 END) AS BIGINT) AS n_keep
    FROM flags GROUP BY source, lang
    """,
    desc="per-(source, lang) quality keep matrix (word-count, distinct-"
         "ratio, and alpha-fraction Gopher gates): the audit table a "
         "corpus refresh publishes to catch a degraded source early. "
         "Pure expressions + combinable counts; integer outputs. (The "
         "mean-word-length gate is omitted so the matrix isolates the "
         "composition-sensitive rules.)",
    tags=["text", "agg", "quality"],
)
def q_source_quality_matrix(spark, sf_dir):
    from ..operators import text as T

    docs = tables.load(spark, sf_dir, "documents").select("source", "lang", "text")
    toks = T.tokens(col("text"))
    n = F.size(toks)
    nz = F.greatest(n, F.lit(1))
    alpha_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double") / n)
    dratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(toks)).cast("double") / n)
    keep = (n >= 30) & (n <= 100_000) & (dratio >= 0.4) & (alpha_frac >= 0.8)
    return (
        docs.select("source", "lang", keep.alias("keep"))
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"),
             F.count(F.when(col("keep"), 1)).alias("n_keep"))
    )


@q(
    "q_dup_rate_by_source",
    oracle="""
    WITH fp AS (
      SELECT source,
             md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))
               AS f
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT f) AS BIGINT) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT f) AS BIGINT) AS n_dups
    FROM fp GROUP BY source
    """,
    desc="exact-duplicate rate per source (normalized-text md5 "
         "fingerprints): the provenance-level dedup audit — a source "
         "whose dup rate jumps between refreshes is re-crawling "
         "itself. Shuffles (source, fingerprint) only.",
    tags=["dedup", "agg"],
)
def q_dup_rate_by_source(spark, sf_dir):
    from ..operators.dedup import fingerprint_md5

    docs = tables.load(spark, sf_dir, "documents").select("source", "text")
    fp = docs.select("source", fingerprint_md5(col("text")).alias("f"))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("f").alias("n_unique"),
        (F.count("*") - F.countDistinct("f")).alias("n_dups"),
    )


def _langid_confusion_oracle() -> str:
    from .wave3 import _ARGMAX_CASE, _lang_scores_sql

    return f"""
    WITH toks AS (
      SELECT lang,
             list_transform(list_filter(string_split_regex(trim(text),
                 '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> ''), t -> lower(t)) AS toks
      FROM documents
    ),
    scores AS (
      SELECT lang,
           {_lang_scores_sql()}
      FROM toks
    )
    SELECT lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) > 0
                THEN {_ARGMAX_CASE} ELSE 'und' END AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scores GROUP BY 1, 2
    """


@q(
    "q_langid_confusion",
    oracle=_langid_confusion_oracle(),
    desc="language-ID confusion matrix (labeled lang x stopword-vote "
         "prediction): the label-quality audit a multilingual corpus "
         "runs to catch mislabeled shards — a lang whose rows "
         "concentrate off-diagonal is suspect. Pure expression "
         "scoring + combinable counts; the oracle mirrors the argmax "
         "tie-breaking exactly.",
    tags=["text", "langid", "agg"],
)
def q_langid_confusion(spark, sf_dir):
    from ..operators import text as T

    docs = tables.load(spark, sf_dir, "documents").select("lang", "text")
    pred = T.lang_id(docs)
    return pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
