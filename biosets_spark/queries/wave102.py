"""Wave 102 (r10): training-data pipeline operations — deterministic
text normalization, vocabulary OOV coverage, tolerance-bounded as-of
join, SRP bucket occupancy, exact z-score outliers, and
largest-remainder dedup budget allocation.

Determinism discipline: string ops restrict to printable ASCII before
lowercasing (Java and DuckDB regex/lower agree exactly there); every
statistical test runs in exact integer arithmetic (variance compares
multiplied out to DECIMAL(38,0)/HUGEINT, no float sqrt anywhere);
integer division/modulo operate on positives only, where Spark DIV,
DuckDB // and Python agree.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators import similarity as S
from . import q
from .ext import _duck_bucket_expr

# printable-ASCII projection + lowercase + alnum-only + collapsed
# whitespace — the engine-portable normalization core (Java and RE2
# regex semantics coincide on these classes; Unicode lower() could
# diverge, ASCII lower() cannot)
_NORM_SPARK = (
    lambda c: F.trim(F.regexp_replace(F.regexp_replace(
        F.lower(F.regexp_replace(c, "[^ -~]", "")),
        "[^a-z0-9 ]", ""), " +", " "))
)
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace("
    "lower(regexp_replace({c}, '[^ -~]', '', 'g')),"
    " '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


@q(
    "q_text_normalize",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5({_NORM_SQL.format(c='text')})) AS n_distinct_norm,
           CAST(COUNT(*) - COUNT(DISTINCT md5({_NORM_SQL.format(c='text')}))
                AS DOUBLE) / COUNT(*) AS norm_dup_rate
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    desc="deterministic text normalization (ASCII projection + lower "
         "+ alnum + whitespace collapse) and the per-language "
         "normalized-duplicate rate — the canonicalization step ahead "
         "of exact dedup. Scale: one hash-shuffle on lang with "
         "map-side partial distinct; normalization is pure "
         "whole-stage-codegen string expressions.",
    tags=["text", "dedup"],
)
def q_text_normalize(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents")
    n = d.select("lang", F.md5(_NORM_SPARK(col("text"))).alias("norm"))
    return (
        n.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("norm").alias("n_distinct_norm"),
        )
        .select(
            "lang", "n_docs", "n_distinct_norm",
            ((col("n_docs") - col("n_distinct_norm")).cast("double")
             / col("n_docs")).alias("norm_dup_rate"),
        )
        .orderBy("lang")
    )


_TOK_SQL = (
    "SELECT doc_id, source, unnest(list_filter(string_split_regex("
    "lower(regexp_replace(text, '[^ -~]', '', 'g')), '[^a-z0-9]+'),"
    " t -> t <> '')) AS token FROM documents"
)


@q(
    "q_vocab_coverage",
    oracle=f"""
    WITH tok AS ({_TOK_SQL}),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS c FROM tok GROUP BY token
        ORDER BY c DESC, token LIMIT 500)
    )
    SELECT t.source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (token)
    GROUP BY t.source
    ORDER BY t.source
    """,
    desc="tokenizer vocabulary coverage: corpus top-500 vocabulary "
         "(count desc, token asc), then per-source out-of-vocabulary "
         "token rate — the coverage check before committing to a "
         "vocab. Scale: vocab is TakeOrdered over the token aggregate "
         "(no global window) and broadcast to the coverage join; "
         "token explosion partial-aggregates map-side.",
    tags=["text"],
)
def q_vocab_coverage(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(
            F.lower(F.regexp_replace(col("text"), "[^ -~]", "")),
            "[^a-z0-9]+")).alias("token"),
    ).filter(col("token") != "")
    vocab = (
        tok.groupBy("token").agg(F.count("*").alias("c"))
        .orderBy(col("c").desc(), col("token"))
        .limit(500)
        .select("token", lit(1).alias("_inv"))
    )
    return (
        tok.join(broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(col("_inv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "source", "n_tokens", "n_oov",
            (col("n_oov").cast("double") / col("n_tokens")).alias("oov_rate"),
        )
        .orderBy("source")
    )


@q(
    "q_asof_tolerance",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         clicks    AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE
                THEN CAST(floor(epoch(c.ts)) AS BIGINT) END AS click_epoch,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE
                THEN CAST(c.value AS DOUBLE) END AS click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    desc="as-of join with a 30-minute tolerance: each purchase gains "
         "the user's most recent preceding click ONLY if it happened "
         "within the window — stale matches null out (pandas "
         "merge_asof tolerance semantics). Same single-shuffle "
         "union + carry-forward plan as q_asof_join.",
    tags=["join", "asof"],
)
def q_asof_tolerance(spark, sf_dir):
    from ..operators.asof import asof_join

    e = tables.load(spark, sf_dir, "events")
    purchases = e.filter(col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    clicks = e.filter(col("event_type") == "click").select(
        "user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id",
        tolerance_expr="{r} >= {l} - INTERVAL 30 MINUTE")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("right_ts").alias("click_epoch"),
        col("right_value").cast("double").alias("click_value"),
    )


@q(
    "q_lsh_bucket_stats",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id,
             {_duck_bucket_expr('CAST(embedding AS DOUBLE[])')} AS bucket
      FROM embeddings
    ),
    sizes AS (SELECT bucket, COUNT(*) AS sz FROM sig GROUP BY bucket)
    SELECT sz AS bucket_size, COUNT(*) AS n_buckets
    FROM sizes GROUP BY sz ORDER BY sz
    """,
    desc="SRP-LSH bucket occupancy histogram (8 planes -> <=256 "
         "buckets): the tuning observable for the LSH ANN family — a "
         "heavy bucket means too few planes, many singletons mean too "
         "many. Scale: two partial-combining aggregates over the "
         "signature column; document/vector bodies never shuffle.",
    tags=["similarity", "lsh"],
)
def q_lsh_bucket_stats(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    sig = S.lsh_signatures(emb, dim=64, n_planes=8)
    sizes = sig.groupBy("_bucket").agg(F.count("*").alias("sz"))
    return (
        sizes.groupBy(col("sz").alias("bucket_size"))
        .agg(F.count("*").alias("n_buckets"))
        .orderBy("bucket_size")
    )


@q(
    "q_doc_outliers_zscore",
    oracle="""
    WITH s AS (
      SELECT lang, COUNT(*) AS n,
             SUM(n_chars) AS sm, SUM(n_chars * n_chars) AS ss
      FROM documents GROUP BY lang
    )
    SELECT d.lang, ANY_VALUE(s.n) AS n_docs,
           CAST(SUM(CASE WHEN s.n >= 2 AND
                 CAST((s.n * d.n_chars - s.sm) AS HUGEINT)
                   * (s.n * d.n_chars - s.sm) * (s.n - 1)
                 > 4 * CAST(s.n AS HUGEINT)
                     * (CAST(s.n AS HUGEINT) * s.ss
                        - CAST(s.sm AS HUGEINT) * s.sm)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM documents d JOIN s USING (lang)
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    desc="per-language |z|>2 length outliers in EXACT integer "
         "arithmetic: the sample-variance compare is multiplied out "
         "to (n*x - S)^2 * (n-1) > 4n(n*SS - S^2) in "
         "HUGEINT/DECIMAL(38,0) — no float sqrt, no ulp drift, "
         "engine-identical at every boundary. Scale: one per-lang "
         "aggregate broadcast back over the scan.",
    tags=["text", "stats"],
)
def q_doc_outliers_zscore(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents")
    s = d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("sm"),
        F.sum(col("n_chars") * col("n_chars")).alias("ss"),
    )
    j = d.select("lang", "n_chars").join(broadcast(s), "lang")
    # widen to DECIMAL(38,0) BEFORE every multiply that can exceed
    # int64 (a ~ n * n_chars can reach 1e10 at 1M docs, a^2 ~ 1e20;
    # n*ss and sm^2 brush 2^63 too) — the oracle widens to HUGEINT at
    # the same points, so values stay identical and neither engine
    # hits an ANSI overflow at corpus scale
    dec = "decimal(38,0)"
    a = (col("n") * col("n_chars") - col("sm")).cast(dec)
    lhs = a * a * (col("n") - 1)
    rhs = ((col("n").cast(dec) * col("ss")
            - col("sm").cast(dec) * col("sm"))
           * (lit(4) * col("n")))
    return (
        j.groupBy("lang")
        .agg(
            F.first("n").alias("n_docs"),
            F.sum(F.when((col("n") >= 2) & (lhs > rhs), 1).otherwise(0))
            .alias("n_outliers"),
        )
        .orderBy("lang")
    )


@q(
    "q_dedup_budget_allocation",
    oracle="""
    WITH s AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    t AS (SELECT SUM(n) AS tot FROM s),
    b AS (
      SELECT source, n,
             (1000 * n) // tot AS base,
             (1000 * n) % tot AS rem
      FROM s, t
    ),
    l AS (SELECT 1000 - SUM(base) AS leftover FROM b),
    r AS (
      SELECT source, n, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rn
      FROM b
    )
    SELECT source, n AS n_docs,
           CAST(base + CASE WHEN rn <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r, l
    ORDER BY source
    """,
    desc="largest-remainder (Hamilton) allocation of a 1000-doc "
         "sampling budget across sources, proportional to corpus "
         "share — the deterministic planning step before downsampling "
         "a mixed corpus. Exact integer DIV/MOD on positives; the "
         "final ranking windows over the per-source aggregate "
         "(|sources| rows at ANY corpus scale — the tagged "
         "tiny-global-window exemption).",
    tags=["pipeline", "sampling", "tiny-global-window"],
)
def q_dedup_budget_allocation(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n"))
    # totals/leftover via whole-frame windows over the per-source
    # aggregate (joining on a literal key folds to an unkeyed
    # BroadcastNestedLoopJoin — windows keep the plan join-free)
    whole = Window.partitionBy()
    b = (
        s.withColumn("tot", F.sum("n").over(whole))
        .withColumn("base", F.expr("(1000 * n) DIV tot"))
        .withColumn("rem", F.expr("(1000 * n) % tot"))
    )
    r = (
        b.withColumn("leftover", lit(1000) - F.sum("base").over(whole))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(col("rem").desc(), col("source"))),
        )
    )
    return (
        r.select(
            "source",
            col("n").alias("n_docs"),
            (col("base")
             + F.when(col("rn") <= col("leftover"), 1).otherwise(0))
            .cast("long").alias("alloc"),
        )
        .orderBy("source")
    )
