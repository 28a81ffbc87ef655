"""Forty-fifth-wave query inventory: language-model evaluation and
feature-engineering audits — HELD-OUT perplexity of an add-one bigram
LM (train on a hash-split 80%, score the unseen 20%: the
generalization number, where q_bigram_surprise self-scores the
training corpus) and the FEATURE-HASHING collision audit (what the
hashing trick at dimension D actually costs in collided tokens and
mass — the check run before fixing a feature dimension).

Determinism discipline: the train/test split and the feature buckets
both use the engine-portable md5-derived hash; per-bigram surprises
quantize to DECIMAL(18,8) before the order-free corpus sum; the
perplexity exponential is one closed-form double, emitted raw.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL
_GATE = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5"
_DIM = 16


@q(
    "q_heldout_perplexity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_GATE} AS fold, {_TOKS_SQL} AS t FROM documents
    ), bg AS (
      SELECT doc_id, fold,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM toks
    ), posts AS (
      SELECT doc_id, fold, bg, string_split(bg, ' ')[1] AS w1 FROM bg
    ), bgc AS (
      SELECT bg, COUNT(*) AS cbg FROM posts WHERE fold <> 0 GROUP BY bg
    ), ctx AS (
      SELECT w1, COUNT(*) AS cw1 FROM posts WHERE fold <> 0 GROUP BY w1
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT unnest(t) AS tok FROM toks WHERE fold <> 0)
    ), scored AS (
      SELECT p.doc_id,
             CAST(FLOOR((-LN((COALESCE(b.cbg, 0) + 1)
                            / (COALESCE(c.cw1, 0) + (SELECT v FROM vocab)))) * 1e8 + 0.5) / 1e8 AS DECIMAL(18,8)) AS s,
             CASE WHEN b.cbg IS NULL THEN 1 ELSE 0 END AS oov
      FROM posts p
      LEFT JOIN bgc b USING (bg) LEFT JOIN ctx c USING (w1)
      WHERE p.fold = 0
    )
    SELECT CAST((SELECT COUNT(*) FROM toks WHERE fold <> 0) AS BIGINT)
             AS n_train_docs,
           CAST((SELECT COUNT(*) FROM toks WHERE fold = 0) AS BIGINT)
             AS n_test_docs,
           CAST(COUNT(*) AS BIGINT) AS n_test_bigrams,
           (CAST(SUM(oov) AS DOUBLE) / COUNT(*)) AS oov_rate,
           (EXP(CAST(SUM(s) AS DOUBLE) / COUNT(*))) AS perplexity
    FROM scored
    """,
    desc="Held-out perplexity of an add-one-smoothed bigram LM: train "
         "on the hash-split 80% of documents, score the unseen 20% — "
         "the GENERALIZATION number (q_bigram_surprise self-scores "
         "its own training corpus; held-out is what corpus-quality "
         "dashboards track across refreshes, rising perplexity = "
         "distribution drift). The split is the engine-portable md5 "
         "gate, so both engines train on the identical fold. Unseen "
         "test bigrams fall back to the add-one floor (cbg=0, cw1=0) "
         "and are counted as the OOV rate. Per-bigram surprises "
         "quantize DECIMAL(18,8) before the corpus sum; train counts "
         "join test postings as (bigram, count) pairs — shuffle "
         "scales with distinct bigrams, not documents. 1-row vocab "
         "normalizer broadcast (tagged cross).",
    tags=["text", "join", "agg", "cross"],
)
def q_heldout_perplexity(spark, sf_dir):
    from ..operators.dedup import portable_hash60
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.pmod(portable_hash60(col("doc_id").cast("string")), lit(5))
        .alias("fold"),
        tokens(col("text")).alias("t"),
    )
    bg = toks.select(
        "doc_id", "fold",
        F.explode(
            F.zip_with(
                F.slice(col("t"), 1, F.greatest(F.size("t") - 1, lit(0))),
                F.slice(col("t"), 2, F.greatest(F.size("t") - 1, lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    posts = bg.select(
        "doc_id", "fold", "bg", F.split(col("bg"), " ")[0].alias("w1")
    )
    train = posts.filter(col("fold") != 0)
    bgc = train.groupBy("bg").agg(F.count("*").alias("cbg"))
    ctx = train.groupBy("w1").agg(F.count("*").alias("cw1"))
    vocab = (
        toks.filter(col("fold") != 0)
        .select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("v"))
    )
    counts = toks.agg(
        F.count(F.when(col("fold") != 0, 1)).alias("n_train_docs"),
        F.count(F.when(col("fold") == 0, 1)).alias("n_test_docs"),
    )
    scored = (
        posts.filter(col("fold") == 0)
        .join(bgc, "bg", "left")
        .join(ctx, "w1", "left")
        .crossJoin(broadcast(vocab))
        .select(
            (dfloor((-F.log(
                    (F.coalesce(col("cbg"), lit(0)) + 1)
                    / (F.coalesce(col("cw1"), lit(0)) + col("v"))
                )) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(18,8)").alias("s"),
            F.when(col("cbg").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    return (
        scored.agg(
            F.count("*").alias("n_test_bigrams"),
            (F.sum("oov").cast("double") / F.count("*"))
            .alias("oov_rate"),
            (F.exp(F.sum("s").cast("double") / F.count("*")))
            .alias("perplexity"),
        )
        .crossJoin(broadcast(counts))
        .select(
            col("n_train_docs").cast("long").alias("n_train_docs"),
            col("n_test_docs").cast("long").alias("n_test_docs"),
            col("n_test_bigrams").cast("long").alias("n_test_bigrams"),
            "oov_rate", "perplexity",
        )
    )


@q(
    "q_feature_hash_collisions",
    oracle=f"""
    WITH vocab AS (
      SELECT tok, COUNT(*) AS occ
      FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
      GROUP BY tok
    ), bucketed AS (
      SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % {_DIM} AS bucket,
             COUNT(*) AS n_types, SUM(occ) AS mass
      FROM vocab GROUP BY 1
    ), tot AS (
      SELECT SUM(n_types) AS v, SUM(mass) AS m,
             COALESCE(SUM(mass) FILTER (WHERE n_types > 1), 0) AS coll_mass
      FROM bucketed
    )
    SELECT CAST(n_types AS BIGINT) AS types_in_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(t.v) AS BIGINT) AS vocab_size,
           (CAST(MAX(t.coll_mass) AS DOUBLE) / MAX(t.m))
             AS collided_mass_share
    FROM bucketed b, tot t
    GROUP BY n_types ORDER BY n_types LIMIT 20
    """,
    desc=f"Feature-hashing (hashing-trick) collision audit at "
         f"dimension {_DIM}: bucket occupancy histogram (how many "
         "buckets hold 1, 2, ... distinct tokens) plus the share of "
         "token MASS sitting in collided buckets — the number that "
         "says whether hashed features at this dimension are "
         "near-lossless or silently merges frequent tokens (D=16 here, "
         "~half the corpus vocabulary, so the audit exercises real "
         "collisions; production would sweep D) "
         "(types colliding is inevitable by birthday math; mass "
         "colliding is what hurts a model). The bucket is the "
         "engine-portable md5 hash, so the audit reproduces "
         "anywhere. Token counts -> vocabulary (tiny) -> bucket agg "
         "-> counts-of-counts: every stage after the first explode "
         "is combinable and vocabulary-sized. 1-row totals "
         "broadcast (tagged cross).",
    tags=["text", "agg", "cross"],
)
def q_feature_hash_collisions(spark, sf_dir):
    from ..operators.dedup import portable_hash60
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("text")
    vocab = (
        docs.select(F.explode(tokens(col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("occ"))
    )
    bucketed = (
        vocab.select(
            F.pmod(portable_hash60(col("tok")), lit(_DIM)).alias("bucket"),
            "occ",
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_types"), F.sum("occ").alias("mass"))
    )
    tot = bucketed.agg(
        F.sum("n_types").alias("v"), F.sum("mass").alias("m"),
        F.coalesce(
            F.sum(F.when(col("n_types") > 1, col("mass"))), lit(0)
        ).alias("coll_mass"),
    )
    return (
        bucketed.groupBy("n_types")
        .agg(F.count("*").alias("n_buckets"))
        .crossJoin(broadcast(tot))
        .select(
            col("n_types").cast("long").alias("types_in_bucket"),
            col("n_buckets").cast("long").alias("n_buckets"),
            col("v").cast("long").alias("vocab_size"),
            (col("coll_mass").cast("double") / col("m"))
            .alias("collided_mass_share"),
        )
        .orderBy("types_in_bucket")
        .limit(20)
    )
