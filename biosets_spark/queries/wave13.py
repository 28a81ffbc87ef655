"""Thirteenth-wave query inventory: gaps-and-islands activity streaks
(the classic island SQL shape) and a differential quality audit of the
MinHash sketch itself — estimated vs exact Jaccard over an
engine-portable (md5-derived) permutation family.

Determinism discipline follows queries.py; the minhash audit uses
``portable_hash60`` (md5 -> 60-bit int) so DuckDB reconstructs the
identical signatures, making a SKETCH differentially verifiable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS streak_len
      FROM grp GROUP BY user_id, island
    )
    SELECT CAST(streak_len AS BIGINT) AS streak_len,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY streak_len
    """,
    desc="gaps-and-islands: consecutive-day activity streaks per user "
         "(date minus per-user row_number is constant within an "
         "island). The window partitions by the high-cardinality user "
         "key; distinct-day dedup happens before the window so the "
         "row_number is over at most 365*years rows per user.",
    tags=["window", "events", "agg"],
)
def q_activity_streaks(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    days = ev.select("user_id", col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island", F.date_sub(col("d"), F.row_number().over(w)))
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_len"))
    return streaks.groupBy("streak_len").agg(F.count("*").alias("n_streaks"))


def _mix60_sql(expr: str, salt: int) -> str:
    """DuckDB twin of operators/dedup.py:portable_mix60 — derive the
    salt-th permutation hash from one 60-bit base hash with the
    identical xor/shift steps (all intermediates non-negative and
    < 2^60, so shift semantics agree between engines)."""
    from ..operators.dedup import mix60_salt

    x1 = f"xor({expr}, {mix60_salt(salt)})"
    x2 = f"xor({x1}, ({x1} >> 29))"
    x3 = f"xor({x2}, (({x2} & {(1 << 39) - 1}) << 21))"
    return f"xor({x3}, ({x3} >> 17))"


def _minhash_est_oracle(num_perm: int = 8) -> str:
    # portable minhash, derive-k-from-1: ONE md5-derived 60-bit hash
    # per shingle, then k xor/shift permutation derivations
    # (_mix60_sql) — identical integers in Spark and DuckDB at 1/k-th
    # the string-hashing cost of the former per-permutation md5
    mins = ",\n             ".join(
        f"MIN({_mix60_sql('h0', i)}) AS mh_{i}" for i in range(num_perm)
    )
    agree = " + ".join(
        f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm)
    )
    return f"""
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
    hs AS (
      SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h0 FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM hs GROUP BY doc_id
    ),
    cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
    exact AS (
      SELECT a.doc_id id_a, b.doc_id id_b, COUNT(*) common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT id_a, id_b,
             common * 1.0 / (ca.n + cb.n - common) AS j
      FROM exact
      JOIN cnt ca ON exact.id_a = ca.doc_id
      JOIN cnt cb ON exact.id_b = cb.doc_id
      WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5
    )
    SELECT jac.id_a, jac.id_b,
           FLOOR((jac.j) * 1e4 + 0.5) / 1e4 AS jaccard,
           FLOOR((({agree}) * 1.0 / {num_perm}) * 1e4 + 0.5) / 1e4 AS jaccard_est
    FROM jac
    JOIN sig a ON a.doc_id = jac.id_a
    JOIN sig b ON b.doc_id = jac.id_b
    """


@q(
    "q_minhash_estimate_quality",
    oracle=_minhash_est_oracle(),
    desc="differential audit of the MinHash sketch itself: for every "
         "exact-Jaccard >= 0.5 pair, the 8-permutation signature "
         "agreement fraction (the sketch's Jaccard estimator). ONE "
         "md5-derived 60-bit hash per shingle, then 8 xor/shift "
         "permutation derivations (portable_mix60) that BOTH engines "
         "reconstruct bit-identically — the derive-k-from-1 lever "
         "minhash_signatures uses at production scale, kept portable "
         "(the former per-permutation md5 hashed every shingle k "
         "times). The estimator's error distribution is what an "
         "operator would monitor before trusting a cheaper sketch "
         "config at 100 TB.",
    tags=["dedup", "minhash", "agg"],
)
def q_minhash_estimate_quality(spark, sf_dir):
    from ..operators.dedup import (
        ngram_jaccard_pairs, portable_hash60, portable_mix60, shingle_table,
    )

    num_perm = 8
    docs = tables.load(spark, sf_dir, "documents")
    sh = shingle_table(docs, n=4).withColumn("_h0", portable_hash60(col("_sh")))
    mins = [
        F.min(portable_mix60(col("_h0"), i)).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    sig = sh.groupBy(col("_id").alias("doc_id")).agg(*mins)
    exact = ngram_jaccard_pairs(docs, n=4, threshold=0.5, max_shingle_df=None)
    a = sig.select(col("doc_id").alias("id_a"),
                   *[col(f"mh_{i}").alias(f"a_{i}") for i in range(num_perm)])
    b = sig.select(col("doc_id").alias("id_b"),
                   *[col(f"mh_{i}").alias(f"b_{i}") for i in range(num_perm)])
    agree = sum(
        F.when(col(f"a_{i}") == col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        exact.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            (dfloor((col("jaccard")) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias("jaccard"),
            (dfloor((agree.cast("double") / num_perm) * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias("jaccard_est"),
        )
    )


@q(
    "q_span_dedup_applied",
    # the APPLIED form of q_span_dedup: hot spans (present in >= 2
    # docs) are REMOVED from every document, C4-style; output is the
    # per-document surviving span/token mass
    oracle=f"""
    WITH toks AS (SELECT doc_id, {{toks}} AS t FROM documents),
    sp AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, greatest(CAST(ceil(len(t) / 10.0) AS INT), 1)),
               i -> array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ')))
               AS s
      FROM toks
    ),
    spn AS (SELECT doc_id, s FROM sp WHERE s <> ''),
    hot AS (SELECT s FROM spn GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2),
    kept AS (SELECT * FROM spn WHERE s NOT IN (SELECT s FROM hot))
    SELECT d.doc_id,
           CAST(COALESCE(k.kept_spans, 0) AS BIGINT) AS kept_spans,
           CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN (
      SELECT doc_id, COUNT(*) AS kept_spans,
             SUM(len(list_filter(string_split(s, ' '), x -> x <> '')))
               AS kept_tokens
      FROM kept GROUP BY doc_id
    ) k ON d.doc_id = k.doc_id
    """.format(toks="list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')"),
    desc="C4-style span removal APPLIED: every 10-token span occurring "
         "in >= 2 documents is dropped from all of them; output is the "
         "surviving span/token mass per document (docs reduced to zero "
         "kept spans are full boilerplate). Span postings shuffle as "
         "strings once for the hot-set semi join; counts are integers.",
    tags=["dedup", "text"],
)
def q_span_dedup_applied(spark, sf_dir):
    from ..operators.text import spans

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    sp = docs.select(
        "doc_id", F.explode(spans(col("text"), 10)).alias("s")
    ).filter(col("s") != "")
    hot = (
        sp.groupBy("s").agg(F.count_distinct("doc_id").alias("nd"))
        .filter(col("nd") >= 2).select("s")
    )
    kept = sp.join(hot, "s", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("kept_spans"),
        F.sum(F.size(F.filter(F.split(col("s"), " "), lambda x: x != "")))
        .alias("kept_tokens"),
    )
    return (
        docs.select("doc_id").distinct()
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(col("kept_spans"), lit(0)).cast("long").alias("kept_spans"),
            F.coalesce(col("kept_tokens"), lit(0)).cast("long").alias("kept_tokens"),
        )
    )


@q(
    "q_incremental_dedup",
    oracle="""
    WITH fp AS (
      SELECT source, doc_id,
             md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))
               AS f
      FROM documents
    ),
    corpus AS (SELECT DISTINCT f FROM fp WHERE source < 'src15'),
    incoming AS (SELECT * FROM fp WHERE source >= 'src15')
    SELECT i.source,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(COUNT(CASE WHEN c.f IS NULL THEN 1 END) AS BIGINT) AS n_new
    FROM incoming i LEFT JOIN corpus c ON i.f = c.f
    GROUP BY i.source
    """,
    desc="incremental-ingest dedup: an incoming shard (sources >= "
         "'src15') is anti-matched against the existing corpus's "
         "fingerprint set — the per-refresh shape that keeps a 100 TB "
         "corpus append-only. Only (source, fingerprint) shuffles; at "
         "scale the corpus side is a bucketed fingerprint table and "
         "the join prunes to matching buckets.",
    tags=["dedup", "join", "agg"],
)
def q_incremental_dedup(spark, sf_dir):
    from ..operators.dedup import fingerprint_md5

    docs = tables.load(spark, sf_dir, "documents").select("source", "doc_id", "text")
    fp = docs.select("source", "doc_id", fingerprint_md5(col("text")).alias("f"))
    corpus = fp.filter(col("source") < "src15").select("f").distinct()
    incoming = fp.filter(col("source") >= "src15")
    joined = incoming.join(
        corpus.withColumnRenamed("f", "cf"), incoming.f == col("cf"), "left")
    return joined.groupBy("source").agg(
        F.count("*").alias("n_incoming"),
        F.count(F.when(col("cf").isNull(), 1)).alias("n_new"),
    )


@q(
    "q_ann_recall_audit",
    # composes the q_knn_bruteforce and q_knn_ivf chains and counts the
    # overlap — the recall@10 monitor an ANN deployment runs before
    # trusting a cheaper index config. Both chains are engine-portable
    # (md5-ordered centroid sampling; see q_knn_ivf's oracle notes).
    oracle="""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id <> 0
    ),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '42')) - 1 AS cell,
             emb AS cemb
      FROM base ORDER BY md5(CAST(vec_id AS VARCHAR) || '42') LIMIT 16
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
    assign AS (
      SELECT b.vec_id, b.emb, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY list_cosine_similarity(b.emb, c.cemb) DESC, c.cell DESC
             ) AS rn
      FROM base b CROSS JOIN cents c
    ),
    probe AS (
      SELECT c.cell FROM cents c, qv
      ORDER BY list_cosine_similarity(c.cemb, qv.q) DESC, c.cell
      LIMIT 4
    ),
    ivf AS (
      SELECT a.vec_id
      FROM assign a, qv
      WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM probe)
      ORDER BY list_cosine_similarity(a.emb, qv.q) DESC, a.vec_id
      LIMIT 10
    ),
    exact AS (
      SELECT b.vec_id
      FROM base b, qv
      ORDER BY list_cosine_similarity(b.emb, qv.q) DESC, b.vec_id
      LIMIT 10
    )
    SELECT CAST((SELECT COUNT(*) FROM ivf JOIN exact USING (vec_id)) AS BIGINT)
             AS n_hits,
           CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS k,
           FLOOR(((SELECT COUNT(*) FROM ivf JOIN exact USING (vec_id))
                 / CAST((SELECT COUNT(*) FROM exact) AS DOUBLE)) * 1e4 + 0.5) / 1e4
             AS recall
    """,
    desc="recall@10 audit of the IVF index against exact brute-force "
         "cosine for the probe query: the monitoring number an ANN "
         "deployment tracks before trusting a cheaper (fewer-probe) "
         "config at scale. Both chains are deterministic and "
         "engine-portable, so even the SKETCH'S QUALITY is "
         "differentially verified.",
    tags=["similarity", "ivf", "agg"],
)
def q_ann_recall_audit(spark, sf_dir):
    from ..operators import similarity as S
    from .ext import _query_vec

    qv = _query_vec(spark, sf_dir, 0)
    emb = tables.load(spark, sf_dir, "embeddings").filter(col("vec_id") != 0)
    exact = S.knn_bruteforce(
        tables.load(spark, sf_dir, "embeddings"), qv, k=10, exclude_self=0
    ).select("neighbor_id")
    assigned, cents = S.ivf_build(emb, n_cells=16)
    ivf = S.ivf_knn(assigned, cents, qv, k=10, n_probe=4).select("neighbor_id")
    # k = the ACTUAL exact-top-k size, not the literal 10: on a table
    # smaller than k the recall denominator reflects the true neighbor
    # count in BOTH engines (r5 q_hill_tail ADVICE class). The exact
    # set is collected ONCE (<= k rows) so the brute-force scan runs a
    # single time, hits become a broadcast isin filter, and the empty
    # set yields recall NULL exactly like the oracle's NULL division
    # (r6 review).
    exact_ids = [r["neighbor_id"] for r in exact.collect()]
    k_actual = len(exact_ids)
    if k_actual:
        hits = ivf.filter(col("neighbor_id").isin(exact_ids)).count()
        recall = round(hits / float(k_actual), 4)
    else:
        hits, recall = 0, None
    spark_df = spark.createDataFrame(
        [(hits, k_actual, recall)], "n_hits long, k long, recall double")
    return spark_df
