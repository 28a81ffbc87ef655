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

from . import tables
from .queries import q


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


def _minhash_est_oracle(num_perm: int = 8) -> str:
    # portable minhash: per permutation i, min over shingles of the
    # 60-bit md5-derived hash of (i || ':' || shingle) — identical
    # integers in Spark and DuckDB
    mins = ",\n             ".join(
        f"MIN(('0x' || substr(md5(concat('{i}', ':', s)), 1, 15))::BIGINT) "
        f"AS mh_{i}"
        for i in range(num_perm)
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
    sig AS (
      SELECT doc_id,
             {mins}
      FROM sh GROUP BY doc_id
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
           ROUND(jac.j, 4) AS jaccard,
           ROUND(({agree}) * 1.0 / {num_perm}, 4) AS jaccard_est
    FROM jac
    JOIN sig a ON a.doc_id = jac.id_a
    JOIN sig b ON b.doc_id = jac.id_b
    """


@q(
    "q_minhash_estimate_quality",
    oracle=_minhash_est_oracle(),
    desc="differential audit of the MinHash sketch itself: for every "
         "exact-Jaccard >= 0.5 pair, the 8-permutation signature "
         "agreement fraction (the sketch's Jaccard estimator) computed "
         "from md5-derived 60-bit hashes that BOTH engines "
         "reconstruct bit-identically — the estimator's error "
         "distribution is what an operator would monitor before "
         "trusting a cheaper sketch config at 100 TB (production runs "
         "use xxhash64; md5 here makes the sketch oracle-checkable).",
    tags=["dedup", "minhash", "agg"],
)
def q_minhash_estimate_quality(spark, sf_dir):
    from .operators.dedup import ngram_jaccard_pairs, portable_hash60, shingle_table

    num_perm = 8
    docs = tables.load(spark, sf_dir, "documents")
    sh = shingle_table(docs, n=4)
    mins = [
        F.min(portable_hash60(F.concat(lit(str(i)), lit(":"), col("_sh"))))
        .alias(f"mh_{i}")
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
            F.round("jaccard", 4).alias("jaccard"),
            F.round(agree.cast("double") / num_perm, 4).alias("jaccard_est"),
        )
    )
