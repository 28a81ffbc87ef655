"""Seventy-sixth-wave query inventory: experiment sizing and corpus
drift — the MINIMUM-DETECTABLE-EFFECT planner (given each status
group's CURRENT volume split into two arms, the smallest relative
lift an A/B test could detect at 80% power — the inverse of
q_power_analysis: that query asks 'how many samples for this lift',
this one asks 'what lift could these samples see', which is the
number that kills doomed experiments before launch) and VOCABULARY
TURNOVER (early-half vs late-half corpus vocabularies per language:
retained / new / retired type counts and the turnover rate — the
lexical-drift monitor that says whether a deployed tokenizer or
language model is aging; q_heaps_law grows one curve, this
difference two snapshots).

Determinism discipline: counts are exact integers; z quantiles are
the shared literals (1.959964, 0.841621); MDE is one closed-form
double per group; the corpus split point is the exact integer
midpoint of the doc_id range; all rates are exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import q

_Z_ALPHA = 1.959964
_Z_BETA = 0.841621


@q(
    "q_mde_planner",
    oracle=f"""
    WITH base AS (
      SELECT o_orderstatus AS st, COUNT(*) AS n,
             COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS k
      FROM orders GROUP BY 1
    )
    SELECT st AS o_orderstatus,
           CAST(n AS BIGINT) AS n_current,
           CAST(FLOOR(n / 2.0) AS BIGINT) AS n_per_arm,
           (CAST(k AS DOUBLE) / n) AS base_rate,
           (({_Z_ALPHA} + {_Z_BETA})
                 * SQRT(2 * (CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n)
                        / CAST(FLOOR(n / 2.0) AS BIGINT))) AS mde_absolute,
           (({_Z_ALPHA} + {_Z_BETA})
                 * SQRT(2 * (CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n)
                        / CAST(FLOOR(n / 2.0) AS BIGINT))
                 / (CAST(k AS DOUBLE) / n)) AS mde_relative
    FROM base ORDER BY st
    """,
    desc="Minimum-detectable-effect planner: for each status group's "
         "urgent-order base rate, the smallest absolute and relative "
         "lift a two-arm test over the group's CURRENT volume could "
         "detect at alpha = 0.05 / 80% power — MDE = (z_a + z_b) * "
         "sqrt(2 p (1-p) / n_arm), the inverse of q_power_analysis "
         "(that sizes n for a target lift; this bounds the lift the "
         "available n can see — a 40%% relative MDE on a planned 5%% "
         "experiment means don't launch). Rates are exact integer "
         "ratios, z quantiles shared literals, n_per_arm an exact "
         "integer floor; one combinable count agg and one closed "
         "form per group.",
    tags=["stats", "agg"],
)
def q_mde_planner(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    base = orders.groupBy(col("o_orderstatus").alias("st")).agg(
        F.count("*").alias("n"),
        F.count(F.when(col("o_orderpriority") == "1-URGENT", 1)).alias("k"),
    )
    p = col("k").cast("double") / col("n")
    n_arm = F.floor(col("n") / 2).cast("long")
    # try_divide twice: a 1-row group has n_per_arm = 0 (no feasible
    # test -> NULL MDE), and a 0% base rate has no relative lift;
    # the oracle's x/0 = NULL matches both
    mde_abs = (_Z_ALPHA + _Z_BETA) * F.sqrt(
        F.try_divide(2 * p * (1 - p), n_arm)
    )
    return base.select(
        col("st").alias("o_orderstatus"),
        col("n").cast("long").alias("n_current"),
        n_arm.alias("n_per_arm"),
        (p).alias("base_rate"),
        (mde_abs).alias("mde_absolute"),
        (F.try_divide(mde_abs, p)).alias("mde_relative"),
    ).orderBy("o_orderstatus")


from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_vocab_turnover",
    oracle=f"""
    WITH split AS (
      SELECT CAST(FLOOR(MAX(doc_id) / 2.0) AS BIGINT) AS mid FROM documents
    ), vocab AS (
      SELECT DISTINCT d.lang, (d.doc_id <= s.mid) AS early,
             unnest({_TOKS_SQL.replace('text', 'd.text')}) AS tok
      FROM documents d, split s
    ), early AS (
      SELECT lang, tok FROM vocab WHERE early
    ), late AS (
      SELECT lang, tok FROM vocab WHERE NOT early
    ), counts AS (
      SELECT COALESCE(e.lang, l.lang) AS lang,
             COUNT(*) FILTER (WHERE e.tok IS NOT NULL) AS v_early,
             COUNT(*) FILTER (WHERE l.tok IS NOT NULL) AS v_late,
             COUNT(*) FILTER (WHERE e.tok IS NOT NULL
                              AND l.tok IS NOT NULL) AS retained
      FROM early e FULL OUTER JOIN late l
        ON e.lang = l.lang AND e.tok = l.tok
      GROUP BY 1
    )
    SELECT lang,
           CAST(v_early AS BIGINT) AS vocab_early,
           CAST(v_late AS BIGINT) AS vocab_late,
           CAST(retained AS BIGINT) AS retained,
           CAST(v_late - retained AS BIGINT) AS new_types,
           CAST(v_early - retained AS BIGINT) AS retired_types,
           (CAST(v_late - retained AS DOUBLE) / v_late)
             AS turnover_rate
    FROM counts ORDER BY lang
    """,
    desc="Vocabulary turnover per language between the early and late "
         "corpus halves (split at the exact doc_id midpoint): type "
         "counts for each half, the retained intersection, new and "
         "retired types, and turnover = new/|late| — the lexical-"
         "drift monitor that decides when a deployed tokenizer or "
         "unigram LM has aged out (q_heaps_law fits one growth "
         "curve; this differences two snapshots, which also catches "
         "REPLACEMENT that total-vocab growth hides). The corpus "
         "collapses to distinct (lang, half, token) rows; the "
         "half-to-half comparison is one full outer join on (lang, "
         "token) — per-token fan-out exactly 1; every count exact.",
    tags=["text", "dedup", "join", "agg", "cross"],
)
def q_vocab_turnover(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents")
    # explicit FLOOR: a bare cast-to-long TRUNCATES 249.5 in Spark but
    # DuckDB's double->BIGINT cast ROUNDS it — a latent off-by-one in
    # the split point the current data happened to mask
    mid = docs.agg(F.floor(F.max("doc_id") / 2).cast("long").alias("mid"))
    vocab = (
        docs.crossJoin(broadcast(mid))
        .select(
            "lang",
            (col("doc_id") <= col("mid")).alias("early"),
            F.explode(tokens(col("text"))).alias("tok"),
        )
        .distinct()
    )
    early = vocab.filter(col("early")).select(
        col("lang").alias("el"), col("tok").alias("et")
    )
    late = vocab.filter(~col("early")).select(
        col("lang").alias("ll"), col("tok").alias("lt")
    )
    joined = early.join(
        late, (col("el") == col("ll")) & (col("et") == col("lt")), "full_outer"
    )
    counts = joined.groupBy(
        F.coalesce(col("el"), col("ll")).alias("lang")
    ).agg(
        F.count(F.when(col("et").isNotNull(), 1)).alias("v_early"),
        F.count(F.when(col("lt").isNotNull(), 1)).alias("v_late"),
        F.count(F.when(col("et").isNotNull() & col("lt").isNotNull(), 1))
        .alias("retained"),
    )
    return counts.select(
        "lang",
        col("v_early").cast("long").alias("vocab_early"),
        col("v_late").cast("long").alias("vocab_late"),
        col("retained").cast("long").alias("retained"),
        (col("v_late") - col("retained")).cast("long").alias("new_types"),
        (col("v_early") - col("retained")).cast("long").alias("retired_types"),
        ((col("v_late") - col("retained")).cast("double") / col("v_late")).alias("turnover_rate"),
    ).orderBy("lang")
