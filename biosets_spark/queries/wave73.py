"""Seventy-third-wave query inventory: k-sample agreement — COCHRAN'S
Q (do THREE binary English-detectors share one error rate on the
same documents? The k-classifier generalization of q_mcnemar_paired;
with k = 2 it reduces exactly to McNemar without continuity
correction) and the FRIEDMAN TEST (are the five event types ranked
consistently by daily mean value across days? The nonparametric
repeated-measures ANOVA: each day is a block ranking the same five
'treatments', so day-level shocks cancel where q_anova_oneway's
independence assumption breaks).

Determinism discipline: detector hits and per-block counts are
exact integers; within-day ranks are exact midranks over 5 values
(ties on identical 6-dec doubles resolve identically); Q and
chi2_F are single closed-form doubles over exact integer /
decimal-quantized sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_cochran_q",
    oracle="""
    WITH scored AS (
      SELECT (lang = 'en') AS truth,
             (length(regexp_replace(text,
                '\\b(the|a|of|and|to|in|is|it|that|for)\\b', '', 'g'))
              < length(text)) AS pa,
             (CAST(length(regexp_replace(text, '[^ -~]', '', 'g')) AS DOUBLE)
              / GREATEST(length(text), 1) > 0.95) AS pb,
             (CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                   AS DOUBLE)
              / GREATEST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')),
                         1) BETWEEN 0.35 AND 0.45) AS pc
      FROM documents
    ), marks AS (
      SELECT CAST(pa = truth AS INTEGER) AS x1,
             CAST(pb = truth AS INTEGER) AS x2,
             CAST(pc = truth AS INTEGER) AS x3
      FROM scored
    ), agg AS (
      SELECT COUNT(*) AS n,
             SUM(x1) AS g1, SUM(x2) AS g2, SUM(x3) AS g3,
             SUM(x1 + x2 + x3) AS sl,
             SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS sl2
      FROM marks
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(g1 AS BIGINT) AS correct_stopword,
           CAST(g2 AS BIGINT) AS correct_ascii,
           CAST(g3 AS BIGINT) AS correct_vowel,
           (3 * 2
                 * (POWER(g1 - CAST(sl AS DOUBLE) / 3, 2)
                    + POWER(g2 - CAST(sl AS DOUBLE) / 3, 2)
                    + POWER(g3 - CAST(sl AS DOUBLE) / 3, 2))
                 / NULLIF(3 * sl - sl2, 0)) AS cochran_q
    FROM agg
    """,
    desc="Cochran's Q for three binary English detectors scored on "
         "the SAME documents (stopword hit, ascii ratio > 0.95, "
         "vowel-rate band): Q = k(k-1) sum_j (G_j - mean G)^2 / "
         "(k*sum L_i - sum L_i^2) over per-doc correct counts L_i — "
         "the k-classifier generalization of q_mcnemar_paired (k=2 "
         "reduces to McNemar without continuity correction), "
         "chi-square with k-1 = 2 dof under equal error rates. All "
         "three predictors are pure JVM regex/length expressions; "
         "ONE combinable aggregate produces every term; Q is one "
         "closed form over exact integers.",
    tags=["text", "stats", "agg"],
)
def q_cochran_q(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("lang", "text")
    stop_re = r"\b(the|a|of|and|to|in|is|it|that|for)\b"
    pa = F.length(F.regexp_replace(col("text"), stop_re, "")) < F.length("text")
    n_ascii = F.length(F.regexp_replace(col("text"), r"[^ -~]", ""))
    pb = n_ascii.cast("double") / F.greatest(F.length("text"), lit(1)) > 0.95
    lower = F.lower(col("text"))
    vowels = F.length(F.regexp_replace(lower, r"[^aeiou]", ""))
    letters = F.length(F.regexp_replace(lower, r"[^a-z]", ""))
    vr = vowels.cast("double") / F.greatest(letters, lit(1))
    pc = (vr >= 0.35) & (vr <= 0.45)
    truth = col("lang") == "en"
    marks = docs.select(
        (pa == truth).cast("int").alias("x1"),
        (pb == truth).cast("int").alias("x2"),
        (pc == truth).cast("int").alias("x3"),
    )
    l_i = col("x1") + col("x2") + col("x3")
    agg = marks.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("g1"),
        F.sum("x2").alias("g2"),
        F.sum("x3").alias("g3"),
        F.sum(l_i).alias("sl"),
        F.sum(l_i * l_i).alias("sl2"),
    )
    mg = col("sl").cast("double") / 3
    q_stat = (
        3 * 2
        * (
            F.pow(col("g1") - mg, 2)
            + F.pow(col("g2") - mg, 2)
            + F.pow(col("g3") - mg, 2)
        )
        / F.nullif((3 * col("sl") - col("sl2")).cast("double"), lit(0.0))
    )
    return agg.select(
        col("n").cast("long").alias("n_docs"),
        col("g1").cast("long").alias("correct_stopword"),
        col("g2").cast("long").alias("correct_ascii"),
        col("g3").cast("long").alias("correct_vowel"),
        (q_stat).alias("cochran_q"),
    )


@q(
    "q_friedman_test",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                        AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS m
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), ranked AS (
      SELECT event_type, day,
             RANK() OVER (PARTITION BY day ORDER BY m) AS r_lo,
             COUNT(*) OVER (PARTITION BY day, m) AS ties
      FROM daily
    ), mid AS (
      SELECT event_type, day,
             r_lo + (ties - 1) / 2.0 AS r
      FROM ranked
    ), sums AS (
      SELECT event_type, COUNT(*) AS n_days,
             CAST(SUM(CAST(r * 2 AS BIGINT)) AS DOUBLE) / 2 AS rsum
      FROM mid GROUP BY event_type
    ), tot AS (
      SELECT COUNT(*) AS k, MAX(n_days) AS n FROM sums
    )
    SELECT s.event_type,
           CAST(s.n_days AS BIGINT) AS n_days,
           (s.rsum / s.n_days) AS mean_rank,
           ((SELECT 12.0 / (t2.n * t2.k * (t2.k + 1))
                         * SUM(POWER(s2.rsum, 2)) - 3.0 * t2.n * (t2.k + 1)
                  FROM sums s2, tot t2 GROUP BY t2.n, t2.k))
             AS friedman_chi2
    FROM sums s ORDER BY s.event_type
    """,
    desc="Friedman test: within each DAY (the block), the five event "
         "types are midranked by daily mean value; chi2_F = "
         "12/(n k (k+1)) sum_j R_j^2 - 3 n (k+1) tests whether the "
         "type ranking is consistent across days — the nonparametric "
         "repeated-measures ANOVA where day-level shocks cancel "
         "inside each block (q_anova_oneway treats days as "
         "independent and confounds block effects with treatment "
         "effects). Per-day ranks are exact midranks over 5 "
         "identical 6-dec doubles (RANK + tie count, doubled to "
         "stay integer); rank sums accumulate exactly; chi2 is one "
         "closed form; each type's mean rank is also reported. "
         "Windows partition by DAY (5 rows each), never the series.",
    tags=["events", "stats", "window", "agg", "cross"],
)
def q_friedman_test(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    w_rank = Window.partitionBy("day").orderBy("m")
    w_tie = Window.partitionBy("day", "m")
    mid = daily.select(
        "event_type", "day",
        (
            F.rank().over(w_rank)
            + (F.count("*").over(w_tie) - 1) / 2.0
        ).alias("r"),
    )
    sums = mid.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (F.sum((col("r") * 2).cast("long")).cast("double") / 2).alias("rsum"),
    )
    tot = sums.agg(
        F.count("*").alias("k"), F.max("n_days").alias("n"),
        F.sum(F.pow(col("rsum"), 2)).alias("sr2"),
    )
    j = sums.crossJoin(broadcast(tot))
    chi2 = (
        12.0 / (col("n") * col("k") * (col("k") + 1)) * col("sr2")
        - 3.0 * col("n") * (col("k") + 1)
    )
    return j.select(
        "event_type",
        col("n_days").cast("long").alias("n_days"),
        (col("rsum") / col("n_days")).alias("mean_rank"),
        (chi2).alias("friedman_chi2"),
    ).orderBy("event_type")
