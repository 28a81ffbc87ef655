"""Eighty-fourth-wave query inventory: agreement and reliability —
FLEISS' KAPPA among three English detectors (chance-corrected
INTER-RATER agreement with no ground truth in sight: q_cohens_kappa
scores ONE rater against truth, q_cochran_q tests equal error
rates; Fleiss asks whether the raters even see the same documents
the same way — the number that says whether ensembling them could
help) and the INTRACLASS CORRELATION ICC(1) of daily means nested
in weeks (the one-way random-effects reliability coefficient: what
fraction of day-to-day variance is WEEK-level structure — ICC near
0 justifies treating days as independent replicates, which
q_anova_oneway and every per-day test here quietly assume).

Determinism discipline: per-document rating counts are exact
integers and every Fleiss term an exact integer ratio quantized
ROUND->DECIMAL before cross-document sums; daily means are exact
integer cents; week groups use exact epoch-day FLOOR arithmetic;
ANOVA components use the centered-quantized discipline; kappa and
ICC are single closing closed forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q


@q(
    "q_fleiss_kappa",
    oracle="""
    WITH scored AS (
      SELECT CAST((length(regexp_replace(text,
               '\\b(the|a|of|and|to|in|is|it|that|for)\\b', '', 'g'))
               < length(text)) AS INTEGER)
           + CAST((CAST(length(regexp_replace(text, '[^ -~]', '', 'g'))
                        AS DOUBLE) / GREATEST(length(text), 1) > 0.95)
                  AS INTEGER)
           + CAST((CAST(length(regexp_replace(lower(text), '[^aeiou]', '',
                                              'g')) AS DOUBLE)
                   / GREATEST(length(regexp_replace(lower(text), '[^a-z]',
                                                    '', 'g')), 1)
                   BETWEEN 0.35 AND 0.45) AS INTEGER) AS n_yes
      FROM documents
    ), agg AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(((n_yes * (n_yes - 1) + (3 - n_yes) * (2 - n_yes)) / 6.0) * 1e10 + 0.5) / 1e10
               AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS p_bar,
             CAST(SUM(n_yes) AS DOUBLE) / (3 * COUNT(*)) AS p_yes
      FROM scored
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           (p_yes) AS share_yes,
           (p_bar) AS observed_agreement,
           (p_yes * p_yes + (1 - p_yes) * (1 - p_yes))
             AS expected_agreement,
           ((p_bar - (p_yes * p_yes + (1 - p_yes) * (1 - p_yes)))
                 / (1 - (p_yes * p_yes + (1 - p_yes) * (1 - p_yes))))
             AS fleiss_kappa
    FROM agg
    """,
    desc="Fleiss' kappa among THREE English detectors (stopword hit, "
         "ascii ratio, vowel band) rated per document with NO ground "
         "truth: per-doc agreement P_i = (n_yes(n_yes-1) + "
         "n_no(n_no-1))/(k(k-1)), chance agreement from the pooled "
         "category shares, kappa = (P - Pe)/(1 - Pe) — the "
         "inter-RATER coefficient that says whether the detectors "
         "see documents the same way at all (high kappa = redundant "
         "ensemble, low = diverse votes worth combining), where "
         "q_cohens_kappa needs truth and q_cochran_q only compares "
         "error rates. Ratings are pure JVM expressions; one "
         "combinable agg carries every term; per-doc agreement "
         "ratios quantize the 1e-10 grid ->DECIMAL before the sum.",
    tags=["text", "stats", "agg"],
)
def q_fleiss_kappa(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("text")
    stop_re = r"\b(the|a|of|and|to|in|is|it|that|for)\b"
    pa = F.length(F.regexp_replace(col("text"), stop_re, "")) < F.length("text")
    n_ascii = F.length(F.regexp_replace(col("text"), r"[^ -~]", ""))
    pb = n_ascii.cast("double") / F.greatest(F.length("text"), lit(1)) > 0.95
    lower = F.lower(col("text"))
    vowels = F.length(F.regexp_replace(lower, r"[^aeiou]", ""))
    letters = F.length(F.regexp_replace(lower, r"[^a-z]", ""))
    vr = vowels.cast("double") / F.greatest(letters, lit(1))
    pc = (vr >= 0.35) & (vr <= 0.45)
    n_yes = pa.cast("int") + pb.cast("int") + pc.cast("int")
    p_i = (dfloor(((n_yes * (n_yes - 1) + (3 - n_yes) * (2 - n_yes)) / 6.0) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")
    agg = docs.select(n_yes.alias("ny"), p_i.alias("pi")).agg(
        F.count("*").alias("n"),
        (F.sum("pi").cast("double") / F.count("*")).alias("p_bar"),
        (F.sum("ny").cast("double") / (3 * F.count("*"))).alias("p_yes"),
    )
    pe = col("p_yes") * col("p_yes") + (1 - col("p_yes")) * (1 - col("p_yes"))
    return agg.select(
        col("n").cast("long").alias("n_docs"),
        (col("p_yes")).alias("share_yes"),
        (col("p_bar")).alias("observed_agreement"),
        (pe).alias("expected_agreement"),
        ((col("p_bar") - pe) / (1 - pe)).alias("fleiss_kappa"),
    )


@q(
    "q_icc_reliability",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY CAST(ts AS DATE)
    ), tagged AS (
      SELECT mc,
             CAST(FLOOR((CAST(day - DATE '2024-01-01' AS BIGINT)) / 7.0)
                  AS BIGINT) AS wk
      FROM daily
    ), full_weeks AS (
      SELECT wk FROM tagged GROUP BY wk HAVING COUNT(*) = 7
    ), grp AS (
      SELECT t.wk, COUNT(*) AS n, SUM(CAST(t.mc AS DECIMAL(38,0))) AS s
      FROM tagged t JOIN full_weeks f ON t.wk = f.wk
      GROUP BY t.wk
    ), tot AS (
      SELECT COUNT(*) AS k, SUM(n) AS nt,
             CAST(SUM(s) AS DOUBLE) / SUM(n) AS grand
      FROM grp
    ), ssb AS (
      SELECT CAST(SUM(CAST(FLOOR((g.n * POWER(CAST(g.s AS DOUBLE) / g.n - t.grand, 2)) * 1e6 + 0.5) / 1e6
               AS DECIMAL(38,6))) AS DOUBLE) AS v
      FROM grp g, tot t
    ), ssw AS (
      SELECT CAST(SUM(CAST(FLOOR((POWER(x.mc - CAST(g.s AS DOUBLE) / g.n, 2)) * 1e6 + 0.5) / 1e6
               AS DECIMAL(38,6))) AS DOUBLE) AS v
      FROM tagged x JOIN grp g ON x.wk = g.wk
    )
    SELECT CAST(t.k AS BIGINT) AS n_weeks,
           CAST(t.nt AS BIGINT) AS n_days,
           (b.v / (t.k - 1)) AS ms_between,
           (w.v / (t.nt - t.k)) AS ms_within,
           ((b.v / (t.k - 1) - w.v / (t.nt - t.k))
                 / (b.v / (t.k - 1) + (7 - 1) * (w.v / (t.nt - t.k))))
             AS icc1
    FROM tot t, ssb b, ssw w
    """,
    desc="Intraclass correlation ICC(1) of pooled daily means nested "
         "in full weeks: one-way random-effects components "
         "(MSB - MSW)/(MSB + (k-1) MSW) with k = 7 days per week — "
         "the reliability coefficient that says what fraction of "
         "day-to-day variance is WEEK-level structure; ICC near 0 "
         "licenses treating days as independent replicates (the "
         "unstated assumption of q_anova_oneway and every per-day "
         "test here), while a large ICC demands week-clustered "
         "errors. Daily means are exact integer cents; week groups "
         "are exact epoch-day FLOOR arithmetic; both sums of "
         "squares use the centered-quantized discipline with exact "
         "decimal group sums; ICC is one closed form.",
    tags=["events", "stats", "agg", "cross"],
)
def q_icc_reliability(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    epoch = F.datediff(col("day"), F.lit("2024-01-01").cast("date"))
    tagged = daily.select("mc", F.floor(epoch / 7).cast("long").alias("wk"))
    full_weeks = (
        tagged.groupBy(col("wk").alias("fw")).agg(F.count("*").alias("c"))
        .filter(col("c") == 7)
        .select("fw")
    )
    kept = tagged.join(broadcast(full_weeks), col("wk") == col("fw"))
    grp = kept.groupBy("wk").agg(
        F.count("*").alias("n"),
        F.sum(col("mc").cast("decimal(38,0)")).alias("s"),
    )
    tot = grp.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nt"),
        (F.sum("s").cast("double") / F.sum("n")).alias("grand"),
    )
    sd = col("s").cast("double")
    ssb = (
        grp.crossJoin(broadcast(tot))
        .agg(
            F.sum(
                (dfloor((col("n") * F.pow(sd / col("n") - col("grand"), 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)")
            ).cast("double").alias("v")
        )
    )
    gmeans = grp.select(
        col("wk").alias("wk_g"), (sd / col("n")).alias("gmean")
    )
    ssw = (
        kept.join(broadcast(gmeans), col("wk") == col("wk_g"))
        .agg(
            F.sum(
                (dfloor((F.pow(col("mc") - col("gmean"), 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                .cast("decimal(38,6)")
            ).cast("double").alias("v")
        )
    )
    j = (
        tot.crossJoin(broadcast(ssb.select(col("v").alias("ssb"))))
        .crossJoin(broadcast(ssw.select(col("v").alias("ssw"))))
    )
    msb = col("ssb") / (col("k") - 1)
    msw = col("ssw") / (col("nt") - col("k"))
    return j.select(
        col("k").cast("long").alias("n_weeks"),
        col("nt").cast("long").alias("n_days"),
        (msb).alias("ms_between"),
        (msw).alias("ms_within"),
        ((msb - msw) / (msb + (7 - 1) * msw)).alias("icc1"),
    )
