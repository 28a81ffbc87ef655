"""Fifty-third-wave query inventory: categorical-effect panel — the
ODDS RATIO with its log-scale confidence interval (the 2x2 effect
measure epidemiology and ads testing both standardize on, with the
exact-integer cell counts q_chi2_assoc's significance test leaves
unreported) and McNEMAR'S TEST for PAIRED classifiers (do two
predictors disagree asymmetrically on the SAME documents? — the only
correct way to compare two classifiers evaluated on one dataset,
where q_ab_test_z's unpaired z would be wrong).

Determinism discipline: every cell is an exact integer count from one
combinable agg; OR, its log-SE (sqrt(1/a+1/b+1/c+1/d)), the CI bounds
(shared z literal 1.959964) and the continuity-corrected McNemar
chi-square are single closed-form doubles, rounded 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from .. import tables
from . import q

_Z = 1.959964


@q(
    "q_odds_ratio",
    oracle=f"""
    WITH cells AS (
      SELECT o_orderstatus AS st,
             COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT'
                              AND o_totalprice > 200000) AS a,
             COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT'
                              AND o_totalprice <= 200000) AS b,
             COUNT(*) FILTER (WHERE o_orderpriority <> '1-URGENT'
                              AND o_totalprice > 200000) AS c,
             COUNT(*) FILTER (WHERE o_orderpriority <> '1-URGENT'
                              AND o_totalprice <= 200000) AS d
      FROM orders GROUP BY 1
    )
    SELECT st AS o_orderstatus,
           CAST(a AS BIGINT) AS n_urgent_high,
           CAST(b AS BIGINT) AS n_urgent_low,
           CAST(c AS BIGINT) AS n_other_high,
           CAST(d AS BIGINT) AS n_other_low,
           (CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
             AS odds_ratio,
           (EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     - {_Z} * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)))
             AS ci_low,
           (EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     + {_Z} * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)))
             AS ci_high
    FROM cells WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
    ORDER BY st
    """,
    desc="Odds ratio of 'urgent priority' vs 'high-value order "
         "(> 200k)' per status, with the Woolf log-scale 95% CI "
         "(exp(ln OR +- z*sqrt(1/a+1/b+1/c+1/d))) — the 2x2 effect "
         "measure that says HOW STRONGLY the traits associate and "
         "whether the CI excludes 1, where q_chi2_assoc only says "
         "the association is non-random. Four exact integer cells "
         "from ONE combinable conditional-count agg (no second "
         "scan); OR and CI are closed-form doubles with the shared "
         "z literal; degenerate strata (any empty cell) are "
         "excluded per standard practice.",
    tags=["stats", "agg"],
)
def q_odds_ratio(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    urgent = col("o_orderpriority") == "1-URGENT"
    high = col("o_totalprice") > 200000
    cells = orders.groupBy(col("o_orderstatus").alias("st")).agg(
        F.count(F.when(urgent & high, 1)).alias("a"),
        F.count(F.when(urgent & ~high, 1)).alias("b"),
        F.count(F.when(~urgent & high, 1)).alias("c"),
        F.count(F.when(~urgent & ~high, 1)).alias("d"),
    )
    ad = col("a").cast("double") * col("d")
    bc = col("b").cast("double") * col("c")
    se = F.sqrt(
        1.0 / col("a") + 1.0 / col("b") + 1.0 / col("c") + 1.0 / col("d")
    )
    return (
        cells.filter(
            (col("a") > 0) & (col("b") > 0) & (col("c") > 0) & (col("d") > 0)
        )
        .select(
            col("st").alias("o_orderstatus"),
            col("a").cast("long").alias("n_urgent_high"),
            col("b").cast("long").alias("n_urgent_low"),
            col("c").cast("long").alias("n_other_high"),
            col("d").cast("long").alias("n_other_low"),
            (ad / bc).alias("odds_ratio"),
            (F.exp(F.log(ad / bc) - _Z * se)).alias("ci_low"),
            (F.exp(F.log(ad / bc) + _Z * se)).alias("ci_high"),
        )
        .orderBy("o_orderstatus")
    )


@q(
    "q_mcnemar_paired",
    # classifier A: stopword-vote langid says 'en'; classifier B:
    # ascii-ratio > 0.95 (script heuristic); truth: lang = 'en'.
    # McNemar uses only the DISAGREEMENT cells b (A right, B wrong)
    # and c (A wrong, B right), continuity-corrected.
    oracle="""
    WITH scored AS (
      SELECT (lang = 'en') AS truth,
             (list_aggregate(list_transform(
                 list_filter(string_split_regex(trim(text),
                     '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> ''),
                 t -> CASE WHEN lower(t) IN ('the','a','of','and','to',
                     'in','is','it','that','for') THEN 1 ELSE 0 END),
                 'sum') > 0) AS pred_a,
             (CAST(length(regexp_replace(text, '[^ -~]', '', 'g'))
                   AS DOUBLE) / GREATEST(length(text), 1) > 0.95) AS pred_b
      FROM documents
    ), cells AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE (pred_a = truth)
                              AND (pred_b <> truth)) AS b,
             COUNT(*) FILTER (WHERE (pred_a <> truth)
                              AND (pred_b = truth)) AS c,
             COUNT(*) FILTER (WHERE pred_a = truth) AS acc_a,
             COUNT(*) FILTER (WHERE pred_b = truth) AS acc_b
      FROM scored
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(b AS BIGINT) AS a_only_correct,
           CAST(c AS BIGINT) AS b_only_correct,
           (CAST(acc_a AS DOUBLE) / n) AS accuracy_a,
           (CAST(acc_b AS DOUBLE) / n) AS accuracy_b,
           (POWER(GREATEST(ABS(CAST(b AS DOUBLE) - c) - 1, 0), 2)
                 / NULLIF(b + c, 0)) AS mcnemar_chi2
    FROM cells
    """,
    desc="McNemar's paired test comparing two English detectors on "
         "the SAME documents (A: any-English-stopword hit; B: "
         "ascii-ratio > 0.95) against the labeled truth: only the "
         "asymmetry of the disagreement cells matters "
         "(max(|b-c|-1, 0)^2 / (b+c), continuity-corrected with the "
         "standard clamp so b = c yields exactly 0) — the correct paired "
         "comparison where an unpaired two-proportion z on the two "
         "accuracies (also reported) ignores that both classifiers "
         "saw identical documents and overstates the variance. Both "
         "predictors and the truth are pure expressions; ONE "
         "combinable agg produces every cell; chi2 > 3.84 rejects "
         "equal error rates at 5%.",
    tags=["text", "stats", "agg"],
)
def q_mcnemar_paired(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("lang", "text")
    en_stop = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
    toks = F.transform(tokens(col("text")), F.lower)
    pred_a = F.size(F.filter(toks, lambda t: t.isin(*en_stop))) > 0
    n_ascii = F.length(F.regexp_replace(col("text"), r"[^ -~]", ""))
    pred_b = (
        n_ascii.cast("double") / F.greatest(F.length("text"), lit(1)) > 0.95
    )
    scored = docs.select(
        (col("lang") == "en").alias("truth"),
        pred_a.alias("pa"),
        pred_b.alias("pb"),
    )
    cells = scored.agg(
        F.count("*").alias("n"),
        F.count(F.when((col("pa") == col("truth"))
                       & (col("pb") != col("truth")), 1)).alias("b"),
        F.count(F.when((col("pa") != col("truth"))
                       & (col("pb") == col("truth")), 1)).alias("c"),
        F.count(F.when(col("pa") == col("truth"), 1)).alias("acc_a"),
        F.count(F.when(col("pb") == col("truth"), 1)).alias("acc_b"),
    )
    return cells.select(
        col("n").cast("long").alias("n_docs"),
        col("b").cast("long").alias("a_only_correct"),
        col("c").cast("long").alias("b_only_correct"),
        (col("acc_a").cast("double") / col("n"))
        .alias("accuracy_a"),
        (col("acc_b").cast("double") / col("n"))
        .alias("accuracy_b"),
        (F.pow(
                F.greatest(
                    F.abs(col("b").cast("double") - col("c")) - 1, lit(0.0)
                ), 2,
            )
            / F.nullif((col("b") + col("c")).cast("double"), lit(0.0))).alias("mcnemar_chi2"),
    )
