"""Forty-third-wave query inventory: statistical-inference closure —
delete-one-group JACKKNIFE variance (the resampling standard error
that needs no random draws at all, complementing q_bootstrap_ci's
Poisson draws: delete-one is exhaustive and deterministic by
construction) and the Markov ENTROPY RATE of the event stream (how
many nats of surprise each next event carries given the current one —
the sequence-predictability scalar behind session-model capacity
planning, composing q_event_transitions' bigram matrix with
q_text_entropy's quantized-term discipline).

Determinism discipline: group statistics are exact integer cents;
each leave-one-out estimate / entropy term is ONE closed-form double
from exact integers, quantized the 1e-12 grid -> DECIMAL(38,12) before
the cross-group sum (the q_alpha_diversity construction), so no
float accumulation order exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_jackknife_variance",
    oracle="""
    WITH grp AS (
      SELECT date_trunc('month', l_shipdate) AS g,
             SUM(CAST(FLOOR((l_discount * 100) + 0.5) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT SUM(s) AS ts, SUM(n) AS tn, COUNT(*) AS ng FROM grp
    ), loo AS (
      SELECT CAST(FLOOR((CAST(t.ts - g.s AS DOUBLE) / (t.tn - g.n)) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(38,12)) AS est,
             t.ts, t.tn, t.ng
      FROM grp g, tot t
    ), center AS (
      SELECT CAST(SUM(est) AS DOUBLE) / MAX(ng) AS m FROM loo
    ), devs AS (
      SELECT l.ts, l.tn, l.ng,
             CAST(FLOOR((POWER(CAST(l.est AS DOUBLE) - c.m, 2)) * 1e18 + 0.5) / 1e18
                  AS DECIMAL(38,18)) AS d2
      FROM loo l, center c
    )
    SELECT CAST(MAX(ng) AS BIGINT) AS n_groups,
           CAST(MAX(tn) AS BIGINT) AS n_rows,
           (CAST(MAX(ts) AS DOUBLE) / MAX(tn) / 100)
             AS mean_discount,
           (SQRT((CAST(MAX(ng) AS DOUBLE) - 1) / MAX(ng)
                      * CAST(SUM(d2) AS DOUBLE)) / 100) AS jackknife_se
    FROM devs
    """,
    desc="Delete-one-month jackknife standard error of the mean "
         "discount: each ship-month is left out once and the "
         "estimator recomputed from TOTALS (no data re-scan — "
         "leave-one-out over G groups is G subtractions from the "
         "grand totals), then SE = sqrt((G-1)/G * sum of squared "
         "deviations). Exhaustive and draw-free where "
         "q_bootstrap_ci needs hashed Poisson draws — the two "
         "resampling pillars. Group sums are exact integer cents; "
         "every LOO estimate is one double division quantized to "
         "DECIMAL(38,12), and the variance is CENTER-THEN-SQUARE "
         "(deviations from the mean estimate, each squared and "
         "quantized before the exact decimal sum) — the naive "
         "sum(x^2)-(sum x)^2/G form cancels 12+ digits here and "
         "leaks last-ulp engine differences past any rounding "
         "guard (caught at sf0.01). One combinable group agg "
         "+ arithmetic over the tiny group table (tagged cross for "
         "the 1-row totals broadcast).",
    tags=["stats", "agg", "cross"],
)
def q_jackknife_variance(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    grp = (
        li.groupBy(F.date_trunc("month", col("l_shipdate")).alias("g"))
        .agg(
            F.sum(dfloor((col("l_discount") * 100) + F.lit(0.5)).cast("long")).alias("s"),
            F.count("*").alias("n"),
        )
    )
    tot = grp.agg(
        F.sum("s").alias("ts"), F.sum("n").alias("tn"),
        F.count("*").alias("ng"),
    )
    loo = grp.crossJoin(broadcast(tot)).select(
        (dfloor(((col("ts") - col("s")).cast("double") / (col("tn") - col("n"))) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("est"),
        "ts", "tn", "ng",
    )
    center = loo.agg(
        (F.sum("est").cast("double") / F.max("ng")).alias("m")
    )
    # center-then-square: the naive sum(x^2) - (sum x)^2/G cancels 12+
    # digits here (LOO estimates differ only in the 5th decimal) and
    # amplifies last-ulp engine differences past the rounding guard
    devs = loo.crossJoin(broadcast(center)).select(
        "ts", "tn", "ng",
        (dfloor((F.pow(col("est").cast("double") - col("m"), 2)) * F.lit(1e18) + F.lit(0.5)) / F.lit(1e18))
        .cast("decimal(38,18)").alias("d2"),
    )
    ngd = F.max("ng").cast("double")
    return devs.agg(
        F.max("ng").cast("long").alias("n_groups"),
        F.max("tn").cast("long").alias("n_rows"),
        (F.max("ts").cast("double") / F.max("tn") / 100)
        .alias("mean_discount"),
        (F.sqrt((ngd - 1) / ngd * F.sum("d2").cast("double")) / 100).alias("jackknife_se"),
    )


@q(
    "q_entropy_rate",
    oracle="""
    WITH ordered AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), cells AS (
      SELECT event_type AS src, nxt, COUNT(*) AS nij
      FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), marg AS (
      SELECT src, nxt, nij,
             SUM(nij) OVER (PARTITION BY src) AS ni,
             SUM(nij) OVER () AS big_n
      FROM cells
    ), terms AS (
      SELECT src, ni, big_n,
             CAST(FLOOR((-(CAST(nij AS DOUBLE) / ni)
                        * LN(CAST(nij AS DOUBLE) / ni)) * 1e12 + 0.5) / 1e12
                  AS DECIMAL(38,12)) AS h_term
      FROM marg
    )
    SELECT src AS event_type,
           CAST(MAX(ni) AS BIGINT) AS n_transitions,
           (CAST(MAX(ni) AS DOUBLE) / MAX(big_n)) AS p_state,
           (CAST(SUM(h_term) AS DOUBLE)) AS cond_entropy,
           (CAST(MAX(ni) AS DOUBLE) / MAX(big_n)
                 * CAST(SUM(h_term) AS DOUBLE)) AS rate_contrib
    FROM terms GROUP BY src ORDER BY src
    """,
    desc="Markov entropy rate of the event stream: per source state, "
         "the conditional entropy of the next event type and its "
         "stationary-weighted contribution (sum of rate_contrib = "
         "the chain's entropy rate in nats — near zero means "
         "sessions are script-like and predictable, ln(k) means "
         "type-agnostic noise). The stream collapses via ONE "
         "per-user lag window into a k x k bigram cell table "
         "(q_event_transitions' construction); probabilities are "
         "exact integer-count ratios; each -p ln p term quantizes "
         "the 1e-12 grid -> DECIMAL before the per-state sum "
         "(q_alpha_diversity's discipline), so no float "
         "accumulation order exists. The SUM() OVER () runs over "
         "the k x k cell table (25 rows), not data.",
    tags=["events", "stats", "window", "agg", "cross"],
)
def q_entropy_rate(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(col("nxt").isNotNull())
    cells = ordered.groupBy(
        col("event_type").alias("src"), "nxt"
    ).agg(F.count("*").alias("nij"))
    tot = cells.agg(F.sum("nij").alias("big_n"))
    marg = cells.select(
        "src", "nij",
        F.sum("nij").over(Window.partitionBy("src")).alias("ni"),
    ).crossJoin(broadcast(tot))
    p = col("nij").cast("double") / col("ni")
    terms = marg.select(
        "src", "ni", "big_n",
        (dfloor((-p * F.log(p)) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("h_term"),
    )
    return (
        terms.groupBy("src")
        .agg(
            F.max("ni").cast("long").alias("n_transitions"),
            (F.max("ni").cast("double") / F.max("big_n"))
            .alias("p_state"),
            (F.sum("h_term").cast("double")).alias("cond_entropy"),
            (F.max("ni").cast("double") / F.max("big_n")
                * F.sum("h_term").cast("double")).alias("rate_contrib"),
        )
        .withColumnRenamed("src", "event_type")
        .orderBy("event_type")
    )
