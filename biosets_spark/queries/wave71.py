"""Seventy-first-wave query inventory: symmetric divergence and
sequential testing — JENSEN-SHANNON divergence between source
unigram distributions (the bounded, symmetric domain distance:
q_cross_entropy_sources' transfer matrix is asymmetric by design,
JS gives the metric-like version retrieval and mixture weighting
want, computed exactly from the common-token join plus closed-form
mass corrections for one-sided tokens) and the SPRT MONITOR (Wald's
sequential probability ratio test on each event type's daily
high-value rate against its week-1 baseline: the always-valid
sequential decision q_ab_test_z's fixed-horizon z cannot make —
report the day the evidence first crossed the +-ln(19) boundary).

Determinism discipline: token masses and event counts are exact
integers; JS common-token terms and per-day LLR terms are
closed-form doubles quantized ROUND(,8/10)->DECIMAL before their
sums (running sums accumulate decimals exactly); boundary
comparisons see identical doubles; ln 19 and the rate lift are
shared literals.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL
_LN2 = 0.6931471805599453
_SPRT_A = 2.9444389791664403  # ln(19): alpha = beta = 0.05
_LIFT = 1.2
_HIGH = 20.0


@q(
    "q_js_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ), stc AS (
      SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), tot AS (
      SELECT source, SUM(c) AS n FROM stc GROUP BY source
    ), common AS (
      SELECT a.source AS sa, b.source AS sb,
             CAST(SUM(CAST(FLOOR(((CAST(a.c AS DOUBLE) / ta.n)
                 * LN(2 * (CAST(a.c AS DOUBLE) / ta.n)
                      / (CAST(a.c AS DOUBLE) / ta.n
                         + CAST(b.c AS DOUBLE) / tb.n))
               + (CAST(b.c AS DOUBLE) / tb.n)
                 * LN(2 * (CAST(b.c AS DOUBLE) / tb.n)
                      / (CAST(a.c AS DOUBLE) / ta.n
                         + CAST(b.c AS DOUBLE) / tb.n))) * 1e10 + 0.5) / 1e10
               AS DECIMAL(38,10))) AS DOUBLE) AS common_terms,
             CAST(SUM(CAST(FLOOR((CAST(a.c AS DOUBLE) / ta.n) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(28,10))) AS DOUBLE) AS pa_common,
             CAST(SUM(CAST(FLOOR((CAST(b.c AS DOUBLE) / tb.n) * 1e10 + 0.5) / 1e10
                           AS DECIMAL(28,10))) AS DOUBLE) AS pb_common
      FROM stc a
      JOIN stc b ON a.tok = b.tok AND a.source < b.source
      JOIN tot ta ON a.source = ta.source
      JOIN tot tb ON b.source = tb.source
      GROUP BY a.source, b.source
    ), jsd AS (
      SELECT sa, sb,
             0.5 * (common_terms
                    + (1 - pa_common) * {_LN2}
                    + (1 - pb_common) * {_LN2}) AS js
      FROM common
    )
    SELECT sa AS source_a, sb AS source_b, (js) AS js_divergence
    FROM jsd ORDER BY js, sa, sb LIMIT 10
    """,
    desc="Jensen-Shannon divergence between source unigram "
         "distributions, 10 closest pairs: JS = 0.5[KL(P||M) + "
         "KL(Q||M)], M = (P+Q)/2 — the symmetric, ln2-bounded "
         "domain distance mixture weighting and retrieval want "
         "where q_cross_entropy_sources is deliberately asymmetric. "
         "Computed EXACTLY without a full outer join: common tokens "
         "contribute the two-sided closed-form terms; tokens on one "
         "side only contribute p*ln2, so their total is "
         "(1 - common mass)*ln2 from the same join — the identity "
         "that keeps the pair join bounded (C(n_sources,2) fan-out "
         "per token, like q_vocab_overlap). Terms and masses "
         "quantize ROUND->DECIMAL before per-pair sums; ordering "
         "tie-broken by the pair names.",
    tags=["text", "stats", "join", "agg"],
)
def q_js_divergence(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("source", "text")
    stc = (
        docs.select("source", F.explode(tokens(col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = stc.groupBy("source").agg(F.sum("c").alias("n"))
    a = stc.alias("a")
    b = stc.alias("b")
    ta = tot.select(col("source").alias("sa_t"), col("n").alias("na"))
    tb = tot.select(col("source").alias("sb_t"), col("n").alias("nb"))
    pa = col("a.c").cast("double") / col("na")
    pb = col("b.c").cast("double") / col("nb")
    term = (dfloor((pa * F.log(2 * pa / (pa + pb)) + pb * F.log(2 * pb / (pa + pb))) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(38,10)")
    common = (
        a.join(b, (col("a.tok") == col("b.tok"))
               & (col("a.source") < col("b.source")))
        .join(broadcast(ta), col("a.source") == col("sa_t"))
        .join(broadcast(tb), col("b.source") == col("sb_t"))
        .groupBy(col("a.source").alias("sa"), col("b.source").alias("sb"))
        .agg(
            F.sum(term).cast("double").alias("common_terms"),
            F.sum((dfloor((pa) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")).cast("double")
            .alias("pa_common"),
            F.sum((dfloor((pb) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(28,10)")).cast("double")
            .alias("pb_common"),
        )
    )
    js = 0.5 * (
        col("common_terms")
        + (1 - col("pa_common")) * lit(_LN2)
        + (1 - col("pb_common")) * lit(_LN2)
    )
    return (
        common.select(
            col("sa").alias("source_a"), col("sb").alias("source_b"),
            (js).alias("js_divergence"), js.alias("_j"),
        )
        .orderBy("_j", "source_a", "source_b")
        .limit(10)
        .drop("_j")
    )


@q(
    "q_sprt_monitor",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE value >= {_HIGH}) AS k
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), base AS (
      SELECT event_type,
             CAST(SUM(k) AS DOUBLE) / SUM(n) AS p0
      FROM daily WHERE day < DATE '2024-01-08' GROUP BY event_type
    ), llr AS (
      SELECT d.event_type, d.day,
             CAST(FLOOR((d.k * LN(LEAST(b.p0 * {_LIFT}, 0.999999) / b.p0)
                        + (d.n - d.k)
                          * LN((1 - LEAST(b.p0 * {_LIFT}, 0.999999))
                               / (1 - b.p0))) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS t
      FROM daily d JOIN base b ON d.event_type = b.event_type
      WHERE d.day >= DATE '2024-01-08'
    ), cum AS (
      SELECT event_type, day,
             CAST(SUM(t) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS c,
             MAX(day) OVER (PARTITION BY event_type) AS last_day
      FROM llr
    )
    SELECT b.event_type,
           (b.p0) AS baseline_rate,
           (MAX(c.c) FILTER (WHERE c.day = c.last_day)) AS final_llr,
           (MAX(c.c)) AS max_llr,
           (MIN(c.c)) AS min_llr,
           MIN(c.day) FILTER (WHERE ABS(c.c) > {_SPRT_A}) AS crossed_day,
           CASE WHEN MIN(c.day) FILTER (WHERE c.c > {_SPRT_A}) IS NOT NULL
                     AND (MIN(c.day) FILTER (WHERE c.c < -{_SPRT_A}) IS NULL
                          OR MIN(c.day) FILTER (WHERE c.c > {_SPRT_A})
                             < MIN(c.day) FILTER (WHERE c.c < -{_SPRT_A}))
                THEN 'accept_h1'
                WHEN MIN(c.day) FILTER (WHERE c.c < -{_SPRT_A}) IS NOT NULL
                THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum c JOIN base b ON c.event_type = b.event_type
    GROUP BY b.event_type, b.p0
    ORDER BY b.event_type
    """,
    desc="Wald SPRT monitor per event type: week 1 fixes the "
         "baseline high-value rate p0 (value >= 20); from day 8 the "
         "cumulative log-likelihood ratio for H1: p = 1.2*p0 vs H0 "
         "accrues daily, and the first day |LLR| crosses ln(19) "
         "(alpha = beta = 0.05) decides — the ALWAYS-VALID "
         "sequential test that q_ab_test_z's fixed-horizon z is not "
         "(peeking at a z-test inflates false positives; the SPRT "
         "boundary is designed for daily peeking). Counts are exact "
         "integers; each day's LLR term is one closed form "
         "quantized the 1e-8 grid ->DECIMAL(28,8) so the running sum is "
         "order-free; crossing detection compares identical "
         "doubles. The event stream collapses to the tiny daily "
         "table; windows partition by event type.",
    tags=["events", "stats", "window", "agg"],
)
def q_sprt_monitor(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(col("value") >= _HIGH, 1)).alias("k"),
        )
    )
    base = (
        daily.filter(col("day") < F.lit("2024-01-08").cast("date"))
        .groupBy(col("event_type").alias("et_b"))
        .agg((F.sum("k").cast("double") / F.sum("n")).alias("p0"))
    )
    p1 = F.least(col("p0") * _LIFT, lit(0.999999))
    term = (dfloor((col("k") * F.log(p1 / col("p0"))
        + (col("n") - col("k")) * F.log((1 - p1) / (1 - col("p0")))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    llr = (
        daily.filter(col("day") >= F.lit("2024-01-08").cast("date"))
        .join(broadcast(base), col("event_type") == col("et_b"))
        .select("event_type", "day", "p0", term.alias("t"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = llr.withColumn("c", F.sum("t").over(w).cast("double"))
    w_last = Window.partitionBy("event_type")
    agg = (
        cum.withColumn("last_day", F.max("day").over(w_last))
        .groupBy("event_type", "p0")
        .agg(
            F.max(F.when(col("day") == col("last_day"), col("c")))
            .alias("final_llr"),
            F.max("c").alias("max_llr"),
            F.min("c").alias("min_llr"),
            F.min(F.when(F.abs(col("c")) > _SPRT_A, col("day")))
            .alias("crossed_day"),
            F.min(F.when(col("c") > _SPRT_A, col("day"))).alias("up_day"),
            F.min(F.when(col("c") < -_SPRT_A, col("day"))).alias("dn_day"),
        )
    )
    decision = (
        F.when(
            col("up_day").isNotNull()
            & (col("dn_day").isNull() | (col("up_day") < col("dn_day"))),
            "accept_h1",
        )
        .when(col("dn_day").isNotNull(), "accept_h0")
        .otherwise("continue")
    )
    return agg.select(
        "event_type",
        col("p0").alias("baseline_rate"),
        col("final_llr").alias("final_llr"),
        col("max_llr").alias("max_llr"),
        col("min_llr").alias("min_llr"),
        col("crossed_day"),
        decision.alias("decision"),
    ).orderBy("event_type")
