"""Seventieth-wave query inventory: domain transfer and randomness —
the CROSS-SOURCE LM TRANSFER audit (for every source, the foreign
source whose add-1-smoothed unigram LM gives it the lowest
cross-entropy: the domain-closeness matrix reduced to its argmin row
— the number that decides which corpus slice to up-sample when a
target domain is data-poor; q_heldout_perplexity scores ONE model
on held-out data, this ranks ALL pairwise domain transfers) and the
WALD-WOLFOWITZ RUNS TEST (are each event type's daily means
serially random around their median? The runs z-score catches
oscillation and clustering that q_mann_kendall's monotone-trend
test is blind to).

Determinism discipline: token counts are exact integers; smoothed
log-prob terms are closed-form doubles quantized the 1e-10 grid ->
DECIMAL(38,10) before per-pair sums; the daily median is the exact
percentile of identical 6-dec doubles; run counts are pure integer
lag-flag sums; every z is one closing closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL


@q(
    "q_cross_entropy_sources",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ), stc AS (
      SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), tot AS (
      SELECT source, SUM(c) AS n FROM stc GROUP BY source
    ), vocab AS (
      SELECT COUNT(DISTINCT tok) AS v FROM stc
    ), terms AS (
      SELECT e.source AS eval_src, tm.source AS model_src,
             CAST(SUM(CAST(FLOOR((-(CAST(e.c AS DOUBLE) / te.n)
                 * LN((COALESCE(m.c, 0) + 1.0) / (tm.n + vb.v))) * 1e10 + 0.5) / 1e10
               AS DECIMAL(38,10))) AS DOUBLE) AS xent
      FROM stc e
      JOIN tot te ON e.source = te.source
      CROSS JOIN tot tm
      LEFT JOIN stc m ON m.source = tm.source AND m.tok = e.tok
      CROSS JOIN vocab vb
      WHERE tm.source <> e.source
      GROUP BY e.source, tm.source
    ), ranked AS (
      SELECT eval_src, model_src, xent,
             ROW_NUMBER() OVER (PARTITION BY eval_src
                                ORDER BY xent, model_src) AS rnk
      FROM terms
    )
    SELECT eval_src AS source, model_src AS closest_source,
           (xent) AS cross_entropy
    FROM ranked WHERE rnk = 1 ORDER BY eval_src
    """,
    desc="Cross-source LM transfer: for each source, the FOREIGN "
         "source whose add-1-smoothed unigram model assigns it the "
         "lowest cross-entropy H(eval|model) = -sum p_eval(w) ln "
         "((c_model(w)+1)/(n_model+V)) — the pairwise domain-"
         "closeness matrix reduced to its argmin row, the quantity "
         "that picks which slice to up-sample for a data-poor "
         "target domain (q_heldout_perplexity scores one model; "
         "this ranks every transfer). The corpus collapses to "
         "(source, token) counts; the evaluation is a vocab-table "
         "join fanned out by n_sources (bounded by the source "
         "count, independent of corpus size) with OOV handled by "
         "the LEFT join + add-1; each term quantizes the 1e-10 grid ->"
         "DECIMAL before the per-pair sum; argmin tie-broken by "
         "model source.",
    tags=["text", "stats", "join", "agg", "cross", "window"],
)
def q_cross_entropy_sources(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("source", "text")
    stc = (
        docs.select("source", F.explode(tokens(col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = stc.groupBy("source").agg(F.sum("c").alias("n"))
    vocab = stc.agg(F.countDistinct("tok").alias("v"))
    e = stc.alias("e")
    te = tot.select(col("source").alias("es"), col("n").alias("ne"))
    tm = tot.select(col("source").alias("ms"), col("n").alias("nm"))
    m = stc.select(
        col("source").alias("ms2"), col("tok").alias("mtok"),
        col("c").alias("mc"),
    )
    grid = (
        e.join(broadcast(te), col("e.source") == col("es"))
        .crossJoin(broadcast(tm))
        .filter(col("ms") != col("e.source"))
        .join(
            m,
            (col("ms2") == col("ms")) & (col("mtok") == col("e.tok")),
            "left",
        )
        .crossJoin(broadcast(vocab))
    )
    term = (dfloor((-(col("e.c").cast("double") / col("ne"))
        * F.log(
            (F.coalesce(col("mc"), F.lit(0)) + 1.0).cast("double")
            / (col("nm") + col("v"))
        )) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast("decimal(38,10)")
    xent = (
        grid.groupBy(
            col("e.source").alias("eval_src"), col("ms").alias("model_src")
        )
        .agg(F.sum(term).cast("double").alias("xent"))
    )
    w = Window.partitionBy("eval_src").orderBy("xent", "model_src")
    return (
        xent.withColumn("rnk", F.row_number().over(w))
        .filter(col("rnk") == 1)
        .select(
            col("eval_src").alias("source"),
            col("model_src").alias("closest_source"),
            col("xent").alias("cross_entropy"),
        )
        .orderBy("source")
    )


@q(
    "q_runs_test",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                        AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS m
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), med AS (
      SELECT event_type, quantile_cont(m, 0.5) AS md
      FROM daily GROUP BY event_type
    ), signs AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.m > me.md THEN 1 ELSE 0 END AS s
      FROM daily d JOIN med me ON d.event_type = me.event_type
      WHERE d.m <> me.md
    ), flagged AS (
      SELECT event_type, s,
             CASE WHEN LAG(s) OVER (PARTITION BY event_type ORDER BY day)
                       IS NULL
                  OR LAG(s) OVER (PARTITION BY event_type ORDER BY day)
                       <> s THEN 1 ELSE 0 END AS new_run
      FROM signs
    ), agg AS (
      SELECT event_type,
             SUM(new_run) AS r,
             COUNT(*) FILTER (WHERE s = 1) AS n1,
             COUNT(*) FILTER (WHERE s = 0) AS n2
      FROM flagged GROUP BY event_type
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS n_runs,
           (2.0 * n1 * n2 / (n1 + n2) + 1) AS expected_runs,
           ((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (POWER(CAST(n1 + n2 AS DOUBLE), 2)
                           * (n1 + n2 - 1)))) AS z_runs
    FROM agg ORDER BY event_type
    """,
    desc="Wald-Wolfowitz runs test on each event type's daily-mean "
         "series: days above/below the exact median (median-equal "
         "days dropped, the standard convention), the observed run "
         "count from a lag-change flag, and the normal-approximation "
         "z against E[R] = 2 n1 n2/(n1+n2) + 1 — negative z means "
         "CLUSTERING (regimes), positive z means oscillation; both "
         "are serial structure that q_mann_kendall's monotone test "
         "and q_control_chart's iid limits cannot distinguish from "
         "noise. The event stream collapses to the tiny daily "
         "table; the median is an exact percentile of identical "
         "6-dec doubles; run counting is a pure integer lag flag; "
         "z is one closed form.",
    tags=["events", "stats", "window", "agg"],
)
def q_runs_test(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    med = daily.groupBy(col("event_type").alias("et")).agg(
        F.expr("percentile(m, 0.5)").alias("md")
    )
    signs = (
        daily.join(broadcast(med), col("event_type") == col("et"))
        .filter(col("m") != col("md"))
        .select(
            "event_type", "day",
            F.when(col("m") > col("md"), 1).otherwise(0).alias("s"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    flagged = signs.withColumn(
        "new_run",
        F.when(
            ~F.lag("s").over(w).eqNullSafe(col("s")), 1
        ).otherwise(0),
    )
    agg = flagged.groupBy("event_type").agg(
        F.sum("new_run").alias("r"),
        F.count(F.when(col("s") == 1, 1)).alias("n1"),
        F.count(F.when(col("s") == 0, 1)).alias("n2"),
    )
    n1 = col("n1").cast("double")
    n2 = col("n2").cast("double")
    nn = n1 + n2
    er = 2 * n1 * n2 / nn + 1
    sigma = F.sqrt(
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / (F.pow(nn, 2) * (nn - 1))
    )
    return agg.select(
        "event_type",
        col("n1").cast("long").alias("n_above"),
        col("n2").cast("long").alias("n_below"),
        col("r").cast("long").alias("n_runs"),
        (er).alias("expected_runs"),
        ((col("r") - er) / sigma).alias("z_runs"),
    ).orderBy("event_type")
