"""Seventy-second-wave query inventory: heavy tails and paired
ranks — the HILL TAIL-INDEX estimator (the standard extreme-value
tail exponent over the top-k order statistics of order value: alpha
near 2 means variance barely exists and mean-based capacity plans
are fiction — the continuous-value complement to q_powerlaw_alpha's
discrete degree MLE and q_gumbel_maxima's block-maxima location)
and the WILCOXON SIGNED-RANK test (paired week-over-week comparison
of daily means per event type: the nonparametric paired test that
q_mann_whitney's unpaired U cannot replace when each day is its own
control — built on the shared two-level midrank helper).

Determinism discipline: order cents are exact integers; the top-k
set is ordered (value DESC, key) so both engines pick identical
rows; ln terms quantize the 1e-10 grid ->DECIMAL before the k-term sum;
paired diffs are exact integer cents with exact midranks from
operators/ranking.doubled_midranks; each z is one closing closed
form.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from ..operators import ranking
from . import dfloor, q

_TAIL_K = 200


@q(
    "q_hill_tail",
    oracle=f"""
    WITH topk AS (
      SELECT CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS c
      FROM orders
      ORDER BY CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) DESC, o_orderkey
      LIMIT {_TAIL_K}
    ), thresh AS (
      SELECT MIN(c) AS ck FROM topk
    ), terms AS (
      SELECT CAST(FLOOR((LN(CAST(t.c AS DOUBLE) / th.ck)) * 1e10 + 0.5) / 1e10
                  AS DECIMAL(38,10)) AS lr
      FROM topk t, thresh th
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           FLOOR((CAST((SELECT ck FROM thresh) AS DOUBLE) / 100) * 1e2 + 0.5) / 1e2
             AS threshold_value,
           FLOOR((CAST(SUM(lr) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS hill_gamma,
           FLOOR((COUNT(*) / CAST(SUM(lr) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tail_alpha
    FROM terms
    """,
    desc=f"Hill tail-index of order value over the top-{_TAIL_K} "
         "order statistics: gamma = mean ln(x_i/x_k) and alpha = "
         "1/gamma — the standard extreme-value tail exponent; alpha "
         "<= 2 means infinite variance and every mean-based capacity "
         "plan built on q_pricing_summary's moments is fiction (the "
         "continuous complement to q_powerlaw_alpha's discrete "
         "degree MLE, with q_gumbel_maxima covering block maxima). "
         "The top-k set is a TakeOrdered over exact integer cents "
         "with order-key tie-breaks (identical on both engines — no "
         "global sort materializes); each log-ratio term quantizes "
         "the 1e-10 grid ->DECIMAL before the k-term sum; the threshold "
         "is the exact k-th order statistic.",
    tags=["stats", "agg", "cross"],
)
def q_hill_tail(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    topk = (
        orders.select(
            dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("c"),
            "o_orderkey",
        )
        .orderBy(col("c").desc(), "o_orderkey")
        .limit(_TAIL_K)
    )
    thresh = topk.agg(F.min("c").alias("ck"))
    terms = topk.crossJoin(broadcast(thresh)).select(
        "ck",
        (dfloor((F.log(col("c").cast("double") / col("ck"))) * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10))
        .cast("decimal(38,10)").alias("lr"),
    )
    # k is COUNT(*) over the actual top-k set (not the _TAIL_K
    # literal): on inputs with fewer than _TAIL_K orders the reported
    # k and the gamma/alpha denominators reflect the true
    # order-statistic count in BOTH engines (r5 ADVICE fix).
    return terms.groupBy("ck").agg(
        F.count("*").cast("long").alias("k"),
        (dfloor((col("ck").cast("double") / 100) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).alias("threshold_value"),
        (dfloor((F.sum("lr").cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("hill_gamma"),
        (dfloor((F.count("*") / F.sum("lr").cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("tail_alpha"),
    ).select("k", "threshold_value", "hill_gamma", "tail_alpha")


@q(
    "q_wilcoxon_signed_rank",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), cents AS (
      SELECT event_type, day,
             CAST(FLOOR((CAST(s AS DOUBLE) / n * 100) + 0.5) AS BIGINT) AS mc
      FROM daily
    ), pairs AS (
      SELECT a.event_type, b.mc - a.mc AS d
      FROM cents a JOIN cents b
        ON a.event_type = b.event_type AND b.day = a.day + INTERVAL 7 DAY
      WHERE b.mc <> a.mc
    ), hist AS (
      SELECT event_type, ABS(d) AS v,
             CAST(FLOOR(ABS(d) / 1000.0) AS BIGINT) AS bkt,
             COUNT(*) AS nt,
             COUNT(*) FILTER (WHERE d > 0) AS npos
      FROM pairs GROUP BY 1, 2, 3
    ), in_bkt AS (
      SELECT *, COALESCE(SUM(nt) OVER (
               PARTITION BY event_type, bkt ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_in
      FROM hist
    ), bkt_off AS (
      SELECT event_type, bkt, COALESCE(SUM(bn) OVER (
               PARTITION BY event_type ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM (SELECT event_type, bkt, SUM(nt) AS bn
            FROM hist GROUP BY event_type, bkt)
    ), agg AS (
      SELECT i.event_type,
             SUM(i.nt) AS n,
             CAST(SUM(CAST(i.npos AS DECIMAL(38,0))
                      * (2 * (i.cum_in + o.off) + i.nt + 1))
                  AS DECIMAL(38,0)) AS wp2
      FROM in_bkt i JOIN bkt_off o
        ON i.event_type = o.event_type AND i.bkt = o.bkt
      GROUP BY i.event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           (CAST(wp2 AS DOUBLE) / 2) AS w_plus,
           ((CAST(wp2 AS DOUBLE) / 2 - n * (n + 1.0) / 4)
                 / SQRT(n * (n + 1.0) * (2 * n + 1) / 24)) AS z_wilcoxon
    FROM agg ORDER BY event_type
    """,
    desc="Wilcoxon signed-rank test on week-over-week paired daily "
         "means per event type: pair day d with day d+7 (same "
         "weekday, so weekday seasonality cancels by construction), "
         "drop zero diffs, midrank |diff| and sum the positive-diff "
         "ranks into W+ with the normal-approximation z — the "
         "nonparametric PAIRED test q_mann_whitney's unpaired U "
         "cannot replace when each day serves as its own control "
         "(q_welch_ttest needs normality this test doesn't). Diffs "
         "are exact integer cents; ranks come from the shared "
         "two-level midrank construction (operators/ranking."
         "doubled_midranks on the Spark side, its SQL mirror in the "
         "oracle) over the tiny |diff| histogram — no whole-series "
         "window; W+ accumulates DECIMAL(38,0) doubled ranks.",
    tags=["events", "stats", "window", "join", "agg"],
)
def q_wilcoxon_signed_rank(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (col("a.event_type") == col("b.event_type"))
            & (col("b.day") == F.date_add(col("a.day"), 7)),
        )
        .select(
            col("a.event_type").alias("event_type"),
            (col("b.mc") - col("a.mc")).alias("d"),
        )
        .filter(col("d") != 0)
    )
    hist = pairs.groupBy(
        "event_type",
        F.abs(col("d")).alias("v"),
        (F.abs(col("d")) / 1000).cast("long").alias("bkt"),
    ).agg(
        F.count("*").alias("nt"),
        F.count(F.when(col("d") > 0, 1)).alias("npos"),
    )
    ranked = ranking.doubled_midranks(hist, ["event_type"])
    agg = ranked.groupBy("event_type").agg(
        F.sum("nt").alias("n"),
        F.sum(col("npos").cast("decimal(38,0)") * col("mr2"))
        .cast("decimal(38,0)").alias("wp2"),
    )
    nd = col("n").cast("double")
    w_plus = col("wp2").cast("double") / 2
    z = (w_plus - nd * (nd + 1) / 4) / F.sqrt(
        nd * (nd + 1) * (2 * col("n") + 1) / 24
    )
    return agg.select(
        "event_type",
        col("n").cast("long").alias("n_pairs"),
        (w_plus).alias("w_plus"),
        (z).alias("z_wilcoxon"),
    ).orderBy("event_type")
