"""Seventy-fifth-wave query inventory: directional association and
mean reversion — THEIL'S UNCERTAINTY COEFFICIENT U(lang|source)
(the asymmetric categorical association: what fraction of language
uncertainty does knowing the source remove? q_cramers_v and
q_mutual_information are symmetric by construction; U splits the
direction, which is what a pipeline asks when deciding whether
source routing can replace language ID) and the AR(1) UNIT-ROOT
check (the lag-1 autoregression rho with the Dickey-Fuller-style
t = (rho-1)/se per event type: rho near 1 means shocks persist and
q_control_chart's fixed center line is the wrong model; rho well
below 1 means mean reversion and yesterday's spike self-corrects).

Determinism discipline: count cells are exact integers; entropy
terms quantize the 1e-12 grid ->DECIMAL(38,12) before their sums; daily
means are exact integer cents; all regression sums are DECIMAL-
accumulated cross-products of integers; rho, se and t are single
closing closed forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q


@q(
    "q_theils_u",
    oracle="""
    WITH cells AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ), tot AS (
      SELECT SUM(n) AS nt FROM cells
    ), hl AS (
      SELECT CAST(SUM(CAST(FLOOR((-(CAST(ln_.n AS DOUBLE) / t.nt)
                 * LN(CAST(ln_.n AS DOUBLE) / t.nt)) * 1e12 + 0.5) / 1e12
               AS DECIMAL(38,12))) AS DOUBLE) AS h_lang
      FROM (SELECT lang, SUM(n) AS n FROM cells GROUP BY lang) ln_, tot t
    ), hls AS (
      SELECT CAST(SUM(CAST(FLOOR((-(CAST(c.n AS DOUBLE) / t.nt)
                 * LN(CAST(c.n AS DOUBLE) / s.ns)) * 1e12 + 0.5) / 1e12
               AS DECIMAL(38,12))) AS DOUBLE) AS h_lang_given_src
      FROM cells c
      JOIN (SELECT source, SUM(n) AS ns FROM cells GROUP BY source) s
        ON c.source = s.source
      CROSS JOIN tot t
    )
    SELECT CAST((SELECT nt FROM tot) AS BIGINT) AS n_docs,
           (hl.h_lang) AS h_lang,
           (hls.h_lang_given_src) AS h_lang_given_source,
           ((hl.h_lang - hls.h_lang_given_src) / hl.h_lang)
             AS theils_u
    FROM hl, hls
    """,
    desc="Theil's uncertainty coefficient U(lang|source): 1 - "
         "H(lang|source)/H(lang) — the DIRECTIONAL categorical "
         "association (how much language uncertainty does knowing "
         "the source remove), the asymmetric complement to "
         "q_cramers_v and q_mutual_information that answers whether "
         "source routing could substitute for language ID (U near 1) "
         "or the two labels are independent (U near 0). The corpus "
         "collapses to a tiny (source, lang) cell table; both "
         "entropies are sums of the 1e-12 grid ->DECIMAL-quantized "
         "closed-form terms over exact integer ratios, so no "
         "accumulation order exists; one closing ratio.",
    tags=["text", "stats", "agg", "cross"],
)
def q_theils_u(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    tot = cells.agg(F.sum("n").alias("nt"))
    lang_m = cells.groupBy("lang").agg(F.sum("n").alias("nl"))
    src_m = cells.groupBy(col("source").alias("src")).agg(
        F.sum("n").alias("ns")
    )
    pl = col("nl").cast("double") / col("nt")
    h_lang = (
        lang_m.crossJoin(broadcast(tot))
        .select((dfloor((-pl * F.log(pl)) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("t"))
        .agg(F.sum("t").cast("double").alias("h_lang"))
    )
    pj = col("n").cast("double") / col("nt")
    pc = col("n").cast("double") / col("ns")
    h_cond = (
        cells.join(broadcast(src_m), col("source") == col("src"))
        .crossJoin(broadcast(tot))
        .select((dfloor((-pj * F.log(pc)) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast("decimal(38,12)").alias("t"))
        .agg(F.sum("t").cast("double").alias("h_cond"))
    )
    return (
        tot.crossJoin(broadcast(h_lang))
        .crossJoin(broadcast(h_cond))
        .select(
            col("nt").cast("long").alias("n_docs"),
            (col("h_lang")).alias("h_lang"),
            (col("h_cond")).alias("h_lang_given_source"),
            ((col("h_lang") - col("h_cond")) / col("h_lang")).alias("theils_u"),
        )
    )


@q(
    "q_unit_root_ar1",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), lagged AS (
      SELECT event_type, day, mc AS y,
             LAG(mc) OVER (PARTITION BY event_type ORDER BY day) AS x
      FROM daily
    ), pairs AS (
      SELECT event_type, y, x FROM lagged WHERE x IS NOT NULL
    ), s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY event_type
    ), fit AS (
      SELECT event_type, n,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS rho,
             sx, sy, sxy, sxx, syy
      FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           (rho) AS rho,
           ((rho - 1)
                 / SQRT(((syy - sy * sy / n)
                         - rho * (sxy - sx * sy / n)) / (n - 2)
                        / (sxx - sx * sx / n))) AS df_t,
           rho < 1
           AND (rho - 1)
               / SQRT(((syy - sy * sy / n)
                       - rho * (sxy - sx * sy / n)) / (n - 2)
                      / (sxx - sx * sx / n)) < -2.99
             AS mean_reverting_5pct
    FROM fit ORDER BY event_type
    """,
    desc="AR(1) unit-root check per event type: OLS of today's daily "
         "mean on yesterday's gives rho and the Dickey-Fuller-style "
         "t = (rho-1)/se, flagged against the DF 5% critical value "
         "-2.99 (constant-only case) — rho near 1 means shocks "
         "PERSIST (q_control_chart's fixed center line is the wrong "
         "model and q_cusum_changepoint will false-alarm), rho well "
         "below 1 means mean reversion. Daily means are exact "
         "integer cents; every OLS sum is a DECIMAL(38,0)-"
         "accumulated cross-product of integers (order-free); rho, "
         "se and t are single closed forms — the q_ols_normal_eq "
         "discipline applied to the lag regression. The event "
         "stream collapses once; the lag window partitions by type "
         "over the tiny daily table.",
    tags=["events", "stats", "window", "agg"],
)
def q_unit_root_ar1(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = (
        daily.select(
            "event_type", col("mc").alias("y"),
            F.lag("mc").over(w).alias("x"),
        )
        .filter(col("x").isNotNull())
    )
    xd = col("x").cast("decimal(38,0)")
    yd = col("y").cast("decimal(38,0)")
    s = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * col("y")).cast("double").alias("sxy"),
        F.sum(xd * col("x")).cast("double").alias("sxx"),
        F.sum(yd * col("y")).cast("double").alias("syy"),
    )
    nd = col("n").cast("double")
    rho = (nd * col("sxy") - col("sx") * col("sy")) / (
        nd * col("sxx") - col("sx") * col("sx")
    )
    sse = (col("syy") - col("sy") * col("sy") / nd) - rho * (
        col("sxy") - col("sx") * col("sy") / nd
    )
    se = F.sqrt(sse / (nd - 2) / (col("sxx") - col("sx") * col("sx") / nd))
    df_t = (rho - 1) / se
    return s.select(
        "event_type",
        col("n").cast("long").alias("n_pairs"),
        (rho).alias("rho"),
        (df_t).alias("df_t"),
        ((rho < 1) & (df_t < -2.99)).alias("mean_reverting_5pct"),
    ).orderBy("event_type")
