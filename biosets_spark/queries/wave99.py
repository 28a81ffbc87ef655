"""Ninety-ninth-wave query inventory: unseen species and growth
horizons — CHAO1 RICHNESS with Good's coverage per source (the
lower-bound estimate of TOTAL vocabulary V + n1^2/(2 n2) from
singleton/doubleton counts, plus coverage C = 1 - n1/N: Good-Turing
(q_good_turing) prices the unseen MASS, Chao1 counts the unseen
TYPES — together they answer 'how much vocabulary does this source
still hide', the crawl-more-or-stop decision) and the REVENUE
DOUBLING TIME per segment (ln 2 over the OLS slope of ln daily
revenue on day index: the growth-horizon number executives actually
quote, turning q_forecast_revenue's slope into calendar time, with
the R^2 that says whether exponential growth is even the right
model).

Determinism discipline: all type counts are exact integers and
Chao1/coverage single closed forms; daily revenues are exact cents
with ln terms quantized the 1e-8 grid ->DECIMAL before the OLS sums; day
indices are exact epoch-day integers; slope, doubling time and R^2
are closing closed forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

from ..oracle_fragments import TOKS_SQL as _TOKS_SQL
_LN2 = 0.6931471805599453


@q(
    "q_chao1_richness",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ), freq AS (
      SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), stats AS (
      SELECT source,
             COUNT(*) AS v,
             SUM(c) AS n,
             COUNT(*) FILTER (WHERE c = 1) AS f1,
             COUNT(*) FILTER (WHERE c = 2) AS f2
      FROM freq GROUP BY source
    )
    SELECT source,
           CAST(v AS BIGINT) AS observed_types,
           CAST(f1 AS BIGINT) AS singletons,
           CAST(f2 AS BIGINT) AS doubletons,
           (v + CAST(f1 AS DOUBLE) * f1
                     / NULLIF(2.0 * f2, 0)) AS chao1_estimate,
           (1 - CAST(f1 AS DOUBLE) / n) AS good_coverage
    FROM stats ORDER BY source
    """,
    desc="Chao1 vocabulary-richness estimate per source: observed "
         "types plus f1^2/(2 f2) from singleton/doubleton counts — "
         "the nonparametric LOWER BOUND on total vocabulary the "
         "source would reveal with infinite crawling — next to "
         "Good's coverage 1 - f1/N (the probability the next token "
         "is an already-seen type). Together with q_good_turing "
         "(unseen MASS) and q_heaps_law (growth CURVE) this "
         "completes the crawl-more-or-stop toolkit: a source with "
         "chao1 >> observed and low coverage still hides "
         "vocabulary. The corpus collapses to (source, token) "
         "counts; singleton/doubleton tallies are one combinable "
         "agg over the vocabulary table; both estimates are closed "
         "forms (f2 = 0 yields NULL by the NULLIF convention).",
    tags=["text", "stats", "agg"],
)
def q_chao1_richness(spark, sf_dir):
    from ..operators.text import tokens

    docs = tables.load(spark, sf_dir, "documents").select("source", "text")
    freq = (
        docs.select("source", F.explode(tokens(col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    stats = freq.groupBy("source").agg(
        F.count("*").alias("v"),
        F.sum("c").alias("n"),
        F.count(F.when(col("c") == 1, 1)).alias("f1"),
        F.count(F.when(col("c") == 2, 1)).alias("f2"),
    )
    return stats.select(
        "source",
        col("v").cast("long").alias("observed_types"),
        col("f1").cast("long").alias("singletons"),
        col("f2").cast("long").alias("doubletons"),
        (col("v")
            + col("f1").cast("double") * col("f1")
            / F.nullif((2.0 * col("f2")).cast("double"), F.lit(0.0))).alias("chao1_estimate"),
        (1 - col("f1").cast("double") / col("n"))
        .alias("good_coverage"),
    ).orderBy("source")


@q(
    "q_doubling_time",
    oracle=f"""
    WITH daily AS (
      SELECT c.c_mktsegment AS seg,
             date_diff('day', DATE '1970-01-01',
                       CAST(o.o_orderdate AS DATE)) AS x,
             SUM(CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), lp AS (
      SELECT seg, x,
             CAST(FLOOR((LN(CAST(cents AS DOUBLE))) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS y
      FROM daily
    ), mom AS (
      SELECT seg, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(FLOOR(x * CAST(y AS DOUBLE) * 1e6 + 0.5)
                           AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(FLOOR(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
                                 * 1e8 + 0.5)
                           AS DECIMAL(38,0))) AS DOUBLE) / 1e8 AS syy
      FROM lp GROUP BY seg
    )
    SELECT seg AS c_mktsegment,
           CAST(n AS BIGINT) AS n_days,
           ((n * sxy - sx * sy) / (n * sxx - sx * sx))
             AS daily_log_slope,
           ({_LN2} / NULLIF((n * sxy - sx * sy)
                                 / (n * sxx - sx * sx), 0))
             AS doubling_time_days,
           (POWER(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
             AS r_squared
    FROM mom ORDER BY seg
    """,
    desc="Revenue doubling time per segment: OLS of ln(daily revenue) "
         "on the day index gives the exponential growth rate; ln 2 "
         "over the slope is the DOUBLING TIME in days (negative = "
         "halving time), with R^2 saying whether exponential growth "
         "even fits — the calendar-time growth horizon that turns "
         "q_forecast_revenue's abstract slope into the number "
         "executives quote, and near-zero R^2 (as flat synthetic "
         "revenue produces) is the honest 'no trend' verdict. Daily "
         "cents are exact integer sums; ln terms quantize "
         "the 1e-8 grid ->DECIMAL and cross-products quantize onto the "
         "engine-identical FLOOR(x*K+0.5) integer grid before "
         "the per-segment sums (q_ols_normal_eq discipline); slope, "
         "doubling time and R^2 are single closed forms.",
    tags=["stats", "join", "agg"],
)
def q_doubling_time(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    epoch = F.datediff(col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    daily = (
        o.join(
            broadcast(c.select("c_custkey", "c_mktsegment")),
            col("o_custkey") == col("c_custkey"),
        )
        .groupBy(col("c_mktsegment").alias("seg"), epoch.alias("x"))
        .agg(
            F.sum(dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    y = (dfloor((F.log(col("cents").cast("double"))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    lp = daily.select("seg", "x", y.alias("y"))
    yd = col("y").cast("double")
    mom = lp.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        (F.sum(F.floor(col("x") * yd * F.lit(1e6) + F.lit(0.5))
               .cast("decimal(38,0)"))
         .cast("double") / F.lit(1e6)).alias("sxy"),
        F.sum(col("x").cast("decimal(38,0)") * col("x")).cast("double")
        .alias("sxx"),
        (F.sum(F.floor(yd * yd * F.lit(1e8) + F.lit(0.5))
               .cast("decimal(38,0)"))
         .cast("double") / F.lit(1e8)).alias("syy"),
    )
    nd = col("n").cast("double")
    # try_divide: a segment with one active day has zero x-variance;
    # slope/r2 are NULL, matching the oracle's x/0 = NULL
    slope = F.try_divide(
        nd * col("sxy") - col("sx") * col("sy"),
        nd * col("sxx") - col("sx") * col("sx"),
    )
    r2 = F.try_divide(
        F.pow(nd * col("sxy") - col("sx") * col("sy"), 2),
        (nd * col("sxx") - col("sx") * col("sx"))
        * (nd * col("syy") - col("sy") * col("sy")),
    )
    return mom.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("n_days"),
        (slope).alias("daily_log_slope"),
        (_LN2 / F.nullif(slope, F.lit(0.0)))
        .alias("doubling_time_days"),
        (r2).alias("r_squared"),
    ).orderBy("c_mktsegment")
