"""Eighty-ninth-wave query inventory: long memory and fairness —
the HURST EXPONENT via rescaled-range analysis (mean R/S over
blocks of sizes 5/10/15 days, OLS slope of ln(R/S) on ln(size):
H > 0.5 means long-memory persistence that q_autocorrelation's
short lags and q_unit_root_ar1's one-step rho both under-read —
the diagnostic that says whether aggregating to weekly buckets
will actually wash out dependence) and JAIN'S FAIRNESS INDEX of
revenue across suppliers ((sum x)^2 / (n sum x^2): the bounded
[1/n, 1] fairness scalar networking uses, whose reading is
DIRECTLY 'the effective fraction of suppliers sharing the load' —
a different summary than q_hhi_concentration's sum of squared
shares, to which it is exactly inverse-related: J = 1/(n*HHI)).

Determinism discipline: daily means and revenues are exact integer
cents; block statistics use per-block exact decimal sums with
centered-quantized ranges and variances; ln terms are closed forms
over a 3-row size table; Jain's index is one closed form over two
exact decimal sums, and the HHI identity is pinned by the test.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_SIZES = (5, 10, 15)


@q(
    "q_hurst_exponent",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY CAST(ts AS DATE)
    ), idx AS (
      SELECT mc, ROW_NUMBER() OVER (ORDER BY day) - 1 AS i FROM daily
    ), sized AS (
      SELECT s.sz, x.mc, x.i,
             CAST(FLOOR(x.i / s.sz) AS BIGINT) AS blk,
             x.i % s.sz AS pos
      FROM idx x, (SELECT unnest([5, 10, 15]) AS sz) s
    ), blocks AS (
      SELECT sz, blk, COUNT(*) AS n,
             CAST(SUM(CAST(mc AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS mu
      FROM sized GROUP BY sz, blk HAVING COUNT(*) = sz
    ), walks AS (
      SELECT s.sz, s.blk, b.mu,
             SUM(s.mc - b.mu) OVER (PARTITION BY s.sz, s.blk ORDER BY s.pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w,
             CAST(FLOOR((POWER(s.mc - b.mu, 2)) * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6)) AS sq
      FROM sized s JOIN blocks b ON s.sz = b.sz AND s.blk = b.blk
    ), rs AS (
      SELECT sz, blk,
             (MAX(w) - MIN(w))
               / SQRT(CAST(SUM(sq) AS DOUBLE) / sz) AS ratio
      FROM walks GROUP BY sz, blk
    ), per_size AS (
      SELECT sz,
             LN(CAST(SUM(CAST(FLOOR((ratio) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8))) AS DOUBLE)
                / COUNT(*)) AS y,
             LN(CAST(sz AS DOUBLE)) AS x
      FROM rs GROUP BY sz
    ), fit AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM per_size
    )
    SELECT CAST(k AS BIGINT) AS n_sizes,
           ((k * sxy - sx * sy) / (k * sxx - sx * sx))
             AS hurst_h,
           (k * sxy - sx * sy) / (k * sxx - sx * sx) > 0.65
             AS long_memory
    FROM fit
    """,
    desc="Hurst exponent of the pooled daily-mean series by "
         "rescaled-range analysis: for block sizes 5/10/15 days, "
         "each full block's range of mean-centered cumulative sums "
         "over its population sd gives R/S; H is the OLS slope of "
         "ln(mean R/S) on ln(size) — H ~ 0.5 is short memory, "
         "H > 0.65 flags the long-range persistence that "
         "q_autocorrelation's fixed lags and q_unit_root_ar1's "
         "one-step rho under-read (and that makes weekly "
         "aggregation NOT wash out dependence). Day indices come "
         "from one tiny ordered window over the 30-row daily "
         "table; block walks partition by (size, block); R/S "
         "ratios and squared deviations quantize ROUND->DECIMAL "
         "before their sums; the final fit is over a 3-row table.",
    tags=["events", "stats", "window", "agg", "cross"],
)
def q_hurst_exponent(spark, sf_dir):
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    # ~30-row table: a driver-side index assignment avoids even the
    # tiny global ORDER BY window (same bounded-collect rationale as
    # q_average_precision's bucket offsets)
    spark_sess = daily.sparkSession
    rows = sorted((r["day"], r["mc"]) for r in daily.collect())
    idx = spark_sess.createDataFrame(
        [(i, mc) for i, (_, mc) in enumerate(rows)], "i long, mc long"
    )
    sizes = spark_sess.createDataFrame(
        [(s,) for s in _SIZES], "sz long"
    )
    sized = idx.crossJoin(broadcast(sizes)).select(
        "sz", "mc", "i",
        F.floor(col("i") / col("sz")).cast("long").alias("blk"),
        (col("i") % col("sz")).alias("pos"),
    )
    blocks = (
        sized.groupBy("sz", "blk")
        .agg(
            F.count("*").alias("n"),
            (F.sum(col("mc").cast("decimal(38,0)")).cast("double")
             / F.count("*")).alias("mu"),
        )
        .filter(col("n") == col("sz"))
        .select(col("sz").alias("sz_b"), col("blk").alias("blk_b"), "mu")
    )
    w_walk = (
        Window.partitionBy("sz", "blk").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walks = (
        sized.join(
            broadcast(blocks),
            (col("sz") == col("sz_b")) & (col("blk") == col("blk_b")),
        )
        .withColumn("w", F.sum(col("mc") - col("mu")).over(w_walk))
        .withColumn(
            "sq",
            (dfloor((F.pow(col("mc") - col("mu"), 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
            .cast("decimal(38,6)"),
        )
    )
    rs = (
        walks.groupBy("sz", "blk")
        .agg(
            (F.max("w") - F.min("w")).alias("rng"),
            F.sum("sq").cast("double").alias("ssum"),
        )
        .select(
            "sz", "blk",
            (col("rng") / F.sqrt(col("ssum") / col("sz"))).alias("ratio"),
        )
    )
    per_size = rs.groupBy("sz").agg(
        F.log(
            F.sum((dfloor((col("ratio")) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)"))
            .cast("double") / F.count("*")
        ).alias("y"),
    ).select("sz", F.log(col("sz").cast("double")).alias("x"), "y")
    fit = per_size.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(col("x") * col("y")).alias("sxy"),
        F.sum(col("x") * col("x")).alias("sxx"),
    )
    kd = col("k").cast("double")
    h = (kd * col("sxy") - col("sx") * col("sy")) / (
        kd * col("sxx") - col("sx") * col("sx")
    )
    return fit.select(
        col("k").cast("long").alias("n_sizes"),
        (h).alias("hurst_h"),
        (h > 0.65).alias("long_memory"),
    )


@q(
    "q_jain_fairness",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(FLOOR((l_extendedprice * 100) + 0.5) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           (POWER(CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE), 2)
                 / (COUNT(*)
                    * CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
                           AS DOUBLE))) AS jain_index,
           CAST(FLOOR((COUNT(*)
                 * POWER(CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE), 2)
                 / (COUNT(*)
                    * CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
                           AS DOUBLE))) + 0.5) AS BIGINT) AS effective_suppliers
    FROM rev
    """,
    desc="Jain's fairness index of revenue across suppliers: "
         "(sum x)^2 / (n sum x^2), bounded in [1/n, 1], whose "
         "product with n reads DIRECTLY as the effective number of "
         "suppliers sharing the load — the networking-standard "
         "fairness scalar, exactly inverse to q_hhi_concentration "
         "(J = 1/(n*HHI), an identity the test pins) but with the "
         "interpretable absolute scale HHI lacks. Revenues are "
         "exact integer cents; both moments are DECIMAL-accumulated "
         "exact sums from ONE combinable agg; the index is one "
         "closed form.",
    tags=["stats", "agg"],
)
def q_jain_fairness(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dfloor((col("l_extendedprice") * 100) + F.lit(0.5)).cast("long"))
        .alias("cents")
    )
    cd = col("cents").cast("decimal(38,0)")
    agg = rev.agg(
        F.count("*").alias("n"),
        F.sum(cd).cast("double").alias("s1"),
        F.sum(cd * col("cents")).cast("double").alias("s2"),
    )
    jain = F.pow(col("s1"), 2) / (col("n") * col("s2"))
    return agg.select(
        col("n").cast("long").alias("n_suppliers"),
        (jain).alias("jain_index"),
        dfloor((col("n") * jain) + F.lit(0.5)).cast("long").alias("effective_suppliers"),
    )
