"""Ninety-fourth-wave query inventory: survival comparison — the
LOG-RANK TEST between urgent and non-urgent orders' time-to-first-
shipment (the standard two-group survival comparison over risk
sets at every distinct event time: q_survival_km DRAWS one curve,
the log-rank says whether two curves DIFFER, weighting early and
late differences by the population still at risk) and RESTRICTED
MEAN SURVIVAL TIME (mean shipping delay truncated at 30 days per
group with the difference: the modern effect measure reported when
hazards are non-proportional — and with complete observation it
reduces EXACTLY to mean(min(T, tau)), an identity the test pins).

Determinism discipline: delays are exact integer day diffs; risk
sets come from descending cumulative counts over the distinct-delay
table (the CDF construction, windows partitioned by nothing wider
than the bounded delay-bucket scheme is unnecessary here because
the partition key is the GROUP); every O-E and variance term
quantizes ROUND->DECIMAL before the cross-time sums; z and RMST
are single closed forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_TAU = 30

_DELAYS_SQL = """
    WITH delays AS (
      SELECT o.o_orderkey,
             (o.o_orderpriority = '1-URGENT') AS urgent,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(MIN(l.l_shipdate) AS DATE)) AS BIGINT) AS t
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
"""


@q(
    "q_log_rank_test",
    oracle=_DELAYS_SQL + """
    , dist AS (
      SELECT t, COUNT(*) AS d,
             COUNT(*) FILTER (WHERE urgent) AS d1
      FROM delays GROUP BY t
    ), risk AS (
      SELECT t, d, d1,
             SUM(d) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at,
             SUM(d1) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1_at
      FROM dist
    ), terms AS (
      SELECT CAST(FLOOR((d1 - d * (CAST(n1_at AS DOUBLE) / n_at)) * 1e8 + 0.5) / 1e8
                  AS DECIMAL(28,8)) AS oe,
             CAST(FLOOR((CASE WHEN n_at > 1
               THEN d * (CAST(n1_at AS DOUBLE) / n_at)
                    * (1 - CAST(n1_at AS DOUBLE) / n_at)
                    * (n_at - d) / (n_at - 1.0)
               ELSE 0 END) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS v
      FROM risk
    )
    SELECT CAST((SELECT COUNT(*) FROM delays) AS BIGINT) AS n_orders,
           (CAST(SUM(oe) AS DOUBLE)) AS u_stat,
           (CAST(SUM(oe) AS DOUBLE)
                 / SQRT(CAST(SUM(v) AS DOUBLE))) AS z_logrank,
           ABS(CAST(SUM(oe) AS DOUBLE)
               / SQRT(CAST(SUM(v) AS DOUBLE))) > 1.959964
             AS differ_5pct
    FROM terms
    """,
    desc="Log-rank test comparing urgent vs non-urgent orders' "
         "time-to-first-shipment curves: at every distinct delay, "
         "observed urgent events minus expected under one shared "
         "curve (d * n1_at_risk/n_at_risk), with the hypergeometric "
         "variance — U/sqrt(V) is the standard two-group survival "
         "z, risk-set-weighted where a naive mean-delay comparison "
         "(q_welch_ttest) ignores the at-risk structure; "
         "q_survival_km draws the curve this test compares. Delays "
         "are exact integer day diffs; risk sets are descending "
         "cumulative counts over the tiny distinct-delay table "
         "(~120 values, the value-range-bounded CDF construction); "
         "every O-E and V term quantizes the 1e-8 grid ->DECIMAL before "
         "the cross-time sums.",
    tags=["stats", "join", "window", "agg", "cross"],
)
def q_log_rank_test(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    delays = (
        o.join(li, col("o_orderkey") == col("l_orderkey"))
        .groupBy(
            "o_orderkey",
            (col("o_orderpriority") == "1-URGENT").alias("urgent"),
            "o_orderdate",
        )
        .agg(
            F.datediff(F.min("l_shipdate"), col("o_orderdate")).alias("t")
        )
        .select("urgent", "t")
    )
    dist = delays.groupBy("t").agg(
        F.count("*").alias("d"),
        F.count(F.when(col("urgent"), 1)).alias("d1"),
    )
    # the distinct-delay table is bounded by the delay value range
    # (~120 days), so its global descending prefix is the same
    # driver-side bounded collect as q_average_precision's offsets
    rows = sorted(
        ((r["t"], r["d"], r["d1"]) for r in dist.collect()), reverse=True
    )
    out_rows = []
    n_at = n1_at = 0
    for t, d, d1 in rows:
        n_at += d
        n1_at += d1
        out_rows.append((t, d, d1, n_at, n1_at))
    risk = spark.createDataFrame(
        out_rows, "t long, d long, d1 long, n_at long, n1_at long"
    )
    p1 = col("n1_at").cast("double") / col("n_at")
    oe = (dfloor((col("d1") - col("d") * p1) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    v = (dfloor((F.when(
            col("n_at") > 1,
            col("d") * p1 * (1 - p1)
            * (col("n_at") - col("d")) / (col("n_at") - 1.0),
        ).otherwise(F.lit(0.0))) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(28,8)")
    n_orders = delays.agg(F.count("*").alias("n_orders"))
    agg = risk.agg(
        F.sum(oe).cast("double").alias("u"),
        F.sum(v).cast("double").alias("vv"),
    )
    z = col("u") / F.sqrt(col("vv"))
    return agg.crossJoin(broadcast(n_orders)).select(
        col("n_orders").cast("long").alias("n_orders"),
        (col("u")).alias("u_stat"),
        (z).alias("z_logrank"),
        (F.abs(z) > 1.959964).alias("differ_5pct"),
    )


@q(
    "q_rmst",
    oracle=_DELAYS_SQL + f"""
    SELECT urgent,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           (CAST(SUM(LEAST(t, {_TAU})) AS DOUBLE) / COUNT(*))
             AS rmst_30d,
           (CAST(SUM(CASE WHEN t > {_TAU} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*)) AS frac_beyond_tau
    FROM delays GROUP BY urgent ORDER BY urgent
    """,
    desc="Restricted mean survival time of shipping delay at tau = "
         "30 days, per priority group: with every delay fully "
         "observed the RMST integral of the KM curve reduces "
         "EXACTLY to mean(min(T, tau)) — the modern survival effect "
         "measure reported when hazard curves cross (where a "
         "hazard-ratio summary misleads and q_log_rank_test only "
         "gives a yes/no), plus the fraction of orders still "
         "unshipped at tau. Delays are exact integer day diffs and "
         "every statistic an exact integer ratio; one combinable "
         "agg per group after the per-order MIN collapse.",
    tags=["stats", "join", "agg"],
)
def q_rmst(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    delays = (
        o.join(li, col("o_orderkey") == col("l_orderkey"))
        .groupBy(
            "o_orderkey",
            (col("o_orderpriority") == "1-URGENT").alias("urgent"),
            "o_orderdate",
        )
        .agg(
            F.datediff(F.min("l_shipdate"), col("o_orderdate")).alias("t")
        )
        .select("urgent", "t")
    )
    return (
        delays.groupBy("urgent")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.sum(F.least(col("t"), F.lit(_TAU))).cast("double")
                / F.count("*")).alias("rmst_30d"),
            (F.count(F.when(col("t") > _TAU, 1)).cast("double")
                / F.count("*")).alias("frac_beyond_tau"),
        )
        .orderBy("urgent")
    )
