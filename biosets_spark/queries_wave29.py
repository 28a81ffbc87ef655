"""Twenty-ninth-wave query inventory: the Poisson bootstrap — THE
scalable resampling construction (each row's multiplicity in resample
b is an independent Poisson(1) draw, so resamples stream in one pass
instead of materializing n-out-of-n index vectors), made fully
deterministic by driving the draws from the audited md5 uniform.

Determinism discipline (queries.py header): multiplicities are exact
integers from a CASE inverse-CDF ladder over the portable uniform;
each resample mean is an EXACT decimal ratio (integer multiplicity
times decimal price, decimal-summed, one double division); only the
final CI percentiles interpolate over the 64 exact means.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from . import tables
from .operators.dedup import portable_hash60
from .queries import q

# Inverse CDF of Poisson(1), truncated at 6 (cum P ~ 0.999917):
# thresholds are cumulative e^-1 * sum 1/k!.
_POIS_CUM = [0.36787944, 0.73575888, 0.91969860, 0.98101184,
             0.99634015, 0.99940582]

_CASE_SQL = (
    "CASE WHEN u < 0.36787944 THEN 0 WHEN u < 0.73575888 THEN 1 "
    "WHEN u < 0.91969860 THEN 2 WHEN u < 0.98101184 THEN 3 "
    "WHEN u < 0.99634015 THEN 4 WHEN u < 0.99940582 THEN 5 ELSE 6 END"
)


@q(
    "q_bootstrap_ci",
    oracle=f"""
    WITH draws AS (
      SELECT b.b, o.o_orderkey, o.o_totalprice,
             ((('0x' || substr(md5(CAST(b.b AS VARCHAR) || '_' ||
                                  CAST(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % 1000000) + 1) / 1000000.0 AS u
      FROM orders o CROSS JOIN (SELECT unnest(range(64)) AS b) b
    ), weighted AS (
      SELECT b, {_CASE_SQL} AS m, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM draws
    ), means AS (
      SELECT b,
             CAST(SUM(m * p) AS DOUBLE) / SUM(m) AS mean_b
      FROM weighted GROUP BY b HAVING SUM(m) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
           ROUND(CAST(SUM(CAST(mean_b AS DECIMAL(24,8))) AS DOUBLE) / COUNT(*), 4)
             AS boot_mean,
           ROUND(quantile_cont(mean_b, 0.025), 4) AS ci_lo,
           ROUND(quantile_cont(mean_b, 0.975), 4) AS ci_hi
    FROM means
    """,
    desc="Poisson-bootstrap 95% confidence interval for the mean "
         "order value, 64 resamples: each row's multiplicity in "
         "resample b is an inverse-CDF Poisson(1) draw from the "
         "audited md5 uniform (deterministic — every engine and every "
         "run reproduces the identical resamples), so the whole "
         "bootstrap is ONE streaming pass with a combinable "
         "(b)-keyed agg; no n-sized index vectors, no per-resample "
         "shuffles — the construction that makes bootstrapping "
         "feasible at 100 TB (fan-out x64 in CPU, 64 rows out of the "
         "map-side combine per task). Each resample mean is an exact "
         "decimal ratio; only the final CI percentiles interpolate "
         "over the 64 exact means. The cross tag covers the 64-row "
         "broadcast resample index.",
    tags=["agg", "sample", "cross"],
)
def q_bootstrap_ci(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = spark.range(64).select(col("id").alias("b"))
    u = (
        F.pmod(
            portable_hash60(
                F.concat(col("b").cast("string"), lit("_"), col("o_orderkey").cast("string"))
            ),
            lit(1000000),
        ) + 1
    ) / 1000000.0
    m = (
        F.when(col("u") < _POIS_CUM[0], 0)
        .when(col("u") < _POIS_CUM[1], 1)
        .when(col("u") < _POIS_CUM[2], 2)
        .when(col("u") < _POIS_CUM[3], 3)
        .when(col("u") < _POIS_CUM[4], 4)
        .when(col("u") < _POIS_CUM[5], 5)
        .otherwise(6)
    )
    weighted = (
        o.crossJoin(broadcast(b))
        .withColumn("u", u)
        .select("b", m.alias("m"), col("o_totalprice").cast("decimal(18,2)").alias("p"))
    )
    means = (
        weighted.groupBy("b")
        .agg(
            (F.sum(col("m") * col("p")).cast("double") / F.sum("m")).alias("mean_b"),
            F.sum("m").alias("w"),
        )
        .filter(col("w") > 0)
    )
    return means.agg(
        F.count("*").alias("n_resamples"),
        F.round(
            F.sum(col("mean_b").cast("decimal(24,8)")).cast("double") / F.count("*"), 4
        ).alias("boot_mean"),
        F.round(F.expr("percentile(mean_b, 0.025)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(mean_b, 0.975)"), 4).alias("ci_hi"),
    )
