"""Twenty-ninth-wave query inventory: the Poisson bootstrap — THE
scalable resampling construction (each row's multiplicity in resample
b is an independent Poisson(1) draw, so resamples stream in one pass
instead of materializing n-out-of-n index vectors), made fully
deterministic and CHEAP: one md5 seed per row (the audited portable
hash), then the 64 per-resample uniforms come from a Lehmer/minstd
generator step — u_b = seed * 48271^(b+1) mod (2^31 - 1) — pure
integer arithmetic both engines compute identically, ~6x cheaper than
hashing every (row, resample) pair.

Determinism discipline (queries.py header): multiplicities are exact
integers from a CASE inverse-CDF ladder over the Lehmer uniform; each
resample mean is an EXACT integer ratio (integer multiplicity times
integer cents, LONG-summed, one double expression); only the final
CI percentiles interpolate over the 64 exact means.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from ..operators.dedup import portable_hash60
from . import dfloor, q

# minstd multipliers 48271^(b+1) mod (2^31 - 1), precomputed so the
# per-row work is one 31-bit modular multiply per resample.
_M31 = 2147483647
_LEHMER = [(0, 48271), (1, 182605794), (2, 1291394886), (3, 1914720637), (4, 2078669041), (5, 407355683), (6, 1105902161), (7, 854716505), (8, 564586691), (9, 1596680831), (10, 192302371), (11, 1203428207), (12, 1250328747), (13, 1738531149), (14, 1271135913), (15, 1098894339), (16, 1882556969), (17, 2136927794), (18, 1559527823), (19, 2075782095), (20, 638022372), (21, 914937185), (22, 1931656580), (23, 1402304087), (24, 1936030137), (25, 2064876628), (26, 353718330), (27, 1842513780), (28, 1947433875), (29, 631416347), (30, 2010567813), (31, 890442452), (32, 662405787), (33, 1105724094), (34, 849178936), (35, 1696049367), (36, 1479919876), (37, 1168816941), (38, 1272185027), (39, 201068705), (40, 1308858262), (41, 928270262), (42, 1287522347), (43, 1814467857), (44, 1057382352), (45, 1659675143), (46, 153892771), (47, 412013968), (48, 480194461), (49, 1675824860), (50, 180318217), (51, 389431516), (52, 1324346645), (53, 1243696899), (54, 1587659744), (55, 674592135), (56, 942409124), (57, 884730203), (58, 1951824771), (59, 2130959757), (60, 1239222494), (61, 352020689), (62, 1500063655), (63, 719080959)]

# Inverse CDF of Poisson(1), truncated at 6 (cum P ~ 0.999917).
_CASE_SQL = (
    "CASE WHEN u < 0.36787944 THEN 0 WHEN u < 0.73575888 THEN 1 "
    "WHEN u < 0.91969860 THEN 2 WHEN u < 0.98101184 THEN 3 "
    "WHEN u < 0.99634015 THEN 4 WHEN u < 0.99940582 THEN 5 ELSE 6 END"
)

_POIS_CUM = [0.36787944, 0.73575888, 0.91969860, 0.98101184,
             0.99634015, 0.99940582]


@q(
    "q_bootstrap_ci",
    oracle=f"""
    WITH lehmer(b, ab) AS (
      VALUES
        (0, 48271),
        (1, 182605794),
        (2, 1291394886),
        (3, 1914720637),
        (4, 2078669041),
        (5, 407355683),
        (6, 1105902161),
        (7, 854716505),
        (8, 564586691),
        (9, 1596680831),
        (10, 192302371),
        (11, 1203428207),
        (12, 1250328747),
        (13, 1738531149),
        (14, 1271135913),
        (15, 1098894339),
        (16, 1882556969),
        (17, 2136927794),
        (18, 1559527823),
        (19, 2075782095),
        (20, 638022372),
        (21, 914937185),
        (22, 1931656580),
        (23, 1402304087),
        (24, 1936030137),
        (25, 2064876628),
        (26, 353718330),
        (27, 1842513780),
        (28, 1947433875),
        (29, 631416347),
        (30, 2010567813),
        (31, 890442452),
        (32, 662405787),
        (33, 1105724094),
        (34, 849178936),
        (35, 1696049367),
        (36, 1479919876),
        (37, 1168816941),
        (38, 1272185027),
        (39, 201068705),
        (40, 1308858262),
        (41, 928270262),
        (42, 1287522347),
        (43, 1814467857),
        (44, 1057382352),
        (45, 1659675143),
        (46, 153892771),
        (47, 412013968),
        (48, 480194461),
        (49, 1675824860),
        (50, 180318217),
        (51, 389431516),
        (52, 1324346645),
        (53, 1243696899),
        (54, 1587659744),
        (55, 674592135),
        (56, 942409124),
        (57, 884730203),
        (58, 1951824771),
        (59, 2130959757),
        (60, 1239222494),
        (61, 352020689),
        (62, 1500063655),
        (63, 719080959)
    ), seeded AS (
      SELECT o_orderkey,
             (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
               % {_M31}) AS seed,
             CAST(FLOOR((o_totalprice * 100) + 0.5) AS BIGINT) AS pc
      FROM orders
    ), draws AS (
      SELECT l.b, s.pc, ((s.seed * l.ab) % {_M31}) / 2147483647.0 AS u
      FROM seeded s CROSS JOIN lehmer l
    ), weighted AS (
      SELECT b, {{case}} AS m, pc FROM draws
    ), means AS (
      SELECT b, CAST(SUM(m * pc) AS DOUBLE) / (100.0 * SUM(m)) AS mean_b
      FROM weighted GROUP BY b HAVING SUM(m) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples,
           (CAST(SUM(CAST(FLOOR((mean_b) * 1e8 + 0.5) / 1e8 AS DECIMAL(24,8))) AS DOUBLE) / COUNT(*))
             AS boot_mean,
           (quantile_cont(mean_b, 0.025)) AS ci_lo,
           (quantile_cont(mean_b, 0.975)) AS ci_hi
    FROM means
    """.format(case=_CASE_SQL),
    desc="Poisson-bootstrap 95% confidence interval for the mean "
         "order value, 64 resamples: each row's multiplicity in "
         "resample b is an inverse-CDF Poisson(1) draw from a Lehmer "
         "uniform seeded by the row's md5 hash (deterministic — every "
         "engine and every run reproduces the identical resamples; "
         "one hash per ROW, one 31-bit modular multiply per draw), so "
         "the whole bootstrap is ONE streaming pass with a combinable "
         "(b)-keyed agg; no n-sized index vectors, no per-resample "
         "shuffles — the construction that makes bootstrapping "
         "feasible at 100 TB. Each resample mean is an exact integer-"
         "cents ratio accumulated in LONG arithmetic (the decimal "
         "cells were the measured cost center); only the final CI "
         "percentiles interpolate over the "
         "64 exact means. The cross tag covers the 64-row broadcast "
         "multiplier table.",
    tags=["agg", "sample", "cross"],
)
def q_bootstrap_ci(spark, sf_dir):
    # spread() BEFORE the 64x fan-out: a compact source (one parquet
    # file locally; one coalesced scan task generally) would otherwise
    # push the whole multiply-accumulate through a handful of cores.
    # One cheap shuffle of the thin (key, price) projection buys full
    # parallelism for the 64x CPU work after it (12.6 s -> 2.3 s at
    # sf0.1).
    from ..operators.dedup import spread

    o = spread(
        tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    lehmer = spark.createDataFrame(_LEHMER, "b int, ab long")
    seeded = o.select(
        F.pmod(portable_hash60(col("o_orderkey").cast("string")), lit(_M31)).alias("seed"),
        # integer cents: the 9.6M-row multiply-accumulate runs in LONG
        # arithmetic (exact; decimal cells were the cost center)
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("pc"),
    )
    u = ((col("seed") * col("ab")) % _M31) / 2147483647.0
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
        seeded.crossJoin(broadcast(lehmer))
        .withColumn("u", u)
        .select("b", m.alias("m"), "pc")
    )
    means = (
        weighted.groupBy("b")
        .agg(
            (F.sum(col("m") * col("pc")).cast("double")
             / (100.0 * F.sum("m"))).alias("mean_b"),
            F.sum("m").alias("w"),
        )
        .filter(col("w") > 0)
    )
    return means.agg(
        F.count("*").alias("n_resamples"),
        (F.sum((dfloor((col("mean_b")) * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).cast("decimal(24,8)")).cast("double") / F.count("*")).alias("boot_mean"),
        (F.expr("percentile(mean_b, 0.025)")).alias("ci_lo"),
        (F.expr("percentile(mean_b, 0.975)")).alias("ci_hi"),
    )
