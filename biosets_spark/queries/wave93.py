"""Ninety-third-wave query inventory: multiple-testing control —
the BONFERRONI FAMILY-WISE summary over the five per-type
Mann-Kendall trend z's (how many 'significant trends' survive when
the threshold accounts for running FIVE tests: the first thing a
reviewer does to a dashboard full of stars) and BENJAMINI-HOCHBERG
FDR control on the same family (the step-up procedure executed
directly on |z| against a fixed z-quantile ladder — no p-values
needed, so the whole procedure stays closed-form: the modern
default that keeps power Bonferroni gives away).

Both queries rank the SAME statistics q_mann_kendall reports, so
the family is real, not synthetic.

Determinism discipline: the z's are the exact q_mann_kendall closed
forms over integer sign sums; both threshold ladders are fixed
two-sided normal quantile literals (alpha = .05: Bonferroni
z = 2.575829 at alpha/5; BH ladder 2.575829, 2.326348, 2.170090,
2.053749, 1.959964 for i = 1..5); ranks order by (|z| DESC, type).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

# two-sided normal quantiles for alpha * i / 5, i = 1..5, alpha = .05
_BH_LADDER = (2.575829, 2.326348, 2.170090, 2.053749, 1.959964)

_MK_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                        AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS m
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), pairs AS (
      SELECT a.event_type,
             CASE WHEN b.m > a.m THEN 1
                  WHEN b.m < a.m THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ), s AS (
      SELECT event_type, SUM(sgn) AS s_stat FROM pairs GROUP BY event_type
    ), ties AS (
      SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
      FROM (SELECT event_type, m, COUNT(*) AS t FROM daily GROUP BY 1, 2)
      GROUP BY event_type
    ), n AS (
      SELECT event_type, COUNT(*) AS nd FROM daily GROUP BY event_type
    ), zs AS (
      SELECT s.event_type,
             CASE
               WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                 / SQRT((n.nd * (n.nd - 1.0) * (2 * n.nd + 5)
                         - ties.tie_term) / 18)
               WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                 / SQRT((n.nd * (n.nd - 1.0) * (2 * n.nd + 5)
                         - ties.tie_term) / 18)
               ELSE 0 END AS z
      FROM s JOIN ties ON s.event_type = ties.event_type
      JOIN n ON s.event_type = n.event_type
    )
"""


@q(
    "q_bonferroni_family",
    oracle=_MK_SQL + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tests,
           CAST(COUNT(*) FILTER (WHERE ABS(z) > 1.959964) AS BIGINT)
             AS n_raw_5pct,
           CAST(COUNT(*) FILTER (WHERE ABS(z) > 2.575829) AS BIGINT)
             AS n_bonferroni_5pct,
           FLOOR((MAX(ABS(z))) * 1e6 + 0.5) / 1e6 AS max_abs_z
    FROM zs
    """,
    desc="Bonferroni family-wise summary of the five Mann-Kendall "
         "trend tests: how many types are 'significant' at the raw "
         "per-test 5% threshold (|z| > 1.959964) vs the family-wise "
         "threshold alpha/5 (|z| > 2.575829) — the correction that "
         "deflates a dashboard's star count to what survives "
         "running five tests at once; the gap between the two "
         "counts IS the multiplicity inflation. Reuses "
         "q_mann_kendall's exact closed-form z's (integer sign "
         "sums, tie-corrected variance); thresholds are fixed "
         "normal-quantile literals; one count agg over a 5-row "
         "table.",
    tags=["events", "stats", "join", "agg"],
)
def q_bonferroni_family(spark, sf_dir):
    zs = _mk_zs(spark, sf_dir)
    return zs.agg(
        F.count("*").cast("long").alias("n_tests"),
        F.count(F.when(F.abs(col("z")) > 1.959964, 1)).cast("long")
        .alias("n_raw_5pct"),
        F.count(F.when(F.abs(col("z")) > 2.575829, 1)).cast("long")
        .alias("n_bonferroni_5pct"),
        (dfloor((F.max(F.abs(col("z")))) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("max_abs_z"),
    )


def _mk_zs(spark, sf_dir):
    """Shared Mann-Kendall z computation (mirrors q_mann_kendall)."""
    daily = (
        tables.load(spark, sf_dir, "events")
        .groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(col("b.m") > col("a.m"), 1)
        .when(col("b.m") < col("a.m"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            b,
            (col("a.event_type") == col("b.event_type"))
            & (col("a.day") < col("b.day")),
        )
        .groupBy(col("a.event_type").alias("event_type"))
        .agg(F.sum(sgn).alias("s_stat"))
    )
    ties = (
        daily.groupBy("event_type", "m").agg(F.count("*").alias("t"))
        .groupBy(col("event_type").alias("et_t"))
        .agg(F.sum(col("t") * (col("t") - 1) * (2 * col("t") + 5))
             .alias("tie_term"))
    )
    n = daily.groupBy(col("event_type").alias("et_n")).agg(
        F.count("*").alias("nd")
    )
    j = (
        s.join(broadcast(ties), col("event_type") == col("et_t"))
        .join(broadcast(n), col("event_type") == col("et_n"))
    )
    nd = col("nd").cast("double")
    var_s = (nd * (nd - 1) * (2 * col("nd") + 5) - col("tie_term")) / 18
    z = (
        F.when(col("s_stat") > 0, (col("s_stat") - 1) / F.sqrt(var_s))
        .when(col("s_stat") < 0, (col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select("event_type", z.alias("z"))


@q(
    "q_bh_fdr",
    oracle=_MK_SQL + f"""
    , ranked AS (
      SELECT event_type, ABS(z) AS az,
             ROW_NUMBER() OVER (ORDER BY ABS(z) DESC, event_type) AS i
      FROM zs
    ), ladder AS (
      SELECT unnest([1, 2, 3, 4, 5]) AS i,
             unnest([{_BH_LADDER[0]}, {_BH_LADDER[1]}, {_BH_LADDER[2]},
                     {_BH_LADDER[3]}, {_BH_LADDER[4]}]) AS thr
    ), hits AS (
      SELECT MAX(r.i) AS imax
      FROM ranked r JOIN ladder l ON r.i = l.i
      WHERE r.az >= l.thr
    )
    SELECT r.event_type,
           CAST(r.i AS INTEGER) AS abs_z_rank,
           (r.az) AS abs_z,
           (CAST(l.thr AS DOUBLE)) AS bh_threshold,
           COALESCE(r.i <= h.imax, FALSE) AS bh_discovery_5pct
    FROM ranked r
    JOIN ladder l ON r.i = l.i
    CROSS JOIN hits h
    ORDER BY r.i
    """,
    desc="Benjamini-Hochberg FDR control over the five Mann-Kendall "
         "z's, executed WITHOUT p-values: sort |z| descending "
         "against the fixed quantile ladder z(alpha*i/m) for "
         "i = 1..5 and take every test up to the LAST rank whose "
         "|z| clears its rung — exactly the BH step-up procedure, "
         "closed-form because the ladder is five two-sided normal "
         "literals. The modern multiplicity default that keeps the "
         "power q_bonferroni_family's single family-wise threshold "
         "gives away (BH discoveries >= Bonferroni discoveries, an "
         "invariant the test pins). Ranks order by (|z| DESC, "
         "type) over a 5-row table; the step-up max is one "
         "conditional aggregate.",
    tags=["events", "stats", "join", "agg", "window", "cross"],
)
def q_bh_fdr(spark, sf_dir):
    zs = _mk_zs(spark, sf_dir)
    ladder = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(_BH_LADDER)], "i int, thr double"
    )
    # the per-type statistic table is bounded by the event-type
    # DIMENSION, so the global rank is a driver-side sort broadcast
    # back (the q_average_precision bounded-collect pattern) — no
    # empty-partition-spec window
    stat_rows = sorted(
        ((r["event_type"], abs(r["z"])) for r in zs.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    ranked = spark.createDataFrame(
        [(et, az, i + 1) for i, (et, az) in enumerate(stat_rows)],
        "event_type string, az double, i int",
    )
    joined = ranked.join(broadcast(ladder), "i")
    hits = joined.agg(
        F.max(F.when(col("az") >= col("thr"), col("i"))).alias("imax")
    )
    return (
        joined.crossJoin(broadcast(hits))
        .select(
            "event_type",
            col("i").cast("int").alias("abs_z_rank"),
            (col("az")).alias("abs_z"),
            (col("thr")).alias("bh_threshold"),
            F.coalesce(col("i") <= col("imax"), F.lit(False))
            .alias("bh_discovery_5pct"),
        )
        .orderBy("abs_z_rank")
    )
