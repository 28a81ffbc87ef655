"""Twenty-seventh-wave query inventory: time-series monitoring
primitives — CUSUM change-point detection over the daily series and
SAX (symbolic aggregate approximation) symbolization for similarity
indexing of series.

Determinism discipline (queries.py header): daily means are exact
decimal ratios; CUSUM is a RUNNING DECIMAL SUM of exact 6-dec
deviations (no FP accumulation at all); SAX breakpoints come from
exact sort-based quantiles of 2-dec quantized inputs, and the symbol
string is assembled in explicit day order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

# Daily mean of 2-dec quantized values per event type: exact decimal
# sum over an exact count, then rounded to 6 — identical in both
# engines (the q_ewma_daily prelude).
_DAILY_SQL = """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)) * 1e6 + 0.5) / 1e6 AS m
        FROM events GROUP BY event_type, CAST(ts AS DATE)
      )
"""


@q(
    "q_cusum_changepoint",
    oracle=_DAILY_SQL + """
    , stats AS (
      SELECT event_type,
             FLOOR((CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6
               AS mu
      FROM daily GROUP BY event_type
    ), cusum AS (
      SELECT d.event_type, d.day,
             SUM(CAST(FLOOR((d.m - s.mu) * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6)))
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS UNBOUNDED PRECEDING) AS c
      FROM daily d JOIN stats s ON d.event_type = s.event_type
    ), flagged AS (
      SELECT event_type, day, c,
             MAX(ABS(c)) OVER (PARTITION BY event_type) AS cmax
      FROM cusum
    )
    SELECT event_type,
           FLOOR((CAST(MAX(ABS(c)) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS max_cusum,
           MIN(CASE WHEN ABS(c) = cmax THEN day END) AS changepoint_day
    FROM flagged GROUP BY event_type ORDER BY event_type
    """,
    desc="CUSUM change-point detection per event type: the running "
         "sum of deviations from the series mean peaks (in absolute "
         "value) at the most likely level-shift day — the monitoring "
         "primitive behind drift alarms on pipeline metrics. Entirely "
         "EXACT arithmetic: daily means and the grand mean are "
         "6-dec-rounded decimal ratios, deviations are exact 6-dec "
         "decimals, and the running sum is a DECIMAL window (no FP "
         "accumulation anywhere), so argmax ties (broken by earliest "
         "day) are engine-identical by construction. The window sorts "
         "one type's daily series — days, not events.",
    tags=["events", "window", "agg", "drift"],
)
def q_cusum_changepoint(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)")).cast("double")
                / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    stats = daily.groupBy("event_type").agg(
        (dfloor((F.sum(col("m").cast("decimal(18,6)")).cast("double") / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("mu")
    )
    wcum = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = (
        daily.join(broadcast(stats), "event_type")
        .withColumn(
            "c", F.sum((dfloor((col("m") - col("mu")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)")).over(wcum)
        )
    )
    wmax = Window.partitionBy("event_type")
    flagged = cusum.withColumn("cmax", F.max(F.abs(col("c"))).over(wmax))
    return (
        flagged.groupBy("event_type")
        .agg(
            (dfloor((F.max(F.abs(col("c"))).cast("double")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("max_cusum"),
            F.min(F.when(F.abs(col("c")) == col("cmax"), col("day")))
            .alias("changepoint_day"),
        )
        .orderBy("event_type")
    )


@q(
    "q_sax_symbolize",
    oracle=_DAILY_SQL + """
    , cuts AS (
      SELECT event_type,
             quantile_cont(m, 0.25) AS c1,
             quantile_cont(m, 0.50) AS c2,
             quantile_cont(m, 0.75) AS c3
      FROM daily GROUP BY event_type
    ), sym AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.m < c.c1 THEN 'a' WHEN d.m < c.c2 THEN 'b'
                  WHEN d.m < c.c3 THEN 'c' ELSE 'd' END AS s
      FROM daily d JOIN cuts c ON d.event_type = c.event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           string_agg(s, '' ORDER BY day) AS sax
    FROM sym GROUP BY event_type ORDER BY event_type
    """,
    desc="SAX symbolization of each event type's daily-mean series: "
         "values are mapped to a 4-letter alphabet by the series' own "
         "exact quartiles and concatenated in day order — the "
         "discretized representation that makes series comparable by "
         "plain string ops (edit distance via q_simjoin_names' "
         "levenshtein, motif counting via the n-gram stack). The "
         "quartile cuts are per-type exact percentiles over the tiny "
         "daily series (broadcast back), bucketing is a pure CASE "
         "with strict '<' on both engines, and the string is built "
         "with an explicit ORDER BY day so assembly is deterministic.",
    tags=["events", "agg", "percentile"],
)
def q_sax_symbolize(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            (dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)")).cast("double")
                / F.count("*")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("m")
        )
    )
    cuts = daily.groupBy("event_type").agg(
        F.expr("percentile(m, 0.25)").alias("c1"),
        F.expr("percentile(m, 0.50)").alias("c2"),
        F.expr("percentile(m, 0.75)").alias("c3"),
    )
    sym = daily.join(broadcast(cuts), "event_type").select(
        "event_type", "day",
        F.when(col("m") < col("c1"), "a")
        .when(col("m") < col("c2"), "b")
        .when(col("m") < col("c3"), "c")
        .otherwise("d").alias("s"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("day", "s"))),
                    lambda x: x["s"],
                ), ""
            ).alias("sax"),
        )
        .orderBy("event_type")
    )
