"""Eightieth-wave query inventory: process capability and robust
location — the CP/CPK CAPABILITY indices for each event type's daily
means against +-20% spec limits around the overall level (the SPC
number that says whether a process FITS its tolerance, where
q_control_chart only says whether it is stable: a stable process can
still be incapable) and the EXACT 10% TRIMMED MEAN of order value
per segment (the robust location estimate computed by interval-
clipping the distinct-cents CDF — no per-segment sort, no
low-cardinality rank window: each distinct value contributes
clamp(min(cum_le, k_hi) - max(cum_lt, k_lo), >=0) copies, which is
the whole trimmed sum from one histogram pass).

Determinism discipline: daily means and order values are exact
integer cents; spec limits and trim bounds derive from exact
decimal sums with FLOOR'd integer ranks; sigma uses the two-pass
centered-quantized discipline; all contributions are exact integer
products; final indices are single closed forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_TRIM = 0.10


@q(
    "q_cpk_capability",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR((CAST(SUM(CAST(FLOOR((value) * 1e2 + 0.5) / 1e2 AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) * 100) + 0.5) AS BIGINT) AS mc
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), means AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(mc AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS mu
      FROM daily GROUP BY event_type
    ), sig AS (
      SELECT d.event_type, m.n, m.mu,
             SQRT(CAST(SUM(CAST(FLOOR((POWER(d.mc - m.mu, 2)) * 1e6 + 0.5) / 1e6
                                AS DECIMAL(38,6))) AS DOUBLE) / (m.n - 1))
               AS sd
      FROM daily d JOIN means m ON d.event_type = m.event_type
      GROUP BY d.event_type, m.n, m.mu
    )
    SELECT event_type,
           (mu / 100) AS center,
           (sd / 100) AS stddev,
           ((1.2 * mu - 0.8 * mu) / (6 * sd)) AS cp,
           (LEAST(1.2 * mu - mu, mu - 0.8 * mu) / (3 * sd)) AS cpk,
           LEAST(1.2 * mu - mu, mu - 0.8 * mu) / (3 * sd) >= 1.33
             AS capable_4sigma
    FROM sig ORDER BY event_type
    """,
    desc="Process capability Cp/Cpk for each event type's daily-mean "
         "series against +-20% spec limits around its own level: "
         "Cp = (USL-LSL)/6sigma is the potential capability, Cpk = "
         "min(USL-mu, mu-LSL)/3sigma the realized one, with the "
         "classic 1.33 (4-sigma) capability flag — the SPC question "
         "q_control_chart does NOT answer: a perfectly stable "
         "process can still be incapable of holding a tolerance "
         "(and with symmetric self-centered specs Cp = Cpk, which "
         "the test pins as a consistency identity). Daily means are "
         "exact integer cents; sigma uses the two-pass centered-"
         "quantized discipline (sample sd, n-1); indices are single "
         "closed forms.",
    tags=["events", "stats", "agg"],
)
def q_cpk_capability(spark, sf_dir):
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", col("ts").cast("date").alias("day"))
        .agg(
            dfloor((F.sum((dfloor((col("value")) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).cast("decimal(18,2)"))
                .cast("double") / F.count("*") * 100) + F.lit(0.5)).cast("long").alias("mc")
        )
    )
    means = daily.groupBy(col("event_type").alias("et_m")).agg(
        F.count("*").alias("n"),
        (F.sum(col("mc").cast("decimal(38,0)")).cast("double") / F.count("*"))
        .alias("mu"),
    )
    dev = col("mc") - col("mu")
    sig = (
        daily.join(broadcast(means), col("event_type") == col("et_m"))
        .groupBy("event_type", "n", "mu")
        .agg(
            # try_divide chain: a 1-day type has no sample variance
            # (n-1 = 0) and a constant series has sd = 0 — sd/cp/cpk
            # are NULL, matching the oracle's x/0 = NULL
            F.sqrt(
                F.try_divide(
                    F.sum((dfloor((F.pow(dev, 2)) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("decimal(38,6)"))
                    .cast("double"), col("n") - 1)
            ).alias("sd")
        )
    )
    mu, sd = col("mu"), col("sd")
    usl, lsl = 1.2 * mu, 0.8 * mu
    cpk = F.try_divide(F.least(usl - mu, mu - lsl), 3 * sd)
    return sig.select(
        "event_type",
        (mu / 100).alias("center"),
        (sd / 100).alias("stddev"),
        (F.try_divide(usl - lsl, 6 * sd)).alias("cp"),
        (cpk).alias("cpk"),
        (cpk >= 1.33).alias("capable_4sigma"),
    ).orderBy("event_type")


@q(
    "q_trimmed_mean",
    oracle=f"""
    WITH vals AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR((o.o_totalprice * 100) + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), hist AS (
      SELECT seg, cents, COUNT(*) AS cnt FROM vals GROUP BY seg, cents
    ), tot AS (
      SELECT seg, SUM(cnt) AS n,
             CAST(FLOOR({_TRIM} * SUM(cnt)) AS BIGINT) AS k
      FROM hist GROUP BY seg
    ), cdf AS (
      SELECT h.seg, h.cents, h.cnt, t.n, t.k,
             SUM(h.cnt) OVER (PARTITION BY h.seg ORDER BY h.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le,
             COALESCE(SUM(h.cnt) OVER (PARTITION BY h.seg ORDER BY h.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_lt
      FROM hist h JOIN tot t ON h.seg = t.seg
    ), clipped AS (
      SELECT seg, n, k, cents, cnt,
             GREATEST(LEAST(cum_le, n - k) - GREATEST(cum_lt, k), 0)
               AS kept
      FROM cdf
    )
    SELECT seg AS c_mktsegment,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(k) AS BIGINT) AS n_trimmed_each_side,
           (CAST(SUM(cents * kept) AS DOUBLE) / SUM(kept) / 100)
             AS trimmed_mean,
           (CAST(SUM(cents * cnt) AS DOUBLE) / SUM(cnt) / 100)
             AS raw_mean
    FROM clipped GROUP BY seg ORDER BY seg
    """,
    desc="Exact 10% trimmed mean of order value per segment, next to "
         "the raw mean: drop the k = floor(0.1 n) smallest and "
         "largest orders and average the middle 80% — the robust "
         "location that a single fat-tailed order (q_hill_tail "
         "quantifies the tail) cannot move, computed WITHOUT any "
         "per-segment sort or rank window: the distinct-cents "
         "histogram's cumulative counts give each value's kept "
         "multiplicity as clamp(min(cum_le, n-k) - max(cum_lt, k), "
         ">=0), so the trimmed sum is one histogram pass + interval "
         "clipping (same CDF machinery as q_weighted_median, "
         "parallelism = distinct values). All contributions exact "
         "integer products; one closing ratio.",
    tags=["stats", "window", "join", "agg"],
)
def q_trimmed_mean(spark, sf_dir):
    from pyspark.sql import Window

    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    vals = o.join(
        broadcast(c.select("c_custkey", "c_mktsegment")),
        col("o_custkey") == col("c_custkey"),
    ).select(
        col("c_mktsegment").alias("seg"),
        dfloor((col("o_totalprice") * 100) + F.lit(0.5)).cast("long").alias("cents"),
    )
    hist = vals.groupBy("seg", "cents").agg(F.count("*").alias("cnt"))
    tot = hist.groupBy(col("seg").alias("seg_t")).agg(
        F.sum("cnt").alias("n"),
        F.floor(_TRIM * F.sum("cnt")).cast("long").alias("k"),
    )
    w_le = (
        Window.partitionBy("seg").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lt = (
        Window.partitionBy("seg").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdf = (
        hist.withColumn("cum_le", F.sum("cnt").over(w_le))
        .withColumn("cum_lt", F.coalesce(F.sum("cnt").over(w_lt), F.lit(0)))
        .join(broadcast(tot), col("seg") == col("seg_t"))
    )
    kept = F.greatest(
        F.least(col("cum_le"), col("n") - col("k"))
        - F.greatest(col("cum_lt"), col("k")),
        F.lit(0).cast("long"),
    )
    agg = cdf.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.sum(col("cents") * kept).alias("tsum"),
        F.sum(kept).alias("tcnt"),
        F.sum(col("cents") * col("cnt")).alias("rsum"),
        F.sum("cnt").alias("rcnt"),
    )
    return agg.select(
        col("seg").alias("c_mktsegment"),
        col("n").cast("long").alias("n_orders"),
        col("k").cast("long").alias("n_trimmed_each_side"),
        (col("tsum").cast("double") / col("tcnt") / 100)
        .alias("trimmed_mean"),
        (col("rsum").cast("double") / col("rcnt") / 100)
        .alias("raw_mean"),
    ).orderBy("c_mktsegment")
