"""Fifty-second-wave query inventory: economics and experiment
planning — LASPEYRES/PAASCHE/FISHER price indices between the first
and last full year of order history (the inflation measure computed
the way statistical agencies do: a fixed common basket, so mix shift
can't masquerade as price change — q_yoy_growth cannot distinguish
the two) and a POWER-ANALYSIS sample-size planner for the
two-proportion test (how many samples per arm to detect a given lift
at 80% power: the pre-experiment number that decides whether an A/B
test is even worth running, q_ab_test_z's prospective twin).

Determinism discipline: per-(part, year) cents and quantities are
exact integer sums; the one per-part division each true index needs
(p1*q0 = c1*q0/q1) is quantized FLOOR((.) * 1e6 + 0.5) / 1e6 -> DECIMAL(28,6)
identically on both engines before summing, while the p0*q0 / p1*q1
sides reduce exactly to the integer sums c0 / c1; the z quantiles
(1.959964, 0.841621) are shared literals; every output is one
closed-form double.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from .. import tables
from . import dfloor, q

_Z_ALPHA = 1.959964  # two-sided 5%
_Z_BETA = 0.841621   # 80% power


@q(
    "q_price_index",
    oracle="""
    WITH years AS (
      SELECT MIN(EXTRACT(year FROM l_shipdate)) AS y0,
             MAX(EXTRACT(year FROM l_shipdate)) AS y1
      FROM lineitem
    ), py AS (
      SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS y,
             SUM(CAST(FLOOR((l_extendedprice * 100) + 0.5) AS BIGINT)) AS cents,
             SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem, years
      WHERE EXTRACT(year FROM l_shipdate) IN (y0, y1)
      GROUP BY 1, 2
    ), basket AS (
      SELECT a.l_partkey,
             a.cents AS c0, a.qty AS q0, b.cents AS c1, b.qty AS q1
      FROM py a JOIN py b ON a.l_partkey = b.l_partkey
      JOIN years ON a.y = years.y0 AND b.y = years.y1
    ), agg AS (
      SELECT COUNT(*) AS n_parts,
             CAST(SUM(CAST(FLOOR((CAST(c1 AS DOUBLE) * q0 / q1) * 1e6 + 0.5) / 1e6
                           AS DECIMAL(28,6))) AS DOUBLE) AS l_num,
             CAST(SUM(c0) AS DOUBLE) AS l_den,
             CAST(SUM(c1) AS DOUBLE) AS p_num,
             CAST(SUM(CAST(FLOOR((CAST(c0 AS DOUBLE) * q1 / q0) * 1e6 + 0.5) / 1e6
                           AS DECIMAL(28,6))) AS DOUBLE) AS p_den
      FROM basket
    )
    SELECT CAST((SELECT y0 FROM years) AS BIGINT) AS base_year,
           CAST((SELECT y1 FROM years) AS BIGINT) AS current_year,
           CAST(n_parts AS BIGINT) AS n_common_parts,
           (l_num / l_den) AS laspeyres,
           (p_num / p_den) AS paasche,
           (SQRT((l_num / l_den) * (p_num / p_den))) AS fisher
    FROM agg
    """,
    desc="Laspeyres / Paasche / Fisher price indices between the "
         "first and last ship year over the COMMON part basket: "
         "average unit prices (cents/qty per part-year) weighted by "
         "base-year (Laspeyres) vs current-year (Paasche) quantities "
         "— the fixed-basket construction that separates true price "
         "change from mix shift, which q_yoy_growth's raw revenue "
         "ratio conflates; Fisher is their geometric mean. The true "
         "index needs one per-part division (p1*q0 = c1*q0/q1); that "
         "term is quantized FLOOR((.) * 1e6 + 0.5) / 1e6 -> DECIMAL(28,6) identically "
         "on both engines before summing (the repo's standard "
         "computed-double discipline), while the p0*q0 and p1*q1 "
         "sides reduce exactly to the integer cents sums c0 and c1 "
         "with no rounding. One combinable (part, year) agg, a "
         "self-join on the part dimension, two exact and two "
         "quantized sums.",
    tags=["stats", "join", "agg", "cross"],
)
def q_price_index(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    yr = F.year(col("l_shipdate"))
    years = li.agg(
        F.min(yr).alias("y0"), F.max(yr).alias("y1")
    )
    py = (
        li.crossJoin(broadcast(years))
        .filter((yr == col("y0")) | (yr == col("y1")))
        .groupBy(col("l_partkey"), yr.alias("y"), "y0", "y1")
        .agg(
            F.sum(dfloor((col("l_extendedprice") * 100) + F.lit(0.5)).cast("long"))
            .alias("cents"),
            F.sum(col("l_quantity").cast("long")).alias("qty"),
        )
    )
    a = py.filter(col("y") == col("y0")).select(
        "l_partkey", col("cents").alias("c0"), col("qty").alias("q0"),
        "y0", "y1",
    )
    b = py.filter(col("y") == col("y1")).select(
        col("l_partkey").alias("pk2"), col("cents").alias("c1"),
        col("qty").alias("q1"),
    )
    basket = a.join(b, col("l_partkey") == col("pk2"))
    d28 = "decimal(28,6)"
    p1q0 = (dfloor((col("c1").cast("double") * col("q0") / col("q1")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
    p0q1 = (dfloor((col("c0").cast("double") * col("q1") / col("q0")) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
    # GLOBAL aggregate + re-attached years, not groupBy(y0, y1): the
    # oracle's ungrouped agg yields one row of NULL indices even when
    # the common basket is EMPTY (single-year corpora); grouping by
    # the carried year columns silently returned zero rows there
    agg = basket.groupBy().agg(
        F.count("*").alias("n_parts"),
        F.sum(p1q0.cast(d28)).cast("double").alias("l_num"),
        F.sum("c0").cast("double").alias("l_den"),
        F.sum("c1").cast("double").alias("p_num"),
        F.sum(p0q1.cast(d28)).cast("double").alias("p_den"),
    ).crossJoin(broadcast(years))
    lasp = col("l_num") / col("l_den")
    paas = col("p_num") / col("p_den")
    return agg.select(
        col("y0").cast("long").alias("base_year"),
        col("y1").cast("long").alias("current_year"),
        col("n_parts").cast("long").alias("n_common_parts"),
        (lasp).alias("laspeyres"),
        (paas).alias("paasche"),
        (F.sqrt(lasp * paas)).alias("fisher"),
    )


@q(
    "q_power_analysis",
    oracle=f"""
    WITH base AS (
      SELECT o_orderstatus AS st,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS k
      FROM orders GROUP BY 1
    ), rates AS (
      SELECT st, n, k, CAST(k AS DOUBLE) / n AS p1,
             LEAST(CAST(k AS DOUBLE) / n * 1.10, 0.999999) AS p2
      FROM base
    )
    SELECT st AS o_orderstatus, CAST(n AS BIGINT) AS n_current,
           (p1) AS base_rate,
           CAST(CEIL(
             POWER({_Z_ALPHA} * SQRT(2 * ((p1 + p2) / 2)
                                     * (1 - (p1 + p2) / 2))
                   + {_Z_BETA} * SQRT(p1 * (1 - p1) + p2 * (1 - p2)), 2)
             / POWER(p2 - p1, 2)) AS BIGINT) AS n_per_arm,
           CEIL(
             POWER({_Z_ALPHA} * SQRT(2 * ((p1 + p2) / 2)
                                     * (1 - (p1 + p2) / 2))
                   + {_Z_BETA} * SQRT(p1 * (1 - p1) + p2 * (1 - p2)), 2)
             / POWER(p2 - p1, 2)) / CAST(n AS DOUBLE) >= 1
             AS underpowered_today
    FROM rates ORDER BY st
    """,
    desc="Power-analysis planner for a two-proportion test: given "
         "each status group's observed urgent-order base rate, the "
         "samples PER ARM needed to detect a relative 10% lift at "
         "alpha=0.05 (two-sided) and 80% power — the prospective "
         "twin of q_ab_test_z that decides whether an experiment is "
         "worth launching (underpowered_today flags groups whose "
         "entire current volume is below one arm's requirement). "
         "The z quantiles are shared literals (1.959964, 0.841621), "
         "rates are exact integer-count ratios, and n-per-arm is "
         "the standard pooled-variance closed form, CEILed "
         "identically on both engines. One combinable count agg; "
         "planning math runs over a handful of rows.",
    tags=["stats", "agg"],
)
def q_power_analysis(spark, sf_dir):
    orders = tables.load(spark, sf_dir, "orders")
    base = orders.groupBy(col("o_orderstatus").alias("st")).agg(
        F.count("*").alias("n"),
        F.count(F.when(col("o_orderpriority") == "1-URGENT", 1)).alias("k"),
    )
    p1 = col("k").cast("double") / col("n")
    p2 = F.least(p1 * 1.10, F.lit(0.999999))
    pbar = (p1 + p2) / 2
    # try_divide: a 0% base rate has p2 = p1 (no detectable lift) ->
    # NULL plan size, matching the oracle's x/0 = NULL
    n_arm = F.ceil(
        F.try_divide(
            F.pow(
                _Z_ALPHA * F.sqrt(2 * pbar * (1 - pbar))
                + _Z_BETA * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2,
            ), F.pow(p2 - p1, 2))
    )
    return base.select(
        col("st").alias("o_orderstatus"),
        col("n").cast("long").alias("n_current"),
        (p1).alias("base_rate"),
        n_arm.cast("long").alias("n_per_arm"),
        (n_arm.cast("double") / col("n").cast("double") >= 1)
        .alias("underpowered_today"),
    ).orderBy("o_orderstatus")
